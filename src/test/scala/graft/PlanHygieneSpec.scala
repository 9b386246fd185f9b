package graft

/** Fleet-wide physical-plan tripwire: every `SparkEntry.queries` entry
  * is planned against the test corpus and screened for the two
  * operators that silently turn a working query into a 100 TB
  * disaster — `CartesianProductExec` (unkeyed cross of two big sides)
  * and un-allowlisted `BroadcastNestedLoopJoin` (no join key → every
  * row × every broadcast row). Per-operator specs assert their own
  * plan shapes; this is the net under all of them, so a future edit
  * that drops a join key (or a filter Catalyst used to prove
  * broadcastability) fails HERE with the query's name instead of
  * timing out in a driver round.
  *
  * Queries that legitimately nested-loop are allowlisted with the
  * reason — all are deliberate 1-row-broadcast folds of a scalar
  * aggregate into the plan (the pattern that replaced driver-side
  * `.count()` actions), which is a constant-size broadcast regardless
  * of corpus scale.
  */
class PlanHygieneSpec extends SparkSpec {

  /** name → why a BroadcastNestedLoopJoin is the intended plan. */
  private val nestedLoopAllowed: Map[String, String] = Map(
    "rel_asof" -> "customer count folded as a 1-row broadcast cross join",
    "rel_above_avg" -> "global average folded as a 1-row broadcast",
    "rel_local_volume" -> "global scalar threshold folded as a 1-row broadcast",
    "text_source_drift" -> "global token total folded as a 1-row broadcast",
    "text_source_drift_stream" -> "same report stage as text_source_drift",
    "text_source_drift_semantic" -> "same report stage as text_source_drift",
    "text_source_drift_compact" -> "same report stage as text_source_drift")

  test("no gate query plans a cartesian product or stray nested-loop join") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") &&
            !nestedLoopAllowed.contains(name))
          failures += s"$name: BroadcastNestedLoopJoin (not allowlisted)"
      } catch {
        case e: Throwable => failures += s"$name: planning failed: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("span-family plans never funnel through a single partition") {
    // the other classic scale cliff: a window or sort with no
    // PARTITION BY plans `Exchange SinglePartition` and serializes the
    // whole input on one task. The span family was built specifically
    // to avoid it (per-doc windows, range sorts, two-pass prefix
    // scans) — pin that property for every query in the family. Other
    // gates legitimately single-partition (global scalar aggregates),
    // so the net is scoped, not fleet-wide.
    val spanFamily = Seq("dedup_spans_exact", "dedup_spans_incremental",
      "dedup_pair_matches", "text_decontam_spans", "text_excise",
      "text_leak_profile", "text_pipeline_decontam")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    spanFamily.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.executedPlan.toString
      if (plan.contains("SinglePartition"))
        failures += s"$name plans an Exchange SinglePartition"
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
