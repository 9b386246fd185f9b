package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents (in stable doc_id order) to
  * fixed token-budget training sequences by contiguous fill — pack k
  * holds the docs whose running token total starts in
  * [k·budget, (k+1)·budget). The core is a DISTRIBUTED EXCLUSIVE
  * PREFIX SUM over a globally ordered column, a primitive Spark does
  * not ship: the naive `sum(...) OVER (ORDER BY ...)` window has no
  * PARTITION BY, so Catalyst plans a SINGLE-partition window — one
  * task does all the work, the canonical 100 TB cliff.
  *
  * Classic two-pass formulation instead:
  *   1. range-partition + sort by the order column (global order
  *      across partitions, local order within);
  *   2. per-partition token totals — one tiny row per partition — are
  *      cumulated on the driver into per-partition START OFFSETS;
  *   3. a map-only second pass adds the broadcast offset to each
  *      partition's local running sum.
  * Both passes are narrow over the materialized layout; the only
  * driver data is numPartitions longs. Pack assignment is then
  * `global_before div budget`, oracle-expressible as a window cumsum.
  *
  * The partition id is MATERIALIZED into the rows
  * (`spark_partition_id()` evaluated during the checkpoint) rather
  * than read from `TaskContext` at execution time: a downstream
  * `coalesce(1)` (e.g. a single-file writer) pipelines the narrow
  * second pass into one task, where TaskContext-based ids collapse
  * to 0 and would silently zero every offset.
  */
object SequencePacking {

  final case class DocTokens(doc_id: Long, n_tokens: Long)
  final case class PackedDoc(doc_id: Long, n_tokens: Long, pack_id: Long)

  /** Exclusive-prefix-sum pack assignment for typed (id, weight) rows.
    * Output order/partitioning follows the range layout. */
  def packByPrefixSum(toks: Dataset[DocTokens], budget: Long,
      partitions: Int): Dataset[PackedDoc] = {
    val spark = toks.sparkSession
    import spark.implicits._
    // materialize the ordered layout once: both passes must see the
    // SAME partition boundaries, and each row must carry its pid
    // (localCheckpoint is eager, so pid values are pinned here)
    val parts = toks.toDF()
      .repartitionByRange(partitions, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val totals = parts.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions)
      .scanLeft(0L)((acc, pid) => acc + totals.getOrElse(pid, 0L))
    val bc = spark.sparkContext.broadcast(offsets)
    // rows within one upstream partition share a pid and stay
    // contiguous; the running sum re-initializes from the broadcast
    // offsets on EVERY pid change — correct under any downstream
    // coalesce, including one that concatenates non-adjacent parents
    // (init-once-from-first-row would silently shift later parents)
    parts.select(col("doc_id"), col("n_tokens"), col("pid"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var run = 0L
        var curPid = -1
        it.map { case (id, n, pid) =>
          if (pid != curPid) { run = bc.value(pid); curPid = pid }
          val before = run
          run += n
          PackedDoc(id, n, before / budget)
        }
      }
  }

  /** documents → (doc_id, n_tokens, pack_id) at the given budget;
    * n_tokens uses the same whitespace definition as text_tokens. */
  def packDocuments(spark: SparkSession, sfDir: String, budget: Long = 1024L,
      partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(expr("filter(split(text, '\\\\s+'), x -> x != '')"))
          .cast("long").as("n_tokens"))
      .as[DocTokens]
    packByPrefixSum(toks, budget, partitions).toDF()
  }
}
