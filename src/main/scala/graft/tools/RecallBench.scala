package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Banded-path RECALL at rehearsal scale (r10 VERDICT "What's missing
  * #3"): the 133× wall tables report time only — this tool reports
  * pairs-found / exact-pairs for the two banded candidate generators,
  * so a bucket cap silently eating candidates at scale becomes a
  * NUMBER instead of an argument.
  *
  * Method: a doc_id-mod sample of the fixture is written as a drop-in
  * sub-corpus. Both Jaccard and Hamming are PAIRWISE metrics, so the
  * exact pair set among sampled docs computed ON the sub-corpus equals
  * the full corpus' exact pairs restricted to the sample — while the
  * banded paths run on the FULL fixture (caps bite at full bucket
  * occupancy) and are then restricted to sampled endpoints. Recall =
  * |banded ∩ exact| / |exact| is therefore the full-scale candidate
  * recall, measured on an unbiased pair subsample.
  *
  *  - MinHash-LSH vs exact n-gram Jaccard at τ = 0.5 (the gate
  *    threshold) and τ = 0.9 (the planted-dup stratum, where the
  *    1−(1−J⁴)¹⁶ banding bound says recall should be ≈ 1 and any miss
  *    is a CAP effect);
  *  - multi-probe SimHash vs exact all-pairs Hamming ≤ 15 over the
  *    same signatures (driver loop over the sampled sigs — n·(n−1)/2
  *    popcounts, megabytes of state).
  *
  * Both banded generators exact-verify their candidates at the same
  * threshold as the exact side, so precision is structurally 1 (also
  * asserted) and recall loss isolates CANDIDATE loss: banding
  * probability + bucket caps, nothing else.
  *
  * Env: SPARK_GRAFT_SF_DIR (fixture), SPARK_GRAFT_SAMPLE_MOD
  * (default 10), SPARK_GRAFT_CPUS (default 16).
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10x")
    val mod = sys.env.getOrElse("SPARK_GRAFT_SAMPLE_MOD", "10").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // comma-separated family filter (minhash, simhash, wide) for
    // re-running one leg without repaying the others
    val fams = sys.env.get("SPARK_GRAFT_RECALL_FAMILIES")
      .map(_.split(",").map(_.trim).toSet)
    def famOn(f: String): Boolean = fams.forall(_.contains(f))

    val base = new java.io.File(sfDir).getName
    val sampleDir = s"/tmp/graft_recall_${base}_$mod"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(mod)) === 0)
      .write.mode("overwrite").parquet(s"$sampleDir/documents.parquet")
    val nSample = spark.read.parquet(s"$sampleDir/documents.parquet").count()
    println(s"[recall] fixture=$base sample_mod=$mod n_sample=$nSample")

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("i"), col("j")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def inSample(df: org.apache.spark.sql.DataFrame) =
      df.filter(pmod(col("i"), lit(mod)) === 0 &&
        pmod(col("j"), lit(mod)) === 0)

    def report(family: String, tag: String, exact: Set[(Long, Long)],
        banded: Set[(Long, Long)], tE: Double, tB: Double): Unit = {
      val hit = (exact & banded).size
      val extra = (banded -- exact).size
      val recall = if (exact.isEmpty) 1.0 else hit.toDouble / exact.size
      println(f"[recall] $family $tag exact=${exact.size} banded_in_sample=${banded.size} " +
        f"hit=$hit missed=${exact.size - hit} extra=$extra recall=$recall%.6f " +
        f"(exact ${tE}%.1f s, banded ${tB}%.1f s)")
    }

    // ── MinHash-LSH vs exact n-gram Jaccard, two τ strata ────────────
    for (tau <- Seq(0.5, 0.9) if famOn("minhash")) {
      val t0 = System.nanoTime()
      val exact = pairSet(Dedup.ngramJaccard(spark, sampleDir, tau))
      val tE = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val lsh = pairSet(inSample(Dedup.minhashLsh(spark, sfDir, tau)))
      val tB = (System.nanoTime() - t1) / 1e9
      report("minhash_lsh", f"tau=$tau%.1f", exact, lsh, tE, tB)
    }

    // ── edit blocking vs exact all-pairs banded Levenshtein ─────────
    // Exact side = EVERY sample pair through the same normalize +
    // threshold (dist ≤ min(64, 10% mean length)) with no blocking at
    // all — a crossJoin is the point here (all-pairs IS the ground
    // truth; the per-pair DP stays banded). Blocked side = the
    // production prefix+suffix blocking with its df-cap on the FULL
    // fixture, restricted to sampled endpoints — so a cap or a
    // both-windows edit eating candidates at scale becomes a number.
    if (famOn("edit")) {
      val t0 = System.nanoTime()
      val s = spark.read.parquet(s"$sampleDir/documents.parquet")
        .selectExpr("doc_id",
          "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS nt")
        .selectExpr("doc_id", "nt", "CAST(length(nt) AS BIGINT) AS len")
        .localCheckpoint()
      val exactE = s.as("a").crossJoin(s.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <=
            least(lit(64L), expr("(a.len + b.len) DIV 20")))
        .withColumn("d", expr("CAST(levenshtein(a.nt, b.nt, 65) AS BIGINT)"))
        .filter(col("d") >= 0 &&
          col("d") <= least(lit(64L), expr("(a.len + b.len) DIV 20")))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      val exactSet = pairSet(exactE)
      val tE = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val blocked = pairSet(inSample(
        graft.dedup.EditDedup.editPairs(spark, sfDir)
          .select(col("doc_a").as("i"), col("doc_b").as("j"))))
      val tB = (System.nanoTime() - t1) / 1e9
      report("edit_blocked", "tau=10pct", exactSet, blocked, tE, tB)
    }

    // ── multi-probe SimHash vs exact all-pairs Hamming ≤ 15 ─────────
    if (!famOn("simhash") && !famOn("wide") && !famOn("wideb")) {
      spark.stop(); return
    }
    val t2 = System.nanoTime()
    val sampleSigs = Dedup.simhashSigs(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(mod)) === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ids = sampleSigs.map(_._1)
    val sg = sampleSigs.map(_._2)
    val exactH = Set.newBuilder[(Long, Long)]
    var i = 0
    while (i < sg.length) {
      var j = i + 1
      while (j < sg.length) {
        if (java.lang.Long.bitCount(sg(i) ^ sg(j)) <= 15)
          exactH += ((ids(i), ids(j)))
        j += 1
      }
      i += 1
    }
    val exactHSet = exactH.result()
    val tE2 = (System.nanoTime() - t2) / 1e9
    if (famOn("simhash")) {
      val t3 = System.nanoTime()
      val probed = pairSet(inSample(Dedup.simhashPairsMultiProbe(spark, sfDir)))
      val tB2 = (System.nanoTime() - t3) / 1e9
      report("simhash_multiprobe", "ham<=15", exactHSet, probed, tE2, tB2)
    }

    if (famOn("wide")) {
      // the wide-band (4 × 16-bit, radius-3 probe) scale formulation —
      // the fix for the cap-collapse the 8-bit row above measures;
      // forced onto the query-side form so the two formulations can
      // be compared at the same scale regardless of the switch
      val t4 = System.nanoTime()
      val wide = pairSet(inSample(Dedup.simhashPairsWideOf(
        Dedup.simhashSigs(spark, sfDir), 15, 1000)))
      val tB3 = (System.nanoTime() - t4) / 1e9
      report("simhash_wide", "ham<=15", exactHSet, wide, 0.0, tB3)
    }

    if (famOn("wideb")) {
      // the balanced build<=1 x probe<=2 split (what simhashPairsWide
      // actually runs above WideBalancedAbove docs)
      val t5 = System.nanoTime()
      val bal = pairSet(inSample(Dedup.simhashPairsWideBalancedOf(
        Dedup.simhashSigs(spark, sfDir), 15, 1000)))
      val tB4 = (System.nanoTime() - t5) / 1e9
      report("simhash_wide_balanced", "ham<=15", exactHSet, bal, 0.0, tB4)
    }

    spark.stop()
  }
}
