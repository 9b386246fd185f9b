package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data subsampling operators. Every sample here is
  * DETERMINISTIC for a fixed seed (reruns of a pipeline must reproduce
  * their corpus) and CROSS-ENGINE reproducible: the sampling predicate
  * is a lexicographic threshold on an md5-hex prefix, which any engine
  * with md5 evaluates identically — so even the sampling queries get a
  * full SQL oracle.
  *
  * The unit is the DOCUMENT (hash of a stable id), never the row
  * position: position-based samples change under repartitioning;
  * id-hash samples are stable across any layout — the property that
  * matters at 100 TB where partitioning is fluid. md5 costs a bit more
  * than xxhash64 per row, but the filter sits next to the scan and is
  * dwarfed by IO; portability wins.
  */
object Sampling {

  /** 15-hex-digit lowercase threshold: an md5 prefix compares below it
    * with probability `fraction` (15 hex digits = 60 bits, uniform). */
  def hexThreshold(fraction: Double): String = {
    val f = math.min(1.0, math.max(0.0, fraction))
    val t = math.round(f * (1L << 60)).min(1L << 60)
    // fraction 1.0 exceeds the 15-digit space: 'g' sorts above every
    // hex digit, keeping the all-f prefix (p = 1) selected
    if (t >= (1L << 60)) "g" else f"$t%015x"
  }

  /** Sampling key: md5 hex of "id:seed" (id rendered as a string). */
  private def hashKey(idCol: Column, seed: Long): Column =
    substring(md5(concat(idCol.cast("string"), lit(s":$seed"))), 1, 15)

  /** Deterministic ~fraction sample by stable id hash — layout-
    * independent, joinable (the same doc is in/out everywhere), and
    * nested (fraction a ⊆ fraction b for a ≤ b: same key, higher
    * threshold). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(hashKey(col(idCol), seed) < lit(hexThreshold(fraction)))

  /** Stratified sample: per-stratum fractions (e.g. downweight a
    * dominant language), same id-hash determinism. Strata absent from
    * `fractions` are sampled at `defaultFraction` (default 0.0 =
    * dropped — pass 1.0 to keep unlisted strata whole). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L,
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(hexThreshold(v))).otherwise(acc)
    }
    df.filter(hashKey(col(idCol), seed) < threshold)
  }

  /** The per-language fractions of the [[sampleDocuments]] query:
    * English downweighted to 10%, the other corpus languages at 20%
    * (single source of truth for the query AND its SQL oracle). */
  val documentFractions: Map[String, Double] =
    Map("en" -> 0.1, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)

  /** documents sample query: language-stratified id-hash sample at
    * [[documentFractions]] (unlisted languages dropped). */
  def sampleDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    stratifiedSample(docs, "doc_id", "lang", documentFractions)
      .select(col("doc_id"), col("lang"))
  }

  /** Deterministic per-stratum top-`k`: rank docs inside each stratum
    * by their id-hash (a reproducible pseudo-random order) and keep
    * the first k — the corpus-BALANCING primitive (exactly k docs per
    * language regardless of skew), complementing the per-stratum
    * FRACTIONS of [[stratifiedSample]]. One shuffle on the stratum;
    * rank within partitions. The hash rank makes it engine-exact. */
  def topKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(idCol), seed), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** documents query: 20 docs per language, hash-ranked. */
  def sampleTopKDocuments(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    topKPerStratum(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", "lang", k)
      .select(col("doc_id"), col("lang"))

  /** Temperature-based source mixture weights — the sampling-weight
    * table a multi-source training run draws from (UnifiedQA/GPT-3
    * style: w_i ∝ n_i^α with α<1 upweighting small sources). Per
    * source: doc count, token count, and the α-tempered weight in
    * parts-per-million.
    *
    * Exactness: α defaults to 0.5 because IEEE-754 REQUIRES sqrt to be
    * correctly rounded — so `round(sqrt(n)*1000)` is bit-identical in
    * any engine, and the ppm split is then pure bigint arithmetic
    * (`div`), giving this float-flavored operator a fully exact SQL
    * oracle. Other α use pow (1-ulp engine variance; rows-only check).
    *
    * Scale: one map-side-combined aggregation to #sources rows; the
    * all-rows window runs on those few rows, not the corpus. */
  def sourceMixture(spark: SparkSession, sfDir: String,
      alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score =
      if (alpha == 0.5) round(sqrt(col("n_tokens")) * 1000).cast("long")
      else round(pow(col("n_tokens"), alpha) * 1000).cast("long")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
          .cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .withColumn("score", score)
      .withColumn("total", sum(col("score")).over(Window.partitionBy()))
      // round-half-up integer split: (2·10^6·s + t) div 2t, all bigint
      .withColumn("weight_ppm",
        expr("(2000000 * score + total) div (2 * total)"))
      .drop("total")
  }

  /** Quality-weighted deterministic sampling — the importance-
    * resampling step (DSIR/DoReMi-flavored, with a binary signal):
    * per-document keep probability comes from a quality column instead
    * of one global fraction — quality docs kept at `hiFrac`, the rest
    * at `loFrac`. Same md5-prefix predicate as [[hashSample]], so the
    * sample is layout-independent, nested in each stratum, and fully
    * SQL-oracle-checkable; the quality signal is computed inline
    * ([[TextAnalysis.quality]]'s integer definition), keeping the
    * whole operator one map-only pass — no join, no shuffle. */
  def weightedSample(spark: SparkSession, sfDir: String,
      hiFrac: Double = 0.8, loFrac: Double = 0.1,
      seed: Long = 42L): DataFrame = {
    val threshold = when(col("is_quality") === 1, lit(hexThreshold(hiFrac)))
      .otherwise(lit(hexThreshold(loFrac)))
    TextAnalysis.quality(spark, sfDir)
      .select(col("doc_id"), col("is_quality"))
      .filter(hashKey(col("doc_id"), seed) < threshold)
  }

  /** DuckDB oracle for [[sampleDocuments]] — byte-identical predicate. */
  def sampleDocumentsOracleSql: String = {
    val cases = documentFractions.toSeq.sorted
      .map { case (k, v) => s"WHEN '$k' THEN '${hexThreshold(v)}'" }
      .mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 15) <
       |  CASE lang $cases ELSE '${hexThreshold(0.0)}' END""".stripMargin
  }
}
