package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators: PII/URL scrubbing and benchmark
  * decontamination — the two cleanup passes every LLM training
  * pipeline runs between raw ingest and tokenization.
  *
  * Scale design (100 TB posture):
  *  - [[clean]] is map-only (no shuffle): three codegen'd
  *    `regexp_replace` passes over a column-pruned scan. Regexes are
  *    restricted to syntax with identical semantics in Java and RE2
  *    (no backrefs, no lookaround) so the operator is cross-engine
  *    reproducible — which is also what makes it SQL-oracle testable.
  *  - [[contamination]] joins corpus n-grams against the BENCHMARK
  *    side, which is small by nature (eval sets are MBs, the corpus is
  *    TBs) → broadcast the distinct benchmark shingles; the corpus
  *    postings never shuffle. Aggregation is per doc_id, partial
  *    map-side. One wide pass total.
  */
object Cleaning {

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private val urlRe = "https?://[^\\s]+"
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Scrub URLs and emails to placeholder tokens, collapse whitespace
    * runs, trim. Emits before/after lengths so downstream can filter
    * on scrub density (heavily-scrubbed docs are usually boilerplate). */
  def clean(spark: SparkSession, sfDir: String): DataFrame =
    cleanText(documents(spark, sfDir))

  /** The scrub as a column expression — composable into other
    * pipelines (e.g. streaming ingest) on any text column. */
  def scrub(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(c, urlRe, "<url>"), emailRe, "<email>"),
      "\\s+", " "))

  /** [[clean]] on any (doc_id, text) frame (unit tests feed synthetic
    * rows with real URLs/emails; the driver corpus has none, which the
    * oracle compare then confirms end-to-end). */
  def cleanText(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), scrub(col("text")).as("clean_text"))
      .select(col("doc_id"), col("clean_text"),
        octet_length(col("text")).cast("long").as("bytes_in"),
        octet_length(col("clean_text")).cast("long").as("bytes_out"))

  /** Benchmark decontamination: flag corpus documents sharing too many
    * word-`n`-grams with a benchmark (eval) set. The benchmark here is
    * the deterministic stand-in `doc_id % benchMod = 0` — a real
    * deployment passes its own eval corpus; the plan is identical.
    *
    * Output per non-benchmark doc — INCLUDING docs too short to carry
    * a single n-gram, which report (0, 0, not-contaminated) rather
    * than silently vanishing (downstream joins must distinguish
    * "clean" from "never evaluated"): distinct shingle count, distinct
    * shingles also present in ANY benchmark doc, and a contaminated
    * flag at ≥`pctThreshold`% overlap (integer cross-multiplication —
    * no float ratios). */
  def contamination(spark: SparkSession, sfDir: String, n: Int = 8,
      benchMod: Int = 37, pctThreshold: Int = 10): DataFrame = {
    val sh = documents(spark, sfDir)
      .select(col("doc_id"),
        expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')").as("toks"))
      .select(col("doc_id"), expr(graft.dedup.Dedup.shinglesFromToks(n)).as("sh"))
      // explode_OUTER and NO null-filter: the null row keeps short docs
      // in the aggregation (count(s) skips it), and a plain explode
      // would let the optimizer push an inferred size()>0 filter below
      // the projections, re-inlining the tokenizer per element (Dedup)
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
    val bench = sh.filter(col("s").isNotNull && col("doc_id") % benchMod === 0)
      .select(col("s")).distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("s"), "left") // null s never matches
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_shingles"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        (col("n_shingles") > 0 &&
          col("n_hit") * 100 >= col("n_shingles") * pctThreshold)
          .cast("int").as("contaminated"))
  }
}
