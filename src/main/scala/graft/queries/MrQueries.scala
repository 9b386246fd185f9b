package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's concrete query library (`src/mrapps`), re-expressed
  * as declarative DataFrame plans over the `documents` table
  * (doc_id stands in for the input file name — FIXTURES.md §1).
  *
  * Every query here is algebraic-aggregation-friendly: Catalyst plans a
  * partial (map-side) + final HashAggregate, which is the single biggest
  * efficiency win over the reference (it shuffles one `(word,"1")` pair
  * per occurrence with no combiner — `src/mrapps/wc.go:26-31`,
  * SURVEY §4.1). At 100 TB the map-side combine reduces shuffle volume
  * by ~the average per-partition key multiplicity.
  */
object MrQueries {

  /** Go `unicode.IsLetter` tokenization parity: split on runs of
    * non-letters (`src/mrapps/wc.go:19-32` uses
    * `strings.FieldsFunc(contents, !unicode.IsLetter)`); `\p{L}` is the
    * Java/RE2 equivalent of Go's letter class. */
  private val NonLetter = "[^\\p{L}]+"

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Tokens per document, empty tokens removed (split yields a leading
    * "" when the text starts with a separator). */
  private def tokens(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), NonLetter)).as("word"))
      .filter(length(col("word")) > 0)

  /** Q1 wc — word count (`src/mrapps/wc.go`): emit each word occurrence,
    * count per word. Plan: scan(text only) → generate → partial count →
    * shuffle on word → final count. */
  def wordCount(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Q2 indexer — inverted index (`src/mrapps/indexer.go`): per document
    * each DISTINCT word once; per word: doc count + docs sorted and
    * comma-joined (`src/mrapps/indexer.go:36-39`).
    *
    * `collect_set` keeps the per-group state a set (map-side partial
    * aggregation dedups early); `sort_array` makes the join
    * deterministic — never rely on collect order (SURVEY §7 risk b).
    * doc ids are zero-padded so lexicographic sort order is stable and
    * matches the numeric oracle order.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(format_string("%09d", col("doc_id")).as("doc"),
        explode(split(col("text"), NonLetter)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(
        size(collect_set(col("doc"))).cast("long").as("n_docs"),
        concat_ws(",", sort_array(collect_set(col("doc")))).as("docs"))

  /** Q3 crash/nocrash payload — per-file scalar profile + global sorted
    * group-concat (`src/mrapps/crash.go:34-55`). Map per file emits
    * ("a", name), ("b", len(name)), ("c", len(contents)), ("d","xyzzy");
    * Reduce = values sorted and space-joined (order-insensitive
    * deterministic group-concat). Names are zero-padded doc ids so the
    * lexicographic value sort is deterministic across engines. */
  def scalarProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .select(format_string("%09d", col("doc_id")).as("name"), col("text"))
    val pairs = d.select(lit("a").as("key"), col("name").as("value"))
      .unionAll(d.select(lit("b").as("key"), length(col("name")).cast("string").as("value")))
      .unionAll(d.select(lit("c").as("key"), length(col("text")).cast("string").as("value")))
      .unionAll(d.select(lit("d").as("key"), lit("xyzzy").as("value")))
    pairs.groupBy(col("key"))
      .agg(concat_ws(" ", sort_array(collect_list(col("value")))).as("profile"))
  }

  /** Q1 wc via explicit two-phase salting (`core.Skew`) — identical
    * result to [[wordCount]] (same oracle), demonstrating the hot-key
    * path for Zipfian corpora where one post-combine key still
    * overwhelms a single reducer. */
  def wordCountSalted(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.Skew.saltedCount(tokens(spark, sfDir), col("word"), col("doc_id"))
      .withColumnRenamed("key", "word")

  /** [[scalarProfile]] computed through the typed [[graft.functions.SortedConcat]]
    * Aggregator (udaf path) instead of the declarative
    * sort_array(collect_list) — identical output, same oracle. */
  def scalarProfileUdaf(spark: SparkSession, sfDir: String): DataFrame = {
    val sortedConcat = udaf(graft.functions.SortedConcat)
    val d = documents(spark, sfDir)
      .select(format_string("%09d", col("doc_id")).as("name"), col("text"))
    val pairs = d.select(lit("a").as("key"), col("name").as("value"))
      .unionAll(d.select(lit("b").as("key"), length(col("name")).cast("string").as("value")))
      .unionAll(d.select(lit("c").as("key"), length(col("text")).cast("string").as("value")))
      .unionAll(d.select(lit("d").as("key"), lit("xyzzy").as("value")))
    pairs.groupBy(col("key")).agg(sortedConcat(col("value")).as("profile"))
  }

  /** Q6 early_exit — per-file count (`src/mrapps/early_exit.go:19-36`):
    * Map emits (filename, "1") once per file; Reduce counts. Extended to
    * the more useful per-document token count so the aggregation is
    * non-trivial (the reference's 1-per-file is a degenerate case). */
  def perFileCount(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
}
