package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EDIT-DISTANCE near-duplicate pairs — the record-linkage classic
  * (blocked Levenshtein) as a bounded, engine-exact operator. The
  * shingle/MinHash family catches token-level rewrites; character
  * edit distance is the right tool one level down: OCR noise, typo
  * clusters, boilerplate with inline substitutions — pairs whose
  * token sets diverge but whose character streams barely do.
  *
  * Contract (every clause mirrored in the DuckDB oracle):
  *  - Texts are normalized to lower-case `[a-z0-9 ]` (non-alnum runs
  *    collapse to one space, ends trimmed). This is also what makes
  *    the two engines comparable at all: DuckDB's `levenshtein` is
  *    BYTE-based while Spark's is codepoint-based (measured:
  *    `levenshtein('héllo','hello')` = 2 in DuckDB, 1 in Spark), so
  *    the contract pins the alphabet to ASCII where byte ≡ codepoint.
  *  - Candidate pairs come from TWO blockings, prefix and suffix:
  *    (len div [[LenBucket]], first [[KeyChars]] chars) and
  *    (len div [[LenBucket]], last [[KeyChars]] chars). A head edit
  *    moves the prefix key but not the suffix key and vice versa; an
  *    edit inside both windows is out of contract (the banded-hash
  *    families cover it).
  *  - Block keys with more than `cap` members are dropped whole — the
  *    df-cap discipline every banded family here uses; a degenerate
  *    key (empty docs, shared boilerplate heads) cannot go quadratic.
  *  - A candidate pair is a match when
  *    `levenshtein(a, b) <= least(MaxDist, (len_a+len_b) div 20)` —
  *    relative 10% of the mean length, under an absolute [[MaxDist]]
  *    ceiling that exists so the DP can be BANDED: Spark evaluates
  *    the 3-arg `levenshtein(a, b, MaxDist+1)` which is O(len·65) and
  *    returns -1 past the band, never the O(len²) full matrix. The
  *    oracle runs the plain quadratic form; identical keep-set and
  *    distances because the filter never accepts a distance above
  *    [[MaxDist]].
  *
  * Scale posture: one documents scan (two pruned columns), key
  * explosion ×2, one shuffle on the block key; per-key work ≤ cap²/2
  * banded DPs. No all-pairs product anywhere. */
object EditDedup {

  /** Length-bucket width; also the relative-threshold denominator
    * (dist ≤ (len_a+len_b)/20 = 10% of the mean length). */
  val LenBucket: Long = 20L

  /** Prefix/suffix block-key width in characters. */
  val KeyChars: Int = 12

  /** Absolute distance ceiling — the DP band. */
  val MaxDist: Int = 64

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Normalized text + both block keys, exploded (2 rows per doc). */
  private def blocked(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("nt"))
      .withColumn("len", length(col("nt")).cast("long"))
      .select(col("doc_id"), col("nt"), col("len"),
        explode(array(
          concat(lit("p:"), (col("len") / lit(LenBucket)).cast("long").cast("string"),
            lit(":"), substring(col("nt"), 1, KeyChars)),
          concat(lit("s:"), (col("len") / lit(LenBucket)).cast("long").cast("string"),
            lit(":"), expr(s"right(nt, $KeyChars)")))).as("bk"))

  /** Near-dup pairs (doc_a < doc_b, dist) over the whole corpus. */
  def editPairs(spark: SparkSession, sfDir: String, cap: Int = 64): DataFrame =
    editPairsOf(documents(spark, sfDir), cap)

  /** Same over any (doc_id, text) frame. */
  def editPairsOf(docs: DataFrame, cap: Int = 64): DataFrame = {
    val keys = blocked(docs)
    // df-cap: degenerate block keys are dropped whole (both engines)
    val small = keys.groupBy(col("bk")).count()
      .filter(col("count") <= cap).select(col("bk"))
    val c = keys.join(small, Seq("bk"), "leftsemi")
    val cand = c.as("a").join(c.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.nt").as("nt_a"), col("b.nt").as("nt_b"),
        col("a.len").as("len_a"), col("b.len").as("len_b"))
      .distinct() // a pair can share prefix AND suffix keys
    cand
      .withColumn("dist",
        expr(s"CAST(levenshtein(nt_a, nt_b, ${MaxDist + 1}) AS BIGINT)"))
      .filter(col("dist") >= 0 &&
        col("dist") <= least(lit(MaxDist.toLong),
          expr(s"(len_a + len_b) DIV $LenBucket")))
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }
}
