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
  *    (len div [[BucketWidth]], first [[KeyChars]] chars) and
  *    (len div [[BucketWidth]], last [[KeyChars]] chars), each key
  *    posted in the doc's own and the next length bucket (boundary
  *    splits impossible — see [[BucketWidth]]). A head edit moves the
  *    prefix key but not the suffix key and vice versa; an edit
  *    inside BOTH 12-char windows is out of contract — that rewrite
  *    shape (scattered multi-site edits) is the banded-hash families'
  *    territory, and the boundary is MEASURED, not asserted:
  *    RecallBench's `edit` leg reports blocked-vs-all-pairs recall
  *    with the miss decomposition (BENCH_NOTES r11).
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

  /** Relative-threshold denominator (dist ≤ (len_a+len_b)/20 = 10%
    * of the mean length). */
  val LenBucket: Long = 20L

  /** BLOCKING bucket width — decoupled from the threshold and sized
    * so no acceptable pair can split across non-adjacent buckets:
    * the length gap of any accepted pair is ≤ dist ≤ [[MaxDist]] = 64,
    * and ⌊a/64⌋, ⌊b/64⌋ with |a−b| ≤ 64 differ by at most 1 — so
    * posting every key in its own AND the next bucket makes a
    * boundary split impossible BY ARITHMETIC. (Measured before the
    * fix: 5 of 79 true pairs on the 13× fixture were lost purely to
    * 20-wide bucket boundaries — RecallBench `edit` leg.) */
  val BucketWidth: Long = 64L

  /** Prefix/suffix block-key width in characters. */
  val KeyChars: Int = 12

  /** Absolute distance ceiling — the DP band. */
  val MaxDist: Int = 64

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Normalized text per doc — the payload frame (joined ONCE, after
    * candidate ids are final). */
  private def normalized(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("nt"))
      .withColumn("len", length(col("nt")).cast("long"))

  /** Near-dup pairs (doc_a < doc_b, dist) over the whole corpus. */
  def editPairs(spark: SparkSession, sfDir: String, cap: Int = 64): DataFrame =
    editPairsOf(documents(spark, sfDir), cap)

  /** Same over any (doc_id, text) frame.
    *
    * Plan shape (the part that matters): candidate generation runs on
    * METADATA ONLY — (doc_id, len, block key) rows, no text — so the
    * band shuffle, the df-cap semi-join, the self-join and the
    * pair-dedup all move ids, and the DP sees each distinct pair
    * EXACTLY ONCE via two 1:1 payload joins afterwards. The first cut
    * carried `nt` through the self-join and let Catalyst push the
    * levenshtein filter into the join condition, where it ran per
    * in-bucket ORDERED pair (cnt² per bucket, duplicates included) —
    * measured 14.5 s at sf0.1 vs ~1 s for this shape on the same 628
    * candidates. Downstream of the 1:1 joins the pushed predicate
    * evaluates once per matched row, which IS once per candidate. */
  def editPairsOf(docs: DataFrame, cap: Int = 64): DataFrame = {
    val norm = normalized(docs)
    // each window key posted in the doc's own and the NEXT length
    // bucket: any accepted pair has Δlen ≤ MaxDist = BucketWidth, so
    // its buckets differ by ≤ 1 and the pair always shares a key
    val keys = norm.select(col("doc_id"), col("len"),
      explode(array(
        concat(lit("p:"), (col("len") / lit(BucketWidth)).cast("long").cast("string"),
          lit(":"), substring(col("nt"), 1, KeyChars)),
        concat(lit("p:"), ((col("len") / lit(BucketWidth)).cast("long") + 1).cast("string"),
          lit(":"), substring(col("nt"), 1, KeyChars)),
        concat(lit("s:"), (col("len") / lit(BucketWidth)).cast("long").cast("string"),
          lit(":"), expr(s"right(nt, $KeyChars)")),
        concat(lit("s:"), ((col("len") / lit(BucketWidth)).cast("long") + 1).cast("string"),
          lit(":"), expr(s"right(nt, $KeyChars)")))).as("bk"))
    // df-cap: degenerate block keys are dropped whole (both engines)
    val small = keys.groupBy(col("bk")).count()
      .filter(col("count") <= cap).select(col("bk"))
    val c = keys.join(small, Seq("bk"), "leftsemi")
    val pairIds = c.as("a").join(c.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id")
          // length lower bound: |len_a-len_b| <= dist, so a pair whose
          // length gap exceeds the acceptance threshold can never pass
          // the DP filter — reject it before it exists (exactness-
          // preserving; cheap bigint arithmetic in the join condition)
          && abs(col("a.len") - col("b.len")) <= least(lit(MaxDist.toLong),
            expr(s"(a.len + b.len) DIV $LenBucket")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct() // a pair can share prefix AND suffix keys
    pairIds
      .join(norm.select(col("doc_id").as("doc_a"), col("nt").as("nt_a"),
        col("len").as("len_a")), Seq("doc_a"))
      .join(norm.select(col("doc_id").as("doc_b"), col("nt").as("nt_b"),
        col("len").as("len_b")), Seq("doc_b"))
      .withColumn("dist",
        expr(s"CAST(levenshtein(nt_a, nt_b, ${MaxDist + 1}) AS BIGINT)"))
      .filter(col("dist") >= 0 &&
        col("dist") <= least(lit(MaxDist.toLong),
          expr(s"(len_a + len_b) DIV $LenBucket")))
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** DEDUP-FAMILY AGREEMENT REPORT — the audit a curator runs before
    * trusting one near-dup family's keep/drop decisions: how many
    * pairs the token-level family (n-gram Jaccard ≥ 0.5) and the
    * character-level family (blocked Levenshtein) each flag on this
    * corpus, and how many they agree on. Low overlap is signal, not
    * error — the families see different rewrite types by design
    * (token shuffles vs character edits), and the report quantifies
    * that on the corpus at hand. One full-outer join of the two pair
    * sets, one aggregate; a one-row frame. */
  def familyReport(spark: SparkSession, sfDir: String): DataFrame = {
    val ngram = Dedup.ngramJaccard(spark, sfDir)
      .select(col("i"), col("j"), lit(1L).as("in_ngram"))
    val edit = editPairs(spark, sfDir)
      .select(col("doc_a").as("i"), col("doc_b").as("j"),
        lit(1L).as("in_edit"))
    ngram.join(edit, Seq("i", "j"), "full_outer")
      .select(coalesce(col("in_ngram"), lit(0L)).as("g"),
        coalesce(col("in_edit"), lit(0L)).as("e"))
      .agg(coalesce(sum(col("g")), lit(0L)).as("n_ngram"),
        coalesce(sum(col("e")), lit(0L)).as("n_edit"),
        coalesce(sum(col("g") * col("e")), lit(0L)).as("n_both"),
        count(lit(1)).as("n_either"))
  }

  /** Edit-distance near-dup CLUSTERS — the pairs fed to the shared
    * connected-components machinery ([[Dedup.connectedComponents]]:
    * driver union-find below the edge threshold, distributed hash-min
    * above; singletons never enter the graph). Typo/OCR variants of
    * one document collapse transitively to the min-id canonical copy,
    * same contract as the ngram/LSH cluster gates. */
  def editClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
    val pairs = editPairsOf(docs)
      .select(col("doc_a").as("i"), col("doc_b").as("j"))
    Dedup.connectedComponents(docs, "doc_id", pairs)
  }
}
