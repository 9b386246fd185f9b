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

  // ── PII redaction ─────────────────────────────────────────────────
  // Same cross-engine regex discipline as [[scrub]]: Java and RE2
  // agree on every construct used (no backrefs/lookaround), so the
  // redaction is reproducible in the SQL oracle. All three patterns
  // are counted on the ORIGINAL text (independent, deterministic),
  // then applied in a fixed order (email → ipv4 → phone) — an email's
  // digits disappear before the looser numeric patterns run.

  private val ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The redaction as a composable column expression (map-only,
    * codegen'd regexp_replace chain — no UDF). */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(regexp_replace(c, emailRe, "<email>"), ipv4Re, "<ip>"),
      phoneRe, "<phone>")

  /** Per-doc PII profile over any (doc_id, text) frame: match counts
    * per category + the digest of the redacted text (the digest keeps
    * the gate exact without shipping full redacted bodies through the
    * compare). Map-only; at 100 TB this is a narrow pass whose scan
    * reads two columns. */
  def piiProfile(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
      md5(redactPii(col("text"))).as("red_md5"))

  /** Gate query: [[piiProfile]] over documents with PII planted
    * DETERMINISTICALLY from doc_id (the synthetic corpus contains no
    * real PII, which would make a raw-text gate vacuous — the oracle
    * plants the identical suffix in SQL, so the gate genuinely
    * exercises match counting and replacement order). */
  def pii(spark: SparkSession, sfDir: String): DataFrame =
    piiProfile(documents(spark, sfDir).select(col("doc_id"),
      format_string("%s Contact alice.%d@example.com or 10.0.%d.%d tel 555-867-%04d.",
        col("text"), col("doc_id"), col("doc_id") % 256,
        (col("doc_id") * 7) % 256, col("doc_id") % 10000).as("text")))

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
  /** SCALE variant of [[contamination]]: Bloom PRE-FILTER + exact
    * VERIFY join — the candidate-generation/verification split the
    * dedup family uses (LSH → exact Jaccard), applied to
    * decontamination. The exact operator broadcasts the benchmark's
    * distinct shingle STRINGS, fine while the eval set is MBs;
    * decontaminating against a bigger reference (another corpus slice,
    * a previous run's training data) makes that broadcast gigabytes.
    * Here the benchmark crosses the cluster as a BLOOM FILTER —
    * `1.44·log2(1/fpp)` bits per item (~5.5 bytes/item at 1e-9)
    * regardless of shingle length — and the map-side membership test
    * prunes the corpus postings to SUSPECTS, which alone shuffle into
    * an exact string join against the benchmark. Shuffle volume drops
    * from every corpus shingle to (true hits + Bloom false positives).
    *
    * The output is EXACT BY CONSTRUCTION — false positives survive the
    * prefilter but die in the verify join (one-sided errors: a Bloom
    * never misses a real member, so no true hit is lost). That is why
    * this shares [[contamination]]'s SQL oracle outright; `fpp` tunes
    * shuffle volume, not correctness. (An earlier formulation scored
    * hits from the Bloom alone: on this corpus' highly structured
    * shingles the double-hashed filter produced false hits well above
    * its theoretical rate even at fpp = 1e-13 — the verify join is
    * what makes the operator deterministic rather than lucky.)
    *
    * The Bloom is built DISTRIBUTED (`DataFrameStatFunctions
    * .bloomFilter`, per-partition sketches merged), serialized once,
    * broadcast as bytes, deserialized lazily per task. */
  def contaminationBloom(spark: SparkSession, sfDir: String, n: Int = 8,
      benchMod: Int = 37, pctThreshold: Int = 10,
      fpp: Double = 1e-9): DataFrame = {
    import spark.implicits._
    val docSh = documents(spark, sfDir)
      .select(col("doc_id"),
        expr(Tok.alphaToks).as("toks"))
      .select(col("doc_id"), expr(graft.dedup.Dedup.shinglesFromToks(n)).as("sh"))
      .localCheckpoint() // bench + corpus sides both read it
    val bench = docSh.filter(col("doc_id") % benchMod === 0)
      .select(explode(col("sh")).as("s")).distinct()
    // sizing count: one small job over the benchmark side only
    val nBench = math.max(bench.count(), 1L)
    val bloom = bench.stat.bloomFilter("s", nBench, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val bc = spark.sparkContext.broadcast(bytes)
    // map-side prune: per doc, total count + the suspect shingles only
    val pruned = docSh.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), col("sh"))
      .as[(Long, Seq[String])]
      .mapPartitions { iter =>
        lazy val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bc.value))
        iter.map { case (id, sh) =>
          (id, sh.length.toLong, sh.filter(s => bf.mightContainString(s)))
        }
      }
      .toDF("doc_id", "n_shingles", "suspects")
      .localCheckpoint() // totals + verify both read it; keep one pass
    // exact verify: only suspects shuffle; false positives drop out here
    val verified = pruned
      .select(col("doc_id"), explode(col("suspects")).as("s"))
      .join(bench, Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    pruned.select(col("doc_id"), col("n_shingles"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        (col("n_shingles") > 0 &&
          col("n_hit") * 100 >= col("n_shingles") * pctThreshold)
          .cast("int").as("contaminated"))
  }

  def contamination(spark: SparkSession, sfDir: String, n: Int = 8,
      benchMod: Int = 37, pctThreshold: Int = 10): DataFrame = {
    val sh = documents(spark, sfDir)
      .select(col("doc_id"),
        expr(Tok.alphaToks).as("toks"))
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
