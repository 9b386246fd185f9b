package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact maximal-span substring dedup via DISTRIBUTED SUFFIX-ARRAY
  * RANKS — the missing exactness half of the fixed-k window machinery
  * in [[Dedup.duplicatePassages]] (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", which builds a
  * monolithic suffix array).
  *
  * Output: per document, the MAXIMAL extents (token offsets) covered
  * by some ≥ `minSpan`-token passage shared verbatim with at least one
  * OTHER document — exactly the "union of duplicated spans" a removal
  * pass cuts. Copies of differing lengths are handled by construction
  * (each position is judged by its own suffix), the failure mode a
  * fixed-k digest cannot express; and unlike the md5-window path there
  * is NO HASHING anywhere — exactness is structural.
  *
  * Construction (Spark-first, no monolithic sort, no global window):
  *
  *   1. positions — one row per (doc, token offset); suffixes never
  *      cross document boundaries (generalized SA; a missing
  *      continuation ranks below every real rank, so no sentinels).
  *   2. PREFIX QUADRUPLING: the SA rank construction at stride ×4 —
  *      each round re-ranks by the 4-tuple (rank_d(i), rank_d(i+d),
  *      rank_d(i+2d), rank_d(i+3d)), where the shifted ranks are
  *      CHUNKED window `lead`s ([[chunkedLeads]] — (doc, offset-chunk)
  *      partitions with a ≤3·depth carry overlap, so no document ever
  *      serializes a round into one task) and the re-rank is the
  *      distributed dense-rank primitive below (one hash-partitioned
  *      sort of the 32-byte tuple). Depth stops at the largest
  *      reachable ≤ minSpan — and rounds only run at all while the
  *      final combine would need more than [[RawCombineMax]] rank
  *      components (small minSpan goes straight to step 3 on the
  *      broadcast-vocabulary token ranks).
  *   3. FINAL COMBINE to depth EXACTLY minSpan: the flagging key is
  *      the multi-offset rank tuple at strides of `depth` plus
  *      (minSpan − depth), whose windows tile [0, minSpan) with
  *      overlap — component-wise equality ⇔ first-minSpan-token
  *      equality, the sparse-table idiom.
  *   4. FLAGGING collapses to a groupBy on that tuple: for suffixes
  *      ≥ minSpan long every referenced window stays inside the
  *      document (padding semantics never leak in), and a group
  *      holding ≥ 2 distinct docs flags every member position. The
  *      full SA ORDER — and the adjacent-LCP run scan it would
  *      enable — is deliberately NOT built: it adds a global rank, a
  *      slice join and a prefix scan but nothing to this output,
  *      whose semantics are position-level, not pair-level.
  *   5. EXTENTS — per doc, merge flagged [off, off+minSpan) intervals
  *      into maximal spans (sorted-group scan, O(1) state).
  *
  * Scale posture: ceil(log4 minSpan) rounds, each one CHUNKED lead
  * pass + one range sort of ≤32-BYTE RANK TUPLES — at minSpan=50 the
  * group-by-window-string formulation (which the DuckDB oracle runs,
  * and SuffixDedupSpec proves equal) would shuffle ~300-byte string
  * keys instead; the rank construction is what survives 100 TB. No
  * stage is keyed on fewer than n distinct values; no driver state
  * beyond numPartitions longs per round. The lead passes partition by
  * (doc, offset-chunk), NOT by doc ([[chunkedLeads]]): a single giant
  * document (an undelimited crawl blob) spreads over dlen/[[LeadChunk]]
  * tasks per round instead of serializing into one — the same
  * segmented-fold discipline as
  * [[graft.streaming.ShardMigration.migrationsBatchSegmented]].
  */
object SuffixDedup {

  /** Default chunk width (tokens) for the chunked lead passes — wide
    * enough that the ≤ minSpan-row overlap copied per boundary is
    * noise (<1% at minSpan=50), narrow enough that a book-sized doc
    * already splits into several tasks. */
  val LeadChunk: Int = 1 << 13

  /** Largest final-combine tuple width (rank components) before a
    * prefix-quadrupling round is worth its cost. A round is one full
    * chunked-lead window pass plus one exchange+sort+count+emit rank
    * pass over EVERY position; what it buys is a narrower tuple in the
    * single final groupBy/join. 8 longs = 64 B/row is already within
    * 2× of the quadrupled shape's own 32-byte per-round keys, so
    * spending 3+ extra full-corpus passes to shrink below it can never
    * pay — at any corpus size, not just gate scale. minSpan=8 (the
    * registered span queries) therefore runs ZERO ranking rounds:
    * positions go straight from the broadcast vocabulary rank to the
    * 8-component final combine. */
  val RawCombineMax: Int = 8

  /** Debug switch (round-6 review note): when on, [[chunkedLeads]]
    * VERIFIES its dense-0-based-`off` precondition per doc before
    * running — one extra aggregation job per call, so it's an opt-in
    * for new call sites / fixture changes, not a production tax.
    * Seeded from `-Dgraft.debug.denseOff=true`; tests flip it
    * directly. */
  @volatile private[dedup] var debugDenseOff: Boolean =
    sys.props.get("graft.debug.denseOff").exists(_.equalsIgnoreCase("true"))

  /** The 3 window `lead`s of the quadrupling rounds — and the final
    * combine's multi-offset leads — computed WITHOUT a per-document
    * window: rows are exploded into their home offset-chunk plus (for
    * the first `maxLead` offsets of a chunk) a carry copy into the
    * PREVIOUS chunk, a (doc, chunk) window computes the leads, and
    * carries are dropped. Offsets are dense per doc, so every native
    * row sees its true off+d successor (or the doc end → −1, the same
    * sentinel as the per-doc window). Parallelism is #docs × chunks
    * per doc, task size ≤ chunk + maxLead — a giant doc no longer
    * serializes a round into one straggler task.
    *
    * PRECONDITION: `off` must be dense and 0-based per `doc_id` —
    * `lead` counts rows, not offset deltas, so a gap would silently
    * misalign the carry with its home chunk rather than fail. Both
    * call sites ([[rankKeyed]]) feed `posexplode` output, which is
    * dense by construction. */
  private[dedup] def chunkedLeads(df: DataFrame, value: String,
      dists: Seq[Int], names: Seq[String], chunk: Int): DataFrame = {
    require(dists.nonEmpty && dists.forall(_ > 0) && dists.length == names.length)
    val maxLead = dists.max
    require(chunk > maxLead, s"chunk width $chunk must exceed max lead $maxLead" +
      " (note: caller must supply dense 0-based `off` per doc_id; see scaladoc)")
    if (debugDenseOff) {
      // debug path: prove the density precondition instead of trusting
      // it — a gap would silently misalign carries, never fail
      // min==0 && max+1==rows alone would accept a duplicate offset
      // masking a gap ([0,0,2]); distinct==rows closes that hole
      val bad = df.groupBy(col("doc_id"))
        .agg(min(col("off")).as("mn"), max(col("off")).as("mx"),
          count(lit(1)).as("c"), countDistinct(col("off")).as("d"))
        .filter(col("mn") =!= 0L || col("mx") + 1 =!= col("c") ||
          col("d") =!= col("c"))
        .limit(1).collect()
      require(bad.isEmpty, {
        val r = bad.head
        s"chunkedLeads: `off` not dense 0-based for doc_id=${r.get(0)} " +
          s"(min=${r.get(1)}, max=${r.get(2)}, rows=${r.get(3)}, " +
          s"distinct=${r.get(4)}) — lead() counts rows, not offset deltas"
      })
    }
    val home = expr(s"CAST(floor(off / $chunk) AS BIGINT)")
    val spread = df.withColumn("_chunk", explode(
      when(col("off") % chunk < maxLead && col("off") >= chunk,
        array(home, home - 1)).otherwise(array(home))))
    val w = Window.partitionBy(col("doc_id"), col("_chunk")).orderBy(col("off"))
    val withLeads = dists.zip(names).foldLeft(spread) { case (acc, (d, n)) =>
      acc.withColumn(n, coalesce(lead(col(value), d).over(w), lit(-1L)))
    }
    withLeads.filter(col("_chunk") === home).drop("_chunk")
  }

  final case class Span(doc_id: Long, span_start: Long, span_end: Long)

  /** Equality-preserving dense rank of `df` by `keys` — HASH-partition
    * + local sort + per-partition distinct-key counts cumulated on the
    * driver (numPartitions longs), then a narrow pass increments on
    * key change from the broadcast offsets. Equal keys never split
    * across hash partitions, so ranks are globally INJECTIVE per
    * equality class — which is all any consumer needs: the quadrupling
    * induction and the final-combine flagging reason about tuple
    * EQUALITY only, never about rank ORDER (r18 optimization: the
    * former repartitionByRange ran a sampling job per round for an
    * order guarantee nothing consumed; hash partitioning drops that
    * pass and balances classes without skew-prone range bounds).
    * Appends `rank`, drops nothing else. */
  private def rankByKey(df: DataFrame, keys: Seq[Column],
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val keyed = df.withColumn("_k", struct(keys: _*))
    val parts = keyed
      .repartition(partitions, col("_k"))
      .sortWithinPartitions(col("_k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // both passes must see the same layout
    val counts = parts.groupBy(col("pid"))
      .agg(count_distinct(col("_k")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions)
      .scanLeft(0L)((a, p) => a + counts.getOrElse(p, 0L))
    val bc = parts.sparkSession.sparkContext.broadcast(offsets)
    val kIdx = parts.schema.fieldIndex("_k")
    val pidIdx = parts.schema.fieldIndex("pid")
    val keep = parts.schema.fields.zipWithIndex
      .filterNot { case (f, _) => f.name == "_k" || f.name == "pid" }
    val outSchema = StructType(keep.map(_._1).toArray)
      .add("rank", LongType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    parts.mapPartitions({ it =>
      var cur: Any = null
      var rank = -1L
      var curPid = -1
      it.map { row =>
        val pid = row.getInt(pidIdx)
        if (pid != curPid) { rank = bc.value(pid) - 1; cur = null; curPid = pid }
        val k = row.get(kIdx)
        if (cur == null || k != cur) { rank += 1; cur = k }
        Row.fromSeq(keep.map { case (_, i) => row.get(i) } :+ rank)
      }
    })(enc)
  }

  /** Maximal cross-document duplicated extents at the `minSpan`-token
    * threshold (see object scaladoc). */
  def maximalSpans(spark: SparkSession, sfDir: String, minSpan: Int = 8,
      partitions: Int = 32, chunk: Int = LeadChunk): DataFrame = {
    val (keyed, keyNames) = rankKeyed(spark, sfDir, minSpan, partitions, chunk)
    val dup = keyed.groupBy(keyNames.map(col): _*)
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(keyNames.map(col): _*)
    mergeExtents(keyed.join(dup, keyNames), minSpan)
  }

  /** SPAN-LEVEL DECONTAMINATION: for every NON-benchmark document, the
    * maximal extents shared verbatim (≥ minSpan tokens) with ANY
    * benchmark document (`doc_id % benchMod == 0`, the split
    * [[graft.text.Cleaning.contamination]] uses) — the excision list
    * for cutting benchmark text OUT of training documents instead of
    * dropping them whole. Same rank machinery, different flagging
    * head: a rank-tuple group flags its corpus members iff it holds at
    * least one benchmark position. Corpus-corpus duplication does NOT
    * flag here (that is [[maximalSpans]]'s job); benchmark docs are
    * never emitted. */
  def benchmarkSpans(spark: SparkSession, sfDir: String, minSpan: Int = 8,
      benchMod: Int = 37, partitions: Int = 32,
      chunk: Int = LeadChunk): DataFrame = {
    val (keyed, keyNames) = rankKeyed(spark, sfDir, minSpan, partitions, chunk)
    benchmarkSpanHead(keyed, keyNames, minSpan, benchMod)
  }

  /** [[benchmarkSpans]]' flagging head over an already-built rank
    * keying — shared with [[decontamSuite]] so the suite pays the rank
    * construction once. */
  private def benchmarkSpanHead(keyed: DataFrame, keyNames: Seq[String],
      minSpan: Int, benchMod: Int): DataFrame = {
    val hot = keyed.filter(col("doc_id") % benchMod === 0)
      .select(keyNames.map(col): _*).distinct()
    mergeExtents(
      keyed.filter(col("doc_id") % benchMod =!= 0).join(hot, keyNames),
      minSpan)
  }

  /** EXCISION — the consumer of the span outputs: cut the given
    * extents out of the documents at token level and re-join the
    * survivors. `spans` is any (doc_id, span_start, span_end) frame
    * ([[maximalSpans]], [[benchmarkSpans]], [[SpanIndex.probe]]);
    * extents from those producers are disjoint per doc (merged
    * islands), so `n_removed` is their total width. Map-only after a
    * per-doc collect of the (tiny) span list; docs without spans pass
    * through unchanged, tokenization is the engine-wide `[^a-z]+`
    * fold so excision composes with every other text operator. */
  def exciseSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val cuts = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("cuts"))
    docs
      .select(col("doc_id"),
        expr(graft.text.Tok.alphaToks).as("toks"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        expr("""CASE WHEN cuts IS NULL THEN toks ELSE
               |  filter(toks, (x, i) ->
               |    NOT exists(cuts, c -> i >= c.span_start AND i < c.span_end))
               |END""".stripMargin).as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** Gate surface (`text_excise`): the TRAINING corpus (non-benchmark
    * docs) with every benchmark-overlapping extent cut out — detect
    * ([[benchmarkSpans]]) composed with excise, the decontamination
    * act itself. */
  def exciseBenchmarkSpans(spark: SparkSession, sfDir: String,
      minSpan: Int = 8, benchMod: Int = 37, partitions: Int = 32,
      chunk: Int = LeadChunk): DataFrame =
    exciseSpans(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % benchMod =!= 0),
      benchmarkSpans(spark, sfDir, minSpan, benchMod, partitions, chunk))

  /** THE DECONTAMINATION SUITE — the production shape of the span
    * family: ONE rank construction ([[rankKeyed]], the dominant cost),
    * four consumers off it, emitted as one tagged union:
    *
    *   - `spans`  — [[benchmarkSpans]]' excision list
    *                (v1 = span_start, v2 = span_end)
    *   - `excise` — [[exciseSpans]] of the training split
    *                (v1 = n_removed, txt = clean_text)
    *   - `leak`   — [[benchmarkLeakProfile]]'s eval-integrity report
    *                (v1 = n_windows, v2 = n_leaked, v3 = is_compromised)
    *   - `pack`   — [[CorpusPipeline.prepareDf]] over the excised text
    *                (v1 = n_tokens, v2 = pack_id)
    *
    * Run standalone, the four gates each pay the rank pipeline — the
    * right bench model for per-query independence, but a user running
    * a decontamination pass wants all four outputs from one pass; this
    * is that amortized program, and its own hash gate
    * (`text_decontam_suite`) pins the amortization doesn't change a
    * row: the DuckDB oracle is the four gates' CTE chains fused into
    * one WITH + UNION ALL. The intermediates that fan out are
    * localCheckpoint'd at their size floor (extent list, excised
    * corpus); everything upstream is already checkpointed inside
    * [[rankKeyed]]. SuffixDedupSpec pins both the row-level
    * equivalence to the four standalone operators and that exactly ONE
    * rank construction runs ([[rankKeyedRuns]]). */
  def decontamSuite(spark: SparkSession, sfDir: String, minSpan: Int = 8,
      benchMod: Int = 37, pctThreshold: Int = 10, budget: Long = 512L,
      minTokens: Long = 5L, partitions: Int = 32,
      chunk: Int = LeadChunk): DataFrame = {
    val (keyed, keyNames) = rankKeyed(spark, sfDir, minSpan, partitions, chunk)
    val nulL = lit(null).cast("long")
    val nulS = lit(null).cast("string")
    val spans = benchmarkSpanHead(keyed, keyNames, minSpan, benchMod)
      .localCheckpoint() // two consumers: the union row set + excision
    val excised = exciseSpans(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % benchMod =!= 0),
      spans)
      .localCheckpoint() // two consumers: the union row set + packing
    val leak = leakProfileHead(keyed, keyNames, benchMod, pctThreshold)
    val packed = graft.text.CorpusPipeline.prepareDf(
      excised.select(col("doc_id"), col("clean_text").as("text")),
      budget, minTokens, partitions)
    spans.select(lit("spans").as("part"), col("doc_id"),
        col("span_start").as("v1"), col("span_end").as("v2"),
        nulL.as("v3"), nulS.as("txt"))
      .unionAll(excised.select(lit("excise").as("part"), col("doc_id"),
        col("n_removed").as("v1"), nulL.as("v2"), nulL.as("v3"),
        col("clean_text").as("txt")))
      .unionAll(leak.select(lit("leak").as("part"), col("doc_id"),
        col("n_windows").as("v1"), col("n_leaked").as("v2"),
        col("is_compromised").cast("long").as("v3"), nulS.as("txt")))
      .unionAll(packed.select(lit("pack").as("part"), col("doc_id"),
        col("n_tokens").as("v1"), col("pack_id").as("v2"),
        nulL.as("v3"), nulS.as("txt")))
  }

  /** LEAK PROFILE — [[benchmarkSpans]] from the evaluation side: for
    * every benchmark document, how many of its minSpan-token windows
    * appear verbatim anywhere in the training corpus, and whether the
    * leak crosses `pctThreshold` percent — the eval-integrity report
    * that says which benchmarks are still trustworthy against this
    * corpus. Benchmark docs shorter than minSpan carry no windows and
    * cannot leak at this granularity; they are absent (same rule as
    * the window-level operators). Integer outputs, cross-multiplied
    * flag — fully SQL-expressible. */
  def benchmarkLeakProfile(spark: SparkSession, sfDir: String,
      minSpan: Int = 8, benchMod: Int = 37, pctThreshold: Int = 10,
      partitions: Int = 32, chunk: Int = LeadChunk): DataFrame = {
    val (keyed, keyNames) = rankKeyed(spark, sfDir, minSpan, partitions, chunk)
    leakProfileHead(keyed, keyNames, benchMod, pctThreshold)
  }

  /** [[benchmarkLeakProfile]]'s head over a shared rank keying. */
  private def leakProfileHead(keyed: DataFrame, keyNames: Seq[String],
      benchMod: Int, pctThreshold: Int): DataFrame = {
    val corpusKeys = keyed.filter(col("doc_id") % benchMod =!= 0)
      .select(keyNames.map(col): _*).distinct()
    val bench = keyed.filter(col("doc_id") % benchMod === 0)
    val leaked = bench.join(corpusKeys, keyNames, "leftsemi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked"))
    bench.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
      .join(leaked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .withColumn("is_compromised",
        (col("n_leaked") * 100 >= col("n_windows") * pctThreshold).cast("int"))
  }

  final case class Match(doc_i: Long, doc_j: Long, off_i: Long,
      off_j: Long, match_len: Long)

  /** PER-PAIR MAXIMAL MATCHES — the diagnosis view the union extents
    * deliberately flatten: one row per maximal shared occurrence
    * (which partner, where, how long). A maximal shared span of
    * length M ≥ minSpan between docs i and j occupies M−minSpan+1
    * consecutive window offsets on ONE DIAGONAL (off_i − off_j
    * constant), so after the rank grouping the matches fall out of a
    * per-(i, j, diagonal) run scan — no SA order, no LCP stack, and
    * `match_len = run + minSpan − 1` is exact, with maximality
    * guaranteed because the windows just off both ends differ.
    *
    * `maxGroup` caps the cross-doc pair explosion per rank group (a
    * boilerplate window shared by thousands of docs would otherwise
    * emit quadratic pairs — the same cap discipline as LSH buckets
    * and the passage-dedup composition); groups past the cap are
    * dropped, documented, and spec-exercised. Within-doc repeats are
    * out of scope (cross-doc pairs only). */
  def maximalMatches(spark: SparkSession, sfDir: String, minSpan: Int = 8,
      maxGroup: Int = 1000, partitions: Int = 32,
      chunk: Int = LeadChunk): DataFrame = {
    import spark.implicits._
    val L = minSpan
    val (keyed, keyNames) = rankKeyed(spark, sfDir, L, partitions, chunk)
    // cap BEFORE materializing: a counts-only pass (map-side
    // combinable, constant state) selects the surviving groups, so the
    // collect_list buffer below is bounded by maxGroup — collecting
    // first and capping after would buffer a boilerplate group's every
    // position on one executor
    val surviving = keyed.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("n") <= maxGroup)
      .select(keyNames.map(col): _*)
    val pairs = keyed.join(surviving, keyNames)
      .groupBy(keyNames.map(col): _*)
      .agg(collect_list(struct(col("doc_id"), col("off"))).as("ms"))
      .select(explode(expr(
        """flatten(transform(ms, a ->
          |  transform(filter(ms, b -> a.doc_id < b.doc_id),
          |    b -> struct(a.doc_id AS di, a.off AS oi,
          |                b.doc_id AS dj, b.off AS oj))))""".stripMargin)).as("p"))
      .select(col("p.di"), col("p.oi"), col("p.dj"), col("p.oj"))
    diagonalRuns(pairs, L)
  }

  /** Maximal runs of consecutive window offsets per (doc pair,
    * diagonal) — the match-extraction scan shared by [[maximalMatches]]
    * and [[SpanIndex.probeMatches]]. `pairs` must carry (di, oi, dj,
    * oj) window-equality evidence; a run of consecutive oi (constant
    * oi − oj) of length r is a verbatim shared extent of r + L − 1
    * tokens, maximal w.r.t. the evidence (the windows just off both
    * ends are absent). O(1) state per group. */
  private[dedup] def diagonalRuns(pairs: DataFrame, L: Int): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      .select(col("di"), col("oi").cast("int"),
        col("dj"), col("oj").cast("int"))
      .as[(Long, Int, Long, Int)]
      .groupByKey { case (di, oi, dj, oj) => (di, dj, oi.toLong - oj) }
      .flatMapSortedGroups(col("oi")) { case ((di, dj, _), it) =>
        // maximal runs of consecutive window offsets on the diagonal
        var startI = -1L; var startJ = -1L; var prev = Long.MinValue
        val out = Seq.newBuilder[Match]
        it.foreach { case (_, oi, _, oj) =>
          if (startI < 0) { startI = oi; startJ = oj }
          else if (oi != prev + 1) {
            out += Match(di, dj, startI, startJ, prev - startI + L)
            startI = oi; startJ = oj
          }
          prev = oi
        }
        if (startI >= 0) out += Match(di, dj, startI, startJ, prev - startI + L)
        out.result().iterator
      }.toDF()
  }

  /** Positions keyed by their depth-exactly-L rank tuple (the shared
    * construction both flagging heads group on), plus the key column
    * names. Only suffixes ≥ L tokens long survive. */
  /** Number of [[rankKeyed]] constructions this JVM has run — test
    * observability for [[decontamSuite]]'s one-pass claim (the suite
    * must increment this by exactly 1; the four standalone operators
    * increment it by 4). */
  private[dedup] val rankKeyedRuns = new java.util.concurrent.atomic.AtomicLong(0)

  private def rankKeyed(spark: SparkSession, sfDir: String, minSpan: Int,
      partitions: Int, chunk: Int): (DataFrame, Seq[String]) = {
    import spark.implicits._
    rankKeyedRuns.incrementAndGet()
    val L = minSpan
    require(L >= 2, "minSpan must be at least 2")
    require(chunk > L, s"lead chunk width $chunk must exceed minSpan $L")

    // one row per suffix; short suffixes can never flag (eligibility
    // below) but still serve as rank PROVIDERS for the doubling —
    // interior lookups of an eligible suffix stay inside its document
    // three consumers (vocab size, vocab collect, round-0 rank) —
    // materialize the tokenize+explode once instead of re-running the
    // regex split per job
    // NOT widened (r17 audit): the tokenize pass is ~2.5 s serial at
    // gate scale, but every downstream doubling round inherits the
    // width, and the loop's ~30 small stages at 32 tasks each cost
    // MORE in per-task overhead (measured task_ms 26 k → 96 k, wall
    // up ~2×) than the serial tokenize saves. At production scale the
    // scan is wide on its own and the rounds carry real data per task.
    val tokened = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr(graft.text.Tok.alphaToks).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dlen"),
        posexplode(col("toks")).as(Seq("off", "tok")))
      .select(col("doc_id"), col("dlen"), col("off"), col("tok"))
      .localCheckpoint()
    // initial token rank: a vocabulary small enough to broadcast makes
    // round 0 a map-only pass (natural-language type counts fit ~1M
    // comfortably); otherwise the generic distributed rank. ONE job:
    // the capped limit-collect both measures and fetches the
    // vocabulary (the former count_distinct pre-check was a second
    // full aggregation pass over the postings for the same decision);
    // the driver-side sort costs nothing distributed and keeps the
    // rank assignment deterministic.
    val vocabCap = 1 << 20
    val vocabRows = tokened.select(col("tok")).distinct()
      .limit(vocabCap + 1).as[String].collect()
    var positions =
      if (vocabRows.length <= vocabCap) {
        val vocab = vocabRows.sorted
        val bc = spark.sparkContext.broadcast(
          vocab.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap)
        tokened.as[(Long, Int, Int, String)]
          .map { case (d, n, o, t) => (d, n, o, bc.value(t)) }
          .toDF("doc_id", "dlen", "off", "rank")
      } else rankByKey(tokened, Seq(col("tok")), partitions).drop("tok")

    // prefix QUADRUPLING: each round re-ranks by the 4-tuple of ranks
    // at strides 0,d,2d,3d — three leads in ONE chunked lead pass,
    // one 32-byte hash-partitioned sort, depth ×4 (halves the round
    // count of classic doubling; same induction, windows still tile
    // exactly). A round only runs while the FINAL COMBINE at the
    // current depth would need more than [[RawCombineMax]] rank
    // components (r18): each round costs one full window pass plus one
    // exchange+sort+two-agg-pass rank over every position, and buys
    // only a narrower final tuple — at minSpan=8 the raw depth-1 tuple
    // is 8 longs (64 B/row, at or under the quadrupled shape's own
    // 32-byte round keys), so the entire rank construction is pure
    // overhead; at minSpan=50 the cap leaves the 1→4→16 schedule
    // unchanged. Equality semantics are depth-independent (every
    // consumer groups/joins on component-wise tuple equality).
    var depth = 1
    def combineWidth(d: Int): Int =
      (((0 until (L - d) by d) :+ (L - d)).distinct: Seq[Int]).length
    while (depth * 4 < L && combineWidth(depth) > RawCombineMax) {
      positions = rankByKey(
        chunkedLeads(positions, "rank",
          Seq(depth, 2 * depth, 3 * depth), Seq("_r2", "_r3", "_r4"), chunk)
          .withColumnRenamed("rank", "_r1"),
        Seq(col("_r1"), col("_r2"), col("_r3"), col("_r4")), partitions)
        .drop("_r1", "_r2", "_r3", "_r4")
      depth *= 4
    }

    // final combine to depth EXACTLY L — no re-rank needed, the
    // flagging groupBy keys on the multi-offset tuple directly. The
    // offsets tile [0, L): strides of `depth`, plus L-depth so the
    // last window ends flush at L (overlap is fine — equality of every
    // component ⇔ equality of the first L tokens, sparse-table style).
    val offs = ((0 until (L - depth) by depth) :+ (L - depth)).distinct
    val leadOffs = offs.filter(_ > 0)
    val withLeads = chunkedLeads(positions, "rank",
      leadOffs, leadOffs.map(o => s"_ko$o"), chunk)
    val keyCols = offs.zipWithIndex.map { case (o, i) =>
      (if (o == 0) col("rank") else col(s"_ko$o")).as(s"_k$i")
    }
    val keyNames = offs.indices.map(i => s"_k$i")
    val keyed = withLeads
      .select((col("doc_id") +: col("dlen") +: col("off") +: keyCols): _*)
      .filter(col("dlen") - col("off") >= L) // suffix long enough to span
      .drop("dlen")
      .localCheckpoint() // grouped and joined by the flagging heads
    (keyed, keyNames)
  }

  /** Per-doc merge of flagged [off, off+L) intervals into maximal
    * spans — sorted-group scan, O(1) state; touching intervals merge.
    * Shared with [[SpanIndex]]'s probe. */
  private[dedup] def mergeExtents(flagged: DataFrame, L: Int): DataFrame = {
    import flagged.sparkSession.implicits._
    flagged
      .select(col("doc_id"), col("off"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("off")) { (doc, it) =>
        var start = -1L
        var end = -1L
        val out = Seq.newBuilder[Span]
        it.foreach { case (_, off) =>
          if (start < 0) { start = off; end = off + L }
          else if (off > end) { out += Span(doc, start, end); start = off; end = off + L }
          else end = math.max(end, off + L)
        }
        if (start >= 0) out += Span(doc, start, end)
        out.result().iterator
      }.toDF()
  }
}
