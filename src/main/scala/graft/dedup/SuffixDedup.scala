package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Exact maximal-span substring dedup via a DISTRIBUTED GENERALIZED
  * SUFFIX ARRAY — the missing exactness half of the fixed-k window
  * machinery in [[Dedup.duplicatePassages]] (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * which builds a monolithic suffix array; reference capability
  * context: the corpus-wide text analysis the MR apps of
  * `/root/reference/src/mrapps/wc.go` / `indexer.go` families do per
  * token, here per suffix).
  *
  * Output: per document, the MAXIMAL extents (token offsets) covered
  * by some ≥ `minSpan`-token passage shared verbatim with at least one
  * OTHER document — exactly the "union of duplicated spans" a removal
  * pass cuts. Spans whose copies vary in length are handled by
  * construction (each position is judged by its own suffix), the
  * failure mode fixed-k windows cannot express.
  *
  * Spark-first construction, no monolithic sort, no hashing anywhere
  * (hash-free exactness is the point vs the md5-window path):
  *
  *   1. positions — one row per (doc, token offset); suffixes never
  *      cross document boundaries (generalized SA, no sentinels: a
  *      missing continuation ranks below every real rank).
  *   2. PREFIX DOUBLING to rank depth H = 2^ceil(log2 minSpan): each
  *      round self-joins the position table at distance h and
  *      re-ranks by the (rank, rank_at_h) pair — O(log minSpan)
  *      rounds, each one range-sort of 8-byte rank keys (the
  *      distributed dense-rank primitive below, same two-pass shape
  *      as SequencePacking.globalRank).
  *      DEPTH SUFFICES: suffixes sharing a minSpan-prefix form a
  *      contiguous block under ANY lexicographic order of
  *      H ≥ minSpan prefixes (ties beyond H permute only inside
  *      blocks), which is the only property the run segmentation
  *      needs — a full-depth SA (pass maxDepth) adds nothing for
  *      this output.
  *   3. SA adjacency — global rank over (rank, doc, off), join each
  *      suffix to its successor, and compare the two minSpan-token
  *      slices directly (exact, and the ONLY stage that touches
  *      token strings after ranking).
  *   4. RUN SEGMENTATION — maximal chains of adjacent pairs with
  *      equal slices; a run holding ≥ 2 distinct docs means every
  *      member position starts a cross-doc duplicated passage.
  *      Run ids come from a range-partitioned two-pass prefix scan
  *      (no single-partition window).
  *   5. EXTENTS — per doc, merge the flagged [off, off+minSpan)
  *      intervals into maximal spans (sorted-group scan, one group
  *      per doc, O(1) state).
  *
  * Scale posture: every stage is a bounded-key shuffle or a narrow
  * pass; the rank keys the doubling rounds sort are 16 bytes
  * regardless of minSpan (vs minSpan-token strings for the
  * group-by-window formulation the DuckDB oracle uses — same answer,
  * provably, which is what makes this operator hash-gateable).
  */
object SuffixDedup {

  final case class Span(doc_id: Long, span_start: Long, span_end: Long)

  /** Order- and equality-preserving dense rank of `df` by `keys` —
    * range-partition + local sort + per-partition distinct-key counts
    * cumulated on the driver (numPartitions longs), then a narrow pass
    * increments on key change from the broadcast offsets. Equal keys
    * never split across range partitions, so ranks are globally
    * consistent. Appends `rank`, drops nothing else. */
  private def rankByKey(df: DataFrame, keys: Seq[Column],
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val keyed = df.withColumn("_k", struct(keys: _*))
    val parts = keyed
      .repartitionByRange(partitions, col("_k"))
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
    * threshold. `maxDepth` caps the doubling (default: just past
    * minSpan — sufficient, see object scaladoc; pass Int.MaxValue for
    * a full-depth suffix array). */
  def maximalSpans(spark: SparkSession, sfDir: String, minSpan: Int = 8,
      partitions: Int = 32, maxDepth: Int = 0): DataFrame = {
    import spark.implicits._
    val L = minSpan
    require(L >= 2, "minSpan must be at least 2")

    // (doc_id, toks) — consumed by the position explode and twice by
    // the adjacency slice join; materialize once
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')").as("toks"))
      .localCheckpoint()

    // one row per suffix; only suffixes long enough to carry a span
    // can ever flag, but SHORTER ones still shape the SA order — keep
    // them (they are cheap) so adjacency is the true lexicographic one
    var positions = rankByKey(
      toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("off", "tok")))
        .select(col("doc_id"), col("off"), col("tok")),
      Seq(col("tok")), partitions)
      .drop("tok")

    // prefix doubling to depth >= L (or the caller's cap)
    val depthCap = if (maxDepth > 0) maxDepth
      else Integer.highestOneBit(L - 1) * 2 // first power of two >= L
    var h = 1
    while (h < depthCap) {
      val shifted = positions
        .select(col("doc_id"), (col("off") - h).as("off"), col("rank").as("_r2"))
      positions = rankByKey(
        positions.join(shifted, Seq("doc_id", "off"), "left")
          .withColumn("_r2", coalesce(col("_r2"), lit(-1L)))
          .withColumnRenamed("rank", "_r1"),
        Seq(col("_r1"), col("_r2")), partitions)
        .drop("_r1", "_r2")
      h *= 2
    }

    // SA order: global index over (rank, doc_id, off)
    val sa = graft.text.SequencePacking.globalRank(
      positions.withColumnRenamed("rank", "srank"),
      Seq(col("srank"), col("doc_id"), col("off")), partitions)
      .select(col("doc_id"), col("off"), col("rank").as("sa"))

    // adjacent pairs whose minSpan-token slices are EQUAL (both long
    // enough); `nb` = the successor's sa index — a non-boundary
    val withToks = sa
      .join(toks, "doc_id")
      .select(col("sa"), col("doc_id"), col("off"),
        expr(s"slice(toks, off + 1, $L)").as("sl"),
        (size(col("toks")) - col("off") >= L).as("lng"))
    val nonBoundary = withToks.alias("a")
      .join(withToks.alias("b"), expr("b.sa = a.sa + 1"))
      .filter(col("a.lng") && col("b.lng") && col("a.sl") === col("b.sl"))
      .select(col("b.sa").as("nb"))

    // run ids: prefix scan of boundary indexes in sa order (two-pass,
    // range-partitioned — the run id is the last boundary at or
    // before the suffix)
    val marked = sa.join(nonBoundary, sa("sa") === nonBoundary("nb"), "left")
      .select(col("doc_id"), col("off"), col("sa"),
        col("nb").isNull.as("isB"))
      .repartitionByRange(partitions, col("sa"))
      .sortWithinPartitions(col("sa"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val lastB = marked.filter(col("isB")).groupBy(col("pid"))
      .agg(max(col("sa")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val seeds = (0 until partitions)
      .scanLeft(-1L)((acc, p) => lastB.getOrElse(p, acc))
    val bcSeeds = spark.sparkContext.broadcast(seeds)
    val assigned = marked
      .select(col("doc_id"), col("off"), col("sa"), col("isB"), col("pid"))
      .as[(Long, Int, Long, Boolean, Int)]
      .mapPartitions { it =>
        var run = Long.MinValue
        var curPid = -1
        it.map { case (doc, off, s, isB, pid) =>
          if (pid != curPid) { run = bcSeeds.value(pid); curPid = pid }
          if (isB) run = s
          (doc, off, run)
        }
      }.toDF("doc_id", "off", "run")

    // cross-doc runs -> flagged positions -> per-doc extent merge
    val dupRuns = assigned.groupBy(col("run"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("run"))
    assigned.join(dupRuns, "run")
      .select(col("doc_id"), col("off"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("off")) { (doc, it) =>
        // merge [off, off+L) intervals; touching intervals merge
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
