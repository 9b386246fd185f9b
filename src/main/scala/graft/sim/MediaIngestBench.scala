package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DECODE-HEAVY STREAMING INGEST rehearsal (r12 next-round #8): the
  * media gates are all batch — this puts a wall number on the
  * crawl-loop shape a JPEG corpus actually arrives in: micro-batches
  * of documents, each batch synthesizing real JPEG payloads (the
  * `mm_image_dedup_jpeg` mix — baseline, PROGRESSIVE every third even
  * doc, planted near-dup twins on odd docs, truncated streams on
  * id % 7 == 5), running the full T.81 decode → aHash per row, and
  * appending (doc_id, sig) to a [[graft.streaming.DeltaIndex]]-managed
  * delta log; after the last batch one compaction folds the committed
  * prefix, and the banded multi-probe pair machinery runs over the
  * reassembled index — so the measurement covers decode throughput,
  * per-batch index IO, the staged compaction protocol AND the
  * downstream near-dup join, end to end.
  *
  * In-run verification (a rehearsal that can silently rot measures
  * nothing): row counts per stage, a 64-doc driver recomputation of
  * the exact hashes, and the planted-twin pair floor (every
  * (even, even+1) pair with both sides decodable and no truncation
  * must land within the Hamming budget — the ImageDedupSpec invariant
  * at rehearsal scale).
  *
  * args: [nDocs] [nBatches] (defaults 65000 ≈ 13× the sf0.1 corpus,
  * 8). Prints one [media-ingest] line per stage for BENCH_NOTES. */
object MediaIngestBench {

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(65000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[media-ingest] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_media_ingest").toString
    val step = nDocs / nBatches + 1

    val tIngest = System.nanoTime()
    var total = 0L
    (0 until nBatches).foreach { b =>
      val lo = b.toLong * step
      val hi = math.min(nDocs.toLong, lo + step)
      val n = timed(s"batch $b decode+hash+append (${hi - lo} docs)") {
        val sigs = spark.range(lo, hi).as[Long]
          .map(id => (id, graft.multimodal.ImageDedup.imageHash(
            graft.multimodal.Jpeg.dedupPayload(id))))
          .toDF("doc_id", "sig")
        sigs.write.mode("overwrite").parquet(s"$idxPath/b$b")
        spark.read.parquet(s"$idxPath/b$b").count()
      }
      total += n
    }
    println(f"[media-ingest] ingest total: ${(System.nanoTime() - tIngest) / 1e9}%.1f s, $total rows")
    assert(total == nDocs, s"ingested $total of $nDocs")

    timed("compaction (staged, _SUCCESS-committed)") {
      graft.streaming.DeltaIndex.compact(spark, idxPath, nBatches.toLong) {
        parts => parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
      }
    }
    val index = spark.read.parquet(
      graft.streaming.DeltaIndex.listBatches(spark, idxPath): _*)
    assert(index.count() == nDocs, "compacted index must keep every row")

    // driver spot-check: the distributed hashes are the real thing
    val sample = index.filter(col("doc_id") < 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bounded by nDocs: args are user-supplied, and a sub-64-doc run
    // must fail assertions with a message, not NoSuchElementException
    // (ADVICE r13)
    (0L until math.min(64L, nDocs.toLong)).foreach { id =>
      val want = graft.multimodal.ImageDedup.imageHash(
        graft.multimodal.Jpeg.dedupPayload(id))
      assert(sample(id) == want, s"hash mismatch doc $id")
    }

    // the 8-bit-band multi-probe scheme measured first: at this scale
    // the low-entropy aHashes of tiny images blow its bucket caps and
    // twin recall collapses (the r13 finding that motivated the
    // collapse+wide path) — REPORTED, not asserted
    val mpPairs = timed("8-bit multi-probe pair pass (the sub-scale scheme)") {
      graft.dedup.Dedup.simhashPairsMultiProbeOf(index, 15, 1000)
        .localCheckpoint()
    }
    val pairs = timed("collapse + wide-band pair pass (the scale path)") {
      graft.dedup.Dedup.simhashPairsWideCollapsedOf(index, 15, 1000)
        .localCheckpoint()
    }
    val nPairs = pairs.count()
    // the production entry point itself: dumpAndPair must MEASURE the
    // over-cap occupancy of this low-entropy frame and route it wide
    // (r13 What's wrong #1 — the old doc-count switch kept 65k on the
    // 0.31-recall path; the regime pick is asserted, not assumed)
    val routed = timed("dumpAndPair auto-routed pair pass (measured regime pick)") {
      graft.multimodal.SigDump.dumpAndPair(index, "ingest_probe_sigs",
        s"ingest$nDocs", 15, 1000)(_ => ()).localCheckpoint()
    }
    assert(graft.multimodal.SigDump.lastWide,
      "dumpAndPair must measure the over-cap occupancy and pick wide")
    // exact truth for the planted twins, FROM THE SIGNATURES: a twin
    // (even, even+1) is in-contract iff its two sigs are within the
    // Hamming budget — the pigeonhole claim verified at scale, with
    // fixture pathologies (mean-crossing aHash flips) excluded by
    // construction rather than hand-waved
    val twinTruth = index.as("x").join(index.as("y"),
        col("y.doc_id") === col("x.doc_id") + 1 && col("x.doc_id") % 2 === 0)
      .filter(expr("bit_count(x.sig ^ y.sig) <= 15")).count()
    def twinHits(p: org.apache.spark.sql.DataFrame): Long =
      p.filter(col("j") === col("i") + 1 && col("i") % 2 === 0).count()
    val wideHits = twinHits(pairs)
    val routedHits = twinHits(routed)
    println(s"[media-ingest] multi-probe twin recall: ${twinHits(mpPairs)} / $twinTruth")
    println(s"[media-ingest] collapse+wide pairs: $nPairs, twin recall: $wideHits / $twinTruth")
    println(s"[media-ingest] dumpAndPair-routed twin recall: $routedHits / $twinTruth")
    assert(wideHits == twinTruth,
      s"the scale path must find exactly the in-contract twins: $wideHits != $twinTruth")
    assert(routedHits == twinTruth,
      s"the PRODUCTION entry must reach full recall via the measured switch: $routedHits != $twinTruth")
    println("[media-ingest] OK")
    spark.stop()
  }
}
