package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING zstd-CRAWL INGEST — the continuous twin of
  * [[graft.text.CompressedIngest.zstdIngestReport]], the same
  * composition [[GzipStream]] proved for gzip (r13 ask #7): a real
  * `.jsonl.zst` feed tails frames continuously, so the RFC 8878
  * decode must compose with the delta-log discipline end-to-end.
  *
  *  - [[decoded]]: the stateless streaming stage — (doc_id, zst, t) →
  *    (doc_id, text, t) through [[graft.text.Zstd.decompress]] with
  *    its bomb guard; undecodable frames DROPPED with their ids
  *    (crawl quality-floor semantics).
  *  - [[ingestStream]]: the gate surface (`text_zstd_ingest_stream`)
  *    — ordered doc-range batches land as [[DeltaIndex]] subdirs with
  *    a mid-stream staged compaction, and the reassembled index must
  *    equal the one-shot batch report row for row (the oracle IS the
  *    batch twin's SQL, so lost batches, double-landed retries and
  *    compaction gaps all become hash mismatches).
  *
  * Scale posture: per batch one map-only compress+decode pass over a
  * pushed-down doc_id `between` range plus one parquet append;
  * cross-batch state is the on-disk index alone. */
object ZstdStream {

  /** Stateless streaming decode stage: decompress the binary column,
    * keep decodable rows. */
  def decoded(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("zst"), col("t"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .flatMap { case (id, zst, t) =>
        graft.text.Zstd.decompress(zst).map(b =>
          (id, new String(b, java.nio.charset.StandardCharsets.UTF_8), t))
      }
      .toDF("doc_id", "text", "t")
  }

  /** One micro-batch's (doc_id, n_tokens, n_chars) frame over the
    * doc_id range [lo, hi): the SAME fixture classes as the batch
    * gate (skippable-frame, two-frame shard, truncated). */
  private[streaming] def batchCounts(spark: SparkSession, sfDir: String,
      lo: Long, hi: Long): DataFrame =
    graft.text.CompressedIngest.zstdIngestReportOf(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id").between(lo, hi - 1)))

  /** Gate surface (`text_zstd_ingest_stream`): replay the zstd
    * fixture in `nBatches` ordered doc-range batches through the
    * delta-log, compact after the second batch commits, and emit the
    * reassembled index. */
  def ingestStream(spark: SparkSession, sfDir: String, nBatches: Int = 4,
      idxPath: String = null): DataFrame = {
    val idx = Option(idxPath).getOrElse(
      graft.core.SessionScratch.path(spark, sfDir, "graft_zstd_stream"))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    val maxId = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    val step = maxId / nBatches + 1
    (0 until nBatches).foreach { b =>
      val lo = b * step
      val hi = math.min(maxId + 1, lo + step)
      batchCounts(spark, sfDir, lo, hi)
        .write.mode("overwrite").parquet(s"$idx/b$b")
      if (b == 1)
        DeltaIndex.compact(spark, idx, upTo = 2L) { parts =>
          parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
        }
    }
    spark.read.parquet(DeltaIndex.listBatches(spark, idx): _*)
  }
}
