package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING COMPRESSED-CRAWL INGEST — the continuous twin of
  * [[graft.text.CompressedIngest.ingestReport]] (r13 "Next round" #7:
  * `text_gzip_ingest` was batch map-only; a real crawl tails gzip
  * members CONTINUOUSLY, so the decode step must compose with the
  * delta-log discipline end-to-end, not just as a one-shot pass).
  *
  * Two composition points:
  *
  *  - [[decoded]]: the pure streaming STAGE — (doc_id, gz, t) →
  *    (doc_id, text, t), a stateless typed map running
  *    [[graft.text.CompressedIngest.gunzip]] per row (undecodable
  *    members are DROPPED with their ids — a crawl pipeline wants
  *    quality-floor semantics, not poisoned rows). Plugs directly in
  *    front of [[StreamingCorpusPipeline.prepareStream]]; the
  *    gzip → clean → dedup → pack composition is differential-tested
  *    against the batch pipeline in GzipStreamSpec.
  *
  *  - [[ingestStream]]: the gate surface — ordered micro-batches
  *    land their decoded token/char counts as [[DeltaIndex]] batch
  *    subdirs (Hadoop FS IO, `_SUCCESS`-committed staged compaction
  *    mid-stream, same protocol as ExactStream/DriftStream/
  *    MediaStream), and the reassembled index must equal the one-shot
  *    batch report row for row — the `text_gzip_ingest_stream` oracle
  *    IS the batch twin's SQL, so a lost batch, a double-landed retry
  *    or a compaction gap all become hash mismatches.
  *
  * Scale posture: per batch one map-only gunzip pass over a
  * pushed-down doc_id range (`between` — a parquet row-group filter,
  * not a typed lambda) plus one parquet append; cross-batch state is
  * the on-disk index alone. */
object GzipStream {

  /** Stateless streaming decode stage: gunzip the binary column,
    * keep decodable rows. Column-typed on the outside (works under
    * watermarks and in the stream-to-stream composition); the
    * per-row decode is the production [[graft.text.CompressedIngest
    * .gunzip]] with its bomb guard. */
  def decoded(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("gz"), col("t"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .flatMap { case (id, gz, t) =>
        graft.text.CompressedIngest.gunzip(gz).map(b =>
          (id, new String(b, java.nio.charset.StandardCharsets.UTF_8), t))
      }
      .toDF("doc_id", "text", "t")
  }

  /** One micro-batch's (doc_id, n_tokens, n_chars) frame over the
    * doc_id range [lo, hi): gzip the fixture text (truncating the
    * id % 5 == 3 members), decode through the production path, count
    * tokens/chars of the DECODED text. */
  private[streaming] def batchCounts(spark: SparkSession, sfDir: String,
      lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .where(col("doc_id").between(lo, hi - 1))
      .as[(Long, String)]
      .map { case (id, text) =>
        val full = graft.text.CompressedIngest.gzip(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val payload = if (id % 5 == 3) full.take(full.length / 2) else full
        graft.text.CompressedIngest.gunzip(payload) match {
          case Some(bytes) =>
            val t = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            (id, t.split("\\s+").count(_.nonEmpty).toLong,
              t.codePointCount(0, t.length).toLong)
          case None => (id, -1L, -1L)
        }
      }
      .toDF("doc_id", "n_tokens", "n_chars")
  }

  /** Gate surface (`text_gzip_ingest_stream`): replay the gzip
    * fixture in `nBatches` ordered doc-range batches through the
    * delta-log, compact after the second batch commits, and emit the
    * reassembled index — which must equal the one-shot
    * `text_gzip_ingest` report (the oracle is the SAME SQL). */
  def ingestStream(spark: SparkSession, sfDir: String, nBatches: Int = 4,
      idxPath: String = null): DataFrame = {
    val idx = Option(idxPath).getOrElse(
      graft.core.SessionScratch.path(spark, sfDir, "graft_gzip_stream"))
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
