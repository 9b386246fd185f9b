package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale rehearsal for the one-call crawl chain (the BENCH_NOTES
  * 133×-rehearsal treatment applied to [[graft.text.CrawlExtract]]):
  * synthesize SHARDS-many multi-record `.warc.gz` shards of
  * RECORDS-many response records each — body classes cycling
  * charset (utf-8/cp1252/BOM), Content-Encoding (identity/gzip/
  * zstd), Transfer-Encoding (none/chunked/gzip-then-chunked) and
  * media type (html/plain) like the gate fixture — and measure the
  * full shard → member-split → WARC → de-chunk → content-decode →
  * charset → dispatch → text extraction as docs/s and compressed
  * MB/s. Map-only by construction, so throughput scales with cores
  * and the number here is per-32-cores; a 1000-executor cluster
  * multiplies. Not a gate; not registered.
  *
  * Usage: runMain graft.tools.CrawlScaleProbe [shards] [recsPerShard]
  * (defaults 2000 × 25 = 50 000 response records ≈ 10× the sf0.1
  * documents table). */
object CrawlScaleProbe {
  def main(args: Array[String]): Unit = {
    val shards = if (args.length > 0) args(0).toInt else 2000
    val recs = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = Array("crawl", "shard", "record", "payload", "charset",
      "chunk", "token", "stream", "window", "batch", "the", "a", "of")
    def shardBytes(sid: Long): Array[Byte] = {
      val rnd = new scala.util.Random(sid * 2654435761L)
      val entries = (0 until recs).map { r =>
        val id = sid * recs + r
        val text = Seq.fill(40 + rnd.nextInt(160))(
          vocab(rnd.nextInt(vocab.length))).mkString(" ")
        val http = (id % 7) match {
          case 5 =>
            val body = (text + " plain <tag> kept").getBytes("UTF-8")
            (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
          case _ => graft.text.HtmlIngest.httpResponse(id, text)
        }
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"https://example.org/p/$id",
          "WARC-Record-ID" -> s"<urn:uuid:$id>") -> http
      }
      graft.text.Warc.write(entries, gzipPerRecord = true)
    }

    val df = spark.range(shards)
      .select($"id".as("doc_id"))
      .as[Long]
      .map(sid => (sid, shardBytes(sid)))
      .toDF("doc_id", "shard")
      .localCheckpoint() // build cost excluded from the timed pass
    val totalBytes = df.selectExpr("sum(length(shard))").head().getLong(0)

    val t0 = System.nanoTime()
    val out = graft.text.CrawlExtract.extract(df)
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[crawl-scale] shards=$shards recs=$recs docs_out=$n " +
      f"compressed_mb=${totalBytes / 1e6}%.1f wall=$secs%.2f s " +
      f"docs_per_s=${n / secs}%.0f mb_per_s=${totalBytes / 1e6 / secs}%.1f " +
      f"(local[$cpus])")
    spark.stop()
  }
}
