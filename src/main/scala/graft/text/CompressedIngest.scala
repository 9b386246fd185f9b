package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** COMPRESSED-CRAWL TEXT INGESTION — real corpora arrive as
  * gzip members (WARC/WET slices, per-document blobs), not loose
  * UTF-8: the decode step that turns a binary crawl column into the
  * text column every operator downstream consumes. Pure JVM
  * (`java.util.zip.GZIPInputStream` — RFC 1952 header/CRC handling
  * included), map-only, and TOTAL: any malformed, truncated or
  * oversized stream returns None and the row takes the documented
  * fallback instead of throwing mid-pipeline (the media decoders'
  * honesty contract applied to text).
  *
  * Scale posture: decode is embarrassingly parallel over the binary
  * column (one pass, no shuffle); the [[MaxBytes]] ceiling bounds
  * per-task memory against decompression bombs — a 64 MiB document
  * is already far past every downstream operator's contract. */
object CompressedIngest {

  /** Per-document decompressed ceiling (decompression-bomb guard). */
  val MaxBytes: Int = 64 * 1024 * 1024

  /** Decompress one gzip member stream; None on anything malformed,
    * truncated, non-gzip, or larger than `maxLen`. */
  def gunzip(b: Array[Byte], maxLen: Int = MaxBytes): Option[Array[Byte]] = {
    // try/finally around the stream: GZIPInputStream holds a native
    // zlib Inflater, and the malformed-stream path (an exception out
    // of read) is HOT on a real crawl — leaking it until finalization
    // builds native memory pressure on executors decoding millions of
    // bad members (ADVICE r13)
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 3, 4096))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > maxLen) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.io.IOException | _: RuntimeException |
        _: ArrayIndexOutOfBoundsException => None
    } finally {
      if (in != null) try in.close() catch { case _: java.io.IOException => }
    }
  }

  /** The matching writer (fixture side): one RFC 1952 member via
    * `GZIPOutputStream` — byte layout is the JDK's, but the GATE
    * never depends on the compressed bytes, only on decode(encode(x))
    * == x, which RFC 1952 guarantees for any conforming pair. */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b)
    gz.close()
    out.toByteArray
  }

  /** Gate surface (`text_gzip_ingest`): per document, gzip the text
    * (rows with doc_id % 5 == 3 get a TRUNCATED member — half the
    * compressed bytes), decode through the production path, and
    * report the token/char counts of the DECODED text — the
    * `text_tokens` definitions, so the oracle recomputes them from
    * the plain `text` column and a wrong decode (or a fallback that
    * should have fired) hash-mismatches. Undecodable rows owe
    * (-1, -1). Map-only over documents. */
  def ingestReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val full = gzip(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val payload = if (id % 5 == 3) full.take(full.length / 2) else full
        gunzip(payload) match {
          case Some(bytes) =>
            val t = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            val nTokens = t.split("\\s+").count(_.nonEmpty).toLong
            // codepoint count == DuckDB's character length even
            // beyond the BMP (UTF-16 .length would diverge there)
            (id, nTokens, t.codePointCount(0, t.length).toLong)
          case None => (id, -1L, -1L)
        }
      }
      .toDF("doc_id", "n_tokens", "n_chars")
  }
}
