package graft.text

import graft.SparkSpec

/** The one-call crawl operator's dispatch semantics at the unit
  * level (the `text_crawl_extract` gate pins the same chain against
  * the DuckDB oracle at sf scale): transfer-decode ordering,
  * media-type routing, and the failure-honesty contract — a record
  * that fails ANY stage contributes no row. */
class CrawlExtractSpec extends SparkSpec {

  private def respond(uri: String, headers: String,
      payload: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\n$headers\r\n")
      .getBytes("US-ASCII") ++ payload
    Warc.write(Seq(
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri) -> http),
      gzipPerRecord = true)
  }

  private def extractAll(shards: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    CrawlExtract.extract(shards.toDF("doc_id", "shard")).collect()
      .map(e => (e.doc_id, e.uri, e.charset, e.text)).sortBy(_._1)
  }

  test("chunked + gzip,chunked bodies extract the same text as identity") {
    val html = "<html><body><p>alpha beta gamma</p></body></html>"
    val b = html.getBytes("UTF-8")
    val rows = extractAll(Seq(
      1L -> respond("u:1", "Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${b.length}\r\n", b),
      2L -> respond("u:2", "Content-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\n", Warc.chunked(b, 7)),
      3L -> respond("u:3", "Content-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: gzip, chunked\r\n",
        Warc.chunked(CompressedIngest.gzip(b), 5)),
      // content-coding UNDER the transfer coding: gzip body, chunked wire
      4L -> respond("u:4", "Content-Type: text/html; charset=utf-8\r\n" +
        "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        Warc.chunked(CompressedIngest.gzip(b), 11))))
    assert(rows.length === 4)
    assert(rows.map(_._4).distinct === Array("alpha beta gamma"))
  }

  test("media-type dispatch: text/plain bypasses the tokenizer; unknown declines") {
    val plain = "keep the <angle> words intact".getBytes("UTF-8")
    val rows = extractAll(Seq(
      1L -> respond("u:1", "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${plain.length}\r\n", plain),
      2L -> respond("u:2", "Content-Type: application/pdf\r\n" +
        "Content-Length: 4\r\n", "%PDF".getBytes),
      3L -> respond("u:3", "Content-Type: application/json\r\n" +
        "Content-Length: 2\r\n", "{}".getBytes),
      // parameters and case don't change the media type
      4L -> respond("u:4", "Content-Type: TEXT/HTML; charset=utf-8\r\n" +
        "Content-Length: 12\r\n", "<p>cased</p>".getBytes)))
    assert(rows.map(_._1).toSeq === Seq(1L, 4L)) // pdf/json: no row
    assert(rows(0)._4 === "keep the <angle> words intact")
    assert(rows(1)._4 === "cased")
  }

  test("failure honesty: truncated chunking or wrong coding yields no row, no lie") {
    val html = "<p>honest</p>".getBytes("UTF-8")
    val wire = Warc.chunked(html, 4)
    val rows = extractAll(Seq(
      // truncated chunked body
      1L -> respond("u:1", "Content-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n",
        java.util.Arrays.copyOf(wire, wire.length - 3)),
      // header lies: says chunked, body is not
      2L -> respond("u:2", "Content-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n", html),
      // unknown transfer coding declines
      3L -> respond("u:3", "Content-Type: text/html\r\n" +
        "Transfer-Encoding: br, chunked\r\n", Warc.chunked(html, 4)),
      // control: the same body undamaged extracts
      4L -> respond("u:4", "Content-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n", wire)))
    assert(rows.map(_._1).toSeq === Seq(4L))
    assert(rows(0)._4 === "honest")
  }
}
