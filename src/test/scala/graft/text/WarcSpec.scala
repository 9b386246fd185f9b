package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** WARC record ingest: both serializations (plain and the CommonCrawl
  * per-record-gzip shape) roundtrip, header parsing is
  * case-insensitive and Content-Length-driven, HTTP payload
  * extraction lands on the body bytes, and the parser is total under
  * truncation and garbage. */
class WarcSpec extends AnyFunSuite {

  private def fixture(text: String): Seq[(Seq[(String, String)], Array[Byte])] = {
    val body = text.getBytes("UTF-8")
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n")
      .getBytes("US-ASCII") ++ body
    Seq(
      Seq("WARC-Type" -> "warcinfo") -> "software: graft\r\n".getBytes,
      Seq("WARC-Type" -> "request",
        "WARC-Target-URI" -> "https://example.org/x") ->
        "GET /x HTTP/1.1\r\n\r\n".getBytes,
      Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.org/x") -> http)
  }

  test("plain and per-record-gzip serializations parse to the same records") {
    val recs = fixture("hello warc world éé")
    for (gz <- Seq(false, true)) {
      val got = Warc.records(Warc.write(recs, gzipPerRecord = gz))
      assert(got.isDefined, s"gz=$gz")
      assert(got.get.length === 3)
      assert(got.get.map(_.warcType) === Seq("warcinfo", "request", "response"))
      assert(got.get(2).targetUri === "https://example.org/x")
      val payload = Warc.httpPayload(got.get(2).block)
      assert(payload.isDefined)
      assert(new String(payload.get, "UTF-8") === "hello warc world éé")
    }
  }

  test("header names are case-insensitive; Content-Length drives the block") {
    // a block CONTAINING \r\n\r\n must not confuse the parser: the
    // length field, not a scan, bounds it
    val tricky = "line1\r\n\r\nline2 looks like a terminator".getBytes
    val bytes = Warc.write(Seq(
      Seq("wArC-tYpE" -> "resource") -> tricky), gzipPerRecord = false)
    val got = Warc.records(bytes)
    assert(got.isDefined && got.get.head.warcType === "resource")
    assert(got.get.head.block.toSeq === tricky.toSeq)
  }

  test("truncation at every prefix is None or a response-less prefix, never a lie") {
    val full = Warc.write(fixture("truncate me " * 20), gzipPerRecord = false)
    for (n <- 0 until full.length) {
      Warc.records(java.util.Arrays.copyOf(full, n)) match {
        case None => // malformed, fine
        case Some(recs) =>
          // a clean record-boundary cut may parse a PREFIX — it must
          // be a strict prefix (never a fabricated response record)
          assert(recs.length < 3, s"prefix $n parsed all records?")
      }
    }
    val gz = Warc.write(fixture("truncate me " * 20), gzipPerRecord = true)
    for (n <- 0 until gz.length)
      Warc.records(java.util.Arrays.copyOf(gz, n)) match {
        case None =>
        case Some(recs) => assert(recs.length < 3, s"gz prefix $n")
      }
  }

  test("UTF-8 header values, folded headers, empty Content-Length (review r15)") {
    // non-ASCII WARC-Target-URI survives (ISO 28500 headers are UTF-8)
    val uri = "https://example.org/caf\u00e9/\u00fcber"
    val bytes = Warc.write(Seq(
      Seq("WARC-Type" -> "resource", "WARC-Target-URI" -> uri) ->
        "x".getBytes), gzipPerRecord = false)
    val got = Warc.records(bytes)
    assert(got.isDefined && got.get.head.targetUri === uri)
    // a folded header (continuation line) extends the previous value
    val folded = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Foo: first part\r\n second part\r\n" +
      "Content-Length: 1\r\n\r\nZ\r\n\r\n").getBytes
    val fr = Warc.records(folded)
    assert(fr.isDefined)
    assert(fr.get.head.headers("warc-foo") === "first part second part")
    // an EMPTY Content-Length declines (was a NumberFormatException)
    assert(Warc.records(
      ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length:\r\n\r\n" +
        "\r\n\r\n").getBytes).isEmpty)
    // a folded line BEFORE any header declines
    assert(Warc.records(
      ("WARC/1.0\r\n folded first\r\nContent-Length: 0\r\n\r\n" +
        "\r\n\r\n").getBytes).isEmpty)
  }

  test("dechunk: chunked encoding is identity on the body (RFC 9112 §7.1)") {
    val body = ("chunk me please — twenty different ways φωνή " * 50)
      .getBytes("UTF-8")
    // every chunk size: same body back (exts + trailer consumed)
    for (cs <- Seq(1, 7, 97, 8192, body.length, body.length * 2)) {
      val wire = Warc.chunked(body, cs)
      assert(Warc.dechunk(wire).map(_.toSeq) === Some(body.toSeq), s"cs=$cs")
    }
    // an empty body is just the last-chunk + trailer
    assert(Warc.dechunk(Warc.chunked(Array.emptyByteArray, 8))
      .map(_.length) === Some(0))
    // chunk data may contain CRLF and bare LF — the size line, not a
    // scan, bounds it
    val tricky = "a\r\nb\nc\r\n\r\nd".getBytes("US-ASCII")
    assert(Warc.dechunk(Warc.chunked(tricky, 3)).map(_.toSeq)
      === Some(tricky.toSeq))
    // hex sizes with uppercase digits parse
    assert(Warc.dechunk(
      "A\r\n0123456789\r\n0\r\n\r\n".getBytes("US-ASCII")).map(_.toSeq)
      === Some("0123456789".getBytes.toSeq))
    // chunk-size = 1*HEXDIG: leading zeros are valid spelling (r17
    // ADVICE) — "0000000A" is ten bytes, "0000" is the last chunk, and
    // the 7-digit overflow cap applies to the STRIPPED magnitude
    assert(Warc.dechunk(
      "0000000A\r\n0123456789\r\n0000\r\n\r\n".getBytes("US-ASCII")).map(_.toSeq)
      === Some("0123456789".getBytes.toSeq))
    assert(Warc.dechunk(
      "00000000000005\r\nabcde\r\n0\r\n\r\n".getBytes("US-ASCII")).map(_.toSeq)
      === Some("abcde".getBytes.toSeq))
    // ...but a genuinely >7-hex-digit magnitude still declines
    assert(Warc.dechunk(
      "012345678\r\nxx\r\n0\r\n\r\n".getBytes("US-ASCII")).isEmpty)
  }

  test("dechunk: strict None on truncation, bad sizes, trailing garbage") {
    val wire = Warc.chunked("strict framing body".getBytes, 5)
    for (n <- 0 until wire.length)
      assert(Warc.dechunk(java.util.Arrays.copyOf(wire, n)).isEmpty,
        s"prefix $n")
    assert(Warc.dechunk("zz\r\nxx\r\n0\r\n\r\n".getBytes).isEmpty) // bad hex
    assert(Warc.dechunk("5\r\nabcdeXX0\r\n\r\n".getBytes).isEmpty) // no data CRLF
    assert(Warc.dechunk((new String(wire, "ISO-8859-1") + "junk")
      .getBytes("ISO-8859-1")).isEmpty) // trailing garbage
    assert(Warc.dechunk(Array.emptyByteArray).isEmpty)
    // bomb guard: declared sizes summing past maxLen decline
    assert(Warc.dechunk("5\r\nabcde\r\n0\r\n\r\n".getBytes, maxLen = 4).isEmpty)
  }

  test("transferDecode: coding lists reverse in application order (§6.1)") {
    val body = "the gzip-then-chunked body must dechunk FIRST".getBytes
    // sender: gzip, then chunk; reader: dechunk, then gunzip
    val wire = Warc.chunked(CompressedIngest.gzip(body), 7)
    assert(Warc.transferDecode("gzip, chunked", wire).map(_.toSeq)
      === Some(body.toSeq))
    // spacing/case-insensitivity of the list
    assert(Warc.transferDecode(" GZIP ,  Chunked ", wire).map(_.toSeq)
      === Some(body.toSeq))
    assert(Warc.transferDecode("chunked", Warc.chunked(body, 9)).map(_.toSeq)
      === Some(body.toSeq))
    assert(Warc.transferDecode("identity", body).map(_.toSeq)
      === Some(body.toSeq))
    // the WRONG order must fail (dechunking gzip bytes): never guess
    assert(Warc.transferDecode("chunked, gzip", wire).isEmpty)
    // unknown codings decline
    assert(Warc.transferDecode("br, chunked", Warc.chunked(body, 9)).isEmpty)
  }

  test("malformed shapes decline: bad version, bare LF, bad length, missing terminator") {
    assert(Warc.records("WARC/1.0\r\n".getBytes).isEmpty)
    assert(Warc.records("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.records(Array.emptyByteArray).isEmpty)
    assert(Warc.records(
      "WARC/1.0\nWARC-Type: x\n\n".getBytes).isEmpty) // bare LF
    assert(Warc.records(
      "WARC/1.0\r\nContent-Length: zz\r\n\r\n".getBytes).isEmpty)
    val good = Warc.write(fixture("x"), gzipPerRecord = false)
    val noTerm = java.util.Arrays.copyOf(good, good.length - 1)
    assert(Warc.records(noTerm).isEmpty)
    // httpPayload on a non-HTTP block
    assert(Warc.httpPayload("plain text".getBytes).isEmpty)
  }
}
