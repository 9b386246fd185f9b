package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.{Charset, StandardCharsets}

/** Gate surfaces for the crawl-text chain's top half: HTML → text
  * extraction ([[Html]]) and the warc → charset → html → text
  * end-to-end composition ([[CharsetSniff]] + [[Warc]] + [[Html]]).
  * Both are map-only over the documents scan — the planted HTML is
  * deterministic per doc_id, so the DuckDB oracle recomputes every
  * reported number from the plain `text` column plus per-class
  * constants, and a wrong parse, wrong charset, or wrong entity
  * decode hash-mismatches. */
object HtmlIngest {

  /** Plant a deterministic HTML page around a document body. The
    * extracted text of every well-formed class is exactly
    * `Doc {id}\nDoc {id}\n{text}\nend of doc` — so the oracle owes
    * tokens(text) + 7 and chars(text) + 2*len("Doc {id}") + 13. */
  private[text] def plant(id: Long, text: String): String = {
    val ent = id % 7 == 1 // entity class: body letters as char refs
    val soup = id % 7 == 4 // comment/CDATA/bogus-comment class
    val bad = id % 5 == 3 // malformed: unterminated raw-text element
    val body =
      if (ent) text.flatMap {
        case 'e' => "&#101;"
        case 'a' => "&#x61;"
        case 'o' => "&#111;"
        case c => c.toString
      } else escape(text)
    // the entity class's footer additionally exercises the WHATWG
    // LEGACY forms: semicolonless named refs (&copy &AMP &eacute —
    // case-sensitive, uppercase alias included) and a semicolonless
    // NUMERIC ref (&#233 terminated by '<'), decoding to the fixed
    // suffix " © & é é" the oracle owes as a per-class constant
    val footer =
      if (ent) "end&nbsp;of&nbsp;doc &copy &AMP &eacute &#233"
      else "end of doc"
    val soupBits =
      if (soup) "<!--<p>ghost comment</p>--><![CDATA[ghost cdata]]><?php ghost ?>"
      else ""
    val tail =
      if (bad) "<script>var ghost = 1;" // swallows the rest: None
      else ""
    s"""<!DOCTYPE html><html><head><title>Doc $id</title>""" +
      s"""<style type="text/css">p{color:#333;}</style>""" +
      s"""<script type="text/javascript">if(1<2){document.write("<p>ghost</p>");}</script>""" +
      s"""</head><body><h1>Doc $id</h1>$soupBits<p>$body</p>""" +
      s"""<div class="footer" data-x="a>b">$footer</div>$tail</body></html>"""
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def counts(t: String): (Long, Long) =
    (t.split("\\s+").count(_.nonEmpty).toLong,
      t.codePointCount(0, t.length).toLong)

  /** Gate surface (`text_html_extract`): per document, plant the
    * class-determined HTML page and run [[Html.extractText]]. Classes:
    * id % 7 == 1 entity-encodes body letters (&#101;/&#x61;/&#111;)
    * and the footer's spaces (&nbsp;); id % 7 == 4 injects comment +
    * CDATA + bogus-comment soup; id % 5 == 3 plants an unterminated
    * `<script>` and owes the (-1, -1) fallback. Every well-formed
    * class extracts to the same text, so the oracle recomputes both
    * counts from the plain column. Map-only. */
  def htmlExtractReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        Html.extractText(plant(id, text)) match {
          case Some(t) =>
            val (tok, ch) = counts(t)
            (id, tok, ch)
          case None => (id, -1L, -1L)
        }
      }
      .toDF("doc_id", "n_tokens", "n_chars")
  }

  // ── warc → charset → html → text, end to end ─────────────────────

  /** Per-class titles: each carries code points that DISTINGUISH the
    * class's correct decode from every plausible wrong one (a cp1252
    * byte 0x80 read as latin-1 or UTF-8 changes the code-point sum). */
  private[text] val Titles = Array(
    "Graft UTF-8 ✓", // cls 0: utf-8, charset in the HTTP header
    "Graft €dition — cp1252", // cls 1: cp1252 header beats a LYING meta
    "Café à la crawl", // cls 2: iso-8859-1 label in META only → cp1252
    "Graft BOM ✔") // cls 3: UTF-8 BOM beats a lying header

  private val Cp1252 = Charset.forName("windows-1252")

  /** Build the class-determined HTTP response bytes (header + HTML in
    * the class charset). Returns (http message bytes). */
  private[graft] def httpResponse(id: Long, text: String): Array[Byte] = {
    val cls = (id % 4).toInt
    val title = Titles(cls)
    val meta = cls match {
      case 1 => """<meta charset="utf-8">""" // lies; the header wins
      case 2 =>
        // the DECOY comes first: a charset= inside a description
        // value is NOT a declaration (WHATWG prescan honors only the
        // charset attribute / http-equiv=content-type) — a prescan
        // that greps any "charset=" resolves koi8-r and mismatches
        """<meta name="description" content="a page where charset=koi8-r is discussed">""" +
          """<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">"""
      case _ => ""
    }
    val html =
      s"""<!DOCTYPE html><html><head>$meta<title>$title</title>""" +
        s"""<style>body{margin:0;}</style></head><body><p>${escape(text)}</p>""" +
        s"""<div>end of doc</div></body></html>"""
    val enc: Charset = cls match {
      case 1 | 2 => Cp1252 // cls 2's latin-1 bytes ≡ cp1252 on its title
      case _ => StandardCharsets.UTF_8
    }
    val bodyBytes0 = html.getBytes(enc)
    val bodyBytes =
      if (cls == 3) Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        bodyBytes0
      else bodyBytes0
    val ctype = cls match {
      case 0 => "text/html; charset=utf-8"
      case 1 => "text/html; charset=windows-1252"
      case 2 => "text/html" // meta prescan must find it
      case 3 => "text/html; charset=iso-8859-1" // lies; the BOM wins
    }
    // transfer-compression class (orthogonal to the charset class):
    // real crawls gzip their HTML — id % 3 == 1 ships the body
    // gzipped, id % 3 == 2 zstd, with the Content-Encoding header
    // naming the coding (RFC 9110); the BOM/meta/charset signals all
    // sit INSIDE the coded bytes, so decode order matters and a
    // wrong order hash-mismatches
    val (wireBytes, cenc) = (id % 3) match {
      case 1 => (CompressedIngest.gzip(bodyBytes), Some("gzip"))
      case 2 => (Zstd.compress(bodyBytes), Some("zstd"))
      case _ => (bodyBytes, None)
    }
    // transfer-coding class (r16 verdict #1, orthogonal again): the
    // body AS STORED may be chunked (RFC 9112 §7.1) — id % 7 == 2
    // plain-chunked, id % 7 == 3 "gzip, chunked" (sender gzips THEN
    // chunks, so the reader must dechunk FIRST — §6.1 order); both
    // wrap OUTSIDE the Content-Encoding layer, and per §6.2 a
    // chunked message carries no Content-Length header
    val (storedBytes, tenc) = (id % 7) match {
      case 2 => (Warc.chunked(wireBytes, 97), Some("chunked"))
      case 3 => (Warc.chunked(CompressedIngest.gzip(wireBytes), 61),
        Some("gzip, chunked"))
      case _ => (wireBytes, None)
    }
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      cenc.map(e => s"Content-Encoding: $e\r\n").getOrElse("") +
      tenc.map(e => s"Transfer-Encoding: $e\r\n")
        .getOrElse(s"Content-Length: ${storedBytes.length}\r\n") +
      "\r\n").getBytes(StandardCharsets.US_ASCII) ++ storedBytes
  }

  /** Gate surface (`text_warc_html`): per document, a real 3-record
    * WARC whose response payload is an HTML page in a class-determined
    * charset (utf-8 / cp1252 / meta-only iso-8859-1 label behind a
    * charset= DECOY in a description meta / BOM — including
    * deliberately LYING signals that the WHATWG precedence order
    * must overrule), body content-coded per an orthogonal class
    * (id % 3: identity / gzip / zstd with the Content-Encoding
    * header naming the coding) and transfer-coded per another
    * (id % 7: plain / chunked / gzip-then-chunked with the
    * Transfer-Encoding header naming them in application order),
    * per-record-gzip on even ids; extract through records →
    * httpHeader(Transfer-Encoding) → transferDecode →
    * httpHeader(Content-Encoding) → contentDecode →
    * httpHeader(Content-Type) → CharsetSniff.decode →
    * Html.extractText and report the resolved charset name, the
    * title's code-point sum (pins the decode char-for-char) and the
    * token/char counts. Truncated slices (id % 5 == 3) owe the
    * (-1, "", -1, -1, -1) fallback. Map-only. */
  def warcHtmlReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val http = httpResponse(id, text)
        val full = Warc.write(Seq(
          Seq("WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"<urn:uuid:$id-info>") ->
            "software: graft\r\n".getBytes,
          Seq("WARC-Type" -> "request",
            "WARC-Target-URI" -> s"https://example.org/page/$id",
            "WARC-Record-ID" -> s"<urn:uuid:$id-req>") ->
            s"GET /page/$id HTTP/1.1\r\nHost: example.org\r\n\r\n".getBytes,
          Seq("WARC-Type" -> "response",
            "WARC-Target-URI" -> s"https://example.org/page/$id",
            "WARC-Record-ID" -> s"<urn:uuid:$id-resp>") -> http),
          gzipPerRecord = id % 2 == 0)
        val payload = if (id % 5 == 3) full.take(full.length / 2) else full
        (for {
          recs <- Warc.records(payload)
          resp <- recs.find(_.warcType == "response")
          wire <- Warc.httpPayload(resp.block)
          // transfer-coding first (RFC 9112 — chunked is message
          // framing), content-coding second (RFC 9110), charset
          // last: the BOM/meta signals live inside the coded bytes
          unframed <- Warc.httpHeader(resp.block, "Transfer-Encoding") match {
            case Some(te) => Warc.transferDecode(te, wire)
            case None => Some(wire)
          }
          body <- Warc.httpHeader(resp.block, "Content-Encoding") match {
            case Some(e) => CompressedIngest.contentDecode(e, unframed)
            case None => Some(unframed)
          }
          ctype = Warc.httpHeader(resp.block, "Content-Type")
          (csName, decoded) = CharsetSniff.decode(ctype, body)
          t <- Html.extractText(decoded)
        } yield {
          val (tok, ch) = counts(t)
          val firstLine = t.takeWhile(_ != '\n')
          val cpSum = firstLine.codePoints().asLongStream().sum()
          (id, csName, cpSum, tok, ch)
        }).getOrElse((id, "", -1L, -1L, -1L))
      }
      .toDF("doc_id", "charset", "head_cp_sum", "n_tokens", "n_chars")
  }
}
