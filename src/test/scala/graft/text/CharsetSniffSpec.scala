package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{Charset, StandardCharsets}

/** Charset resolution: WHATWG precedence (BOM > header > meta >
  * windows-1252 default), the Encoding Standard's label table
  * (iso-8859-1 IS windows-1252 on the web), total decode — pinned
  * against the JDK's own Charset machinery as the foreign decoder. */
class CharsetSniffSpec extends AnyFunSuite {

  private val Cp1252 = Charset.forName("windows-1252")

  test("Content-Type charset parameter: bare, quoted, spaced, cased") {
    assert(CharsetSniff.contentTypeCharset("text/html; charset=utf-8")
      === Some("utf-8"))
    assert(CharsetSniff.contentTypeCharset("text/html; CHARSET=\"UTF-8\"")
      === Some("UTF-8"))
    assert(CharsetSniff.contentTypeCharset("text/html;charset = iso-8859-1 ; x=y")
      === Some("iso-8859-1"))
    assert(CharsetSniff.contentTypeCharset("text/html") === None)
  }

  test("meta prescan: charset=, http-equiv form, and the 1024-byte window") {
    assert(CharsetSniff.metaCharset(
      "<html><head><meta charset=\"utf-8\"></head>".getBytes) === Some("utf-8"))
    assert(CharsetSniff.metaCharset(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=windows-1251\">").getBytes) === Some("windows-1251"))
    // a declaration past the 1024-byte prescan window is not seen
    val late = ("<!--" + "x" * 1100 + "--><meta charset=utf-8>").getBytes
    assert(CharsetSniff.metaCharset(late) === None)
  }

  test("meta prescan honors only real declarations (charset attr / http-equiv)") {
    // a charset= inside a DESCRIPTION meta's content value is not a
    // declaration (the WHATWG prescan's attribute rules)
    assert(CharsetSniff.metaCharset(
      """<meta name="description" content="pages where charset=koi8-r appears">"""
        .getBytes) === None)
    // ...and must not shadow the real declaration after it
    assert(CharsetSniff.metaCharset(
      ("""<meta name="description" content="about charset=koi8-r">""" +
        """<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">""")
        .getBytes) === Some("iso-8859-1"))
    // a content="...charset=..." WITHOUT http-equiv=content-type is inert
    assert(CharsetSniff.metaCharset(
      """<meta content="text/html; charset=utf-16">""".getBytes) === None)
    // unquoted + self-closing + single-quoted forms all parse (in
    // the unquoted form the spec's value scan runs to whitespace or
    // '>', so the self-closing slash needs the usual space)
    assert(CharsetSniff.metaCharset(
      "<meta charset=utf-8 />".getBytes) === Some("utf-8"))
    assert(CharsetSniff.metaCharset(
      "<meta charset='shift_jis'>".getBytes) === Some("shift_jis"))
    // "<metadata" is not a meta tag
    assert(CharsetSniff.metaCharset(
      "<metadata charset=utf-8>".getBytes) === None)
  }

  test("meta prescan skips markup comments (WHATWG prescan comment step)") {
    // a commented-out declaration is NOT a declaration (r17 ADVICE)
    assert(CharsetSniff.metaCharset(
      "<!-- <meta charset=utf-16be> -->".getBytes) === None)
    // ...and must not shadow the real declaration after the comment
    assert(CharsetSniff.metaCharset(
      "<!-- <meta charset=utf-16be> --><meta charset=utf-8>".getBytes)
      === Some("utf-8"))
    // the spec's close scan accepts a '>' preceded by '--' even when
    // the dashes overlap the opener: "<!-->" is a complete comment
    assert(CharsetSniff.metaCharset(
      "<!--><meta charset=utf-8>".getBytes) === Some("utf-8"))
    // an unterminated comment swallows the rest of the window
    assert(CharsetSniff.metaCharset(
      "<!-- unterminated <meta charset=utf-8>".getBytes) === None)
    // a comment INSIDE a quoted attribute value is not a comment —
    // attribute parsing already owns the tag body
    assert(CharsetSniff.metaCharset(
      "<meta charset=\"utf-8\" data-x=\"<!--\">".getBytes) === Some("utf-8"))
  }

  test("precedence: BOM > header > meta > windows-1252 default") {
    val utf8Bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    // BOM wins over a lying header
    val (cs1, _) = CharsetSniff.resolve(Some("text/html; charset=iso-8859-1"),
      utf8Bom ++ "x".getBytes)
    assert(cs1 === StandardCharsets.UTF_8)
    // header wins over a lying meta
    val (cs2, _) = CharsetSniff.resolve(Some("text/html; charset=windows-1252"),
      "<meta charset=\"utf-8\">".getBytes)
    assert(cs2 === Cp1252)
    // meta wins when the header is silent
    val (cs3, _) = CharsetSniff.resolve(Some("text/html"),
      "<meta charset=\"utf-8\">x".getBytes)
    assert(cs3 === StandardCharsets.UTF_8)
    // nothing declared → windows-1252 (the spec's en default)
    val (cs4, _) = CharsetSniff.resolve(None, "plain".getBytes)
    assert(cs4 === Cp1252)
  }

  test("WHATWG labels: iso-8859-1/latin1/ascii are windows-1252 on the web") {
    // byte 0x93 is the curly left quote in cp1252, a C1 control in
    // strict latin-1 — the web meaning is the quote
    val body = Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte)
    for (label <- Seq("iso-8859-1", "latin1", "ascii", "us-ascii", "windows-1252")) {
      val (name, text) = CharsetSniff.decode(
        Some(s"text/html; charset=$label"), body)
      assert(name === "windows-1252", s"label $label")
      assert(text === "“hi”", s"label $label")
    }
  }

  test("UTF-16 BOMs resolve and strip") {
    val le = Array[Byte](0xff.toByte, 0xfe.toByte, 'h', 0, 'i', 0)
    assert(CharsetSniff.decode(None, le)._2 === "hi")
    val be = Array[Byte](0xfe.toByte, 0xff.toByte, 0, 'h', 0, 'i')
    assert(CharsetSniff.decode(None, be)._2 === "hi")
  }

  test("decode is total: malformed sequences become U+FFFD, never throw") {
    // invalid utf-8 continuation
    val bad = Array[Byte](0xe2.toByte, 0x28.toByte, 0xa1.toByte)
    val (_, text) = CharsetSniff.decode(Some("text/html; charset=utf-8"), bad)
    assert(text.contains('�'))
    // empty payload
    assert(CharsetSniff.decode(None, Array.empty[Byte])._2 === "")
  }

  test("FOREIGN PIN: resolution + decode agree with the JDK charset engine") {
    // for every class the engine claims, re-decode through the JDK's
    // own new String(bytes, charset) and compare char-for-char
    val samples = Seq(
      ("utf-8", "Gräft ✓ 你好".getBytes(StandardCharsets.UTF_8),
        StandardCharsets.UTF_8),
      ("windows-1252", "€dition — “quoted”".getBytes(Cp1252), Cp1252),
      ("iso-8859-15", "œuvre ž".getBytes(Charset.forName("ISO-8859-15")),
        Charset.forName("ISO-8859-15")),
      ("koi8-r", "привет".getBytes(Charset.forName("KOI8-R")),
        Charset.forName("KOI8-R")))
    for ((label, bytes, jdkCs) <- samples) {
      val (_, ours) = CharsetSniff.decode(Some(s"text/html; charset=$label"), bytes)
      assert(ours === new String(bytes, jdkCs), s"label $label")
    }
  }

  test("unknown labels fall through Charset.forName, then to cp1252") {
    // a label the table misses but the JDK knows
    val (n1, _) = CharsetSniff.decode(Some("text/html; charset=ibm866"),
      "x".getBytes)
    assert(n1.toLowerCase.contains("866"))
    // garbage label → the default
    val (n2, _) = CharsetSniff.decode(Some("text/html; charset=no-such-cs"),
      "x".getBytes)
    assert(n2 === "windows-1252")
  }
}
