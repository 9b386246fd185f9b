package graft.text

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset resolution for crawl payloads — wild-web bytes are NOT
  * UTF-8 (r15 verdict #2): a real response's encoding comes from (in
  * the WHATWG "determining the character encoding" precedence order,
  * html.spec.whatwg.org §13.2.3.2, restricted to the server-side
  * signals a batch pipeline has):
  *
  *  1. a byte-order mark — UTF-8 / UTF-16LE / UTF-16BE, authoritative
  *     over everything including the transport header;
  *  2. the `Content-Type` header's `charset` parameter;
  *  3. a `<meta charset=…>` / `<meta http-equiv=Content-Type …>`
  *     prescan over the first 1024 bytes (the spec's prescan window);
  *  4. the windows-1252 default (the spec's fallback for the en
  *     locale — NOT latin-1: bytes 0x80-0x9F are printable there).
  *
  * Labels map per the WHATWG Encoding Standard's label table
  * (encoding.spec.whatwg.org §4.2): `iso-8859-1`, `latin1`, `ascii`
  * and friends are LABELS FOR windows-1252 — a page declaring
  * iso-8859-1 and using byte 0x93 means the curly quote, not the
  * C1 control U+0093. Unknown labels fall back to the JDK's own
  * `Charset.forName` (the foreign oracle CharsetSniffSpec pins
  * against), then to windows-1252.
  *
  * Decode is TOTAL: malformed sequences become U+FFFD
  * (CodingErrorAction.REPLACE) — a training pipeline must never throw
  * on a mislabeled page. Pure function over one payload; map-only. */
object CharsetSniff {

  private val Cp1252: Charset = Charset.forName("windows-1252")

  /** WHATWG label → JDK charset for the labels that matter on the
    * wild web; every alias the Encoding Standard maps to
    * windows-1252 lands there, not on the JDK's strict latin-1. */
  private val Labels: Map[String, Charset] = {
    val m = scala.collection.mutable.Map.empty[String, Charset]
    for (l <- Seq("utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
      "unicode20utf8", "x-unicode20utf8"))
      m(l) = StandardCharsets.UTF_8
    for (l <- Seq("windows-1252", "cp1252", "x-cp1252", "ansi_x3.4-1968",
      "ascii", "us-ascii", "iso-8859-1", "iso8859-1", "iso88591",
      "iso_8859-1", "latin1", "l1", "cp819", "ibm819",
      "iso-ir-100", "csisolatin1"))
      m(l) = Cp1252
    for (l <- Seq("utf-16", "utf-16le", "ucs-2", "unicode"))
      m(l) = StandardCharsets.UTF_16LE
    m("utf-16be") = StandardCharsets.UTF_16BE
    for (l <- Seq("iso-8859-15", "iso8859-15", "latin9", "l9", "csisolatin9"))
      m(l) = Charset.forName("ISO-8859-15")
    for (l <- Seq("windows-1251", "cp1251", "x-cp1251"))
      m(l) = Charset.forName("windows-1251")
    for (l <- Seq("shift_jis", "shift-jis", "sjis", "ms_kanji", "x-sjis"))
      m(l) = Charset.forName("Shift_JIS")
    for (l <- Seq("euc-kr", "korean", "ksc_5601", "windows-949"))
      m(l) = Charset.forName("EUC-KR")
    m("gbk") = Charset.forName("GBK")
    m("big5") = Charset.forName("Big5")
    m("euc-jp") = Charset.forName("EUC-JP")
    m("koi8-r") = Charset.forName("KOI8-R")
    m.toMap
  }

  private def byLabel(label: String): Option[Charset] = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    Labels.get(l).orElse {
      try { if (Charset.isSupported(l)) Some(Charset.forName(l)) else None }
      catch { case _: IllegalArgumentException => None }
    }
  }

  /** The BOM, if present: (charset, bom length). */
  private def bom(b: Array[Byte]): Option[(Charset, Int)] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) Some((StandardCharsets.UTF_8, 3))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      Some((StandardCharsets.UTF_16BE, 2))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      Some((StandardCharsets.UTF_16LE, 2))
    else None

  /** The `charset` parameter of a Content-Type value (quoted or bare),
    * case-insensitive, per RFC 9110's media-type parameter grammar. */
  def contentTypeCharset(contentType: String): Option[String] = {
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("charset")
    if (i < 0) return None
    var p = i + 7
    while (p < lower.length && (lower.charAt(p) == ' ' ||
      lower.charAt(p) == '\t')) p += 1
    if (p >= lower.length || lower.charAt(p) != '=') return None
    p += 1
    while (p < lower.length && (lower.charAt(p) == ' ' ||
      lower.charAt(p) == '\t')) p += 1
    if (p >= lower.length) return None
    if (lower.charAt(p) == '"') {
      val e = lower.indexOf('"', p + 1)
      if (e < 0) None else Some(contentType.substring(p + 1, e))
    } else {
      var e = p
      while (e < lower.length && lower.charAt(e) != ';' &&
        lower.charAt(e) != ' ' && lower.charAt(e) != '\t') e += 1
      Some(contentType.substring(p, e))
    }
  }

  /** The WHATWG meta prescan over the first 1024 bytes: bytes are
    * ASCII-transparent for every label this table carries, so the
    * window is scanned as latin-1 (byte-identity) text. Per the
    * spec's prescan ("§13.2.3.2 determining the character encoding",
    * the "get an attribute" steps), only two shapes DECLARE an
    * encoding: a `charset` ATTRIBUTE on a meta tag, or an
    * `http-equiv=content-type` meta whose `content` attribute value
    * carries a `charset=` parameter. A `charset=` that merely occurs
    * inside some other attribute's value (a description mentioning
    * "charset=koi8-r") is NOT a declaration. First declaration wins.
    * The prescan's comment step is honored too: a `<!--` advances to
    * the first `>` preceded by `--` (so `<!-->` is a whole comment),
    * meaning a commented-out `<meta charset=…>` does NOT declare; an
    * unterminated comment runs to the end of the window. */
  def metaCharset(body: Array[Byte]): Option[String] = {
    val win = new String(body, 0, math.min(body.length, 1024),
      StandardCharsets.ISO_8859_1)
    val lower = win.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < lower.length) {
      val lt = lower.indexOf('<', i)
      if (lt < 0) return None
      if (lower.startsWith("<!--", lt)) {
        val close = lower.indexOf("-->", lt + 2)
        if (close < 0) return None
        i = close + 3
      } else if (lower.startsWith("<meta", lt)) {
        val after = lt + 5
        // a real tag: "<meta" followed by whitespace, '/' or '>'
        if (after < lower.length && (lower.charAt(after) == ' ' ||
          lower.charAt(after) == '\t' || lower.charAt(after) == '\n' ||
          lower.charAt(after) == '\r' || lower.charAt(after) == '\f' ||
          lower.charAt(after) == '/' || lower.charAt(after) == '>')) {
          val attrs = tagAttributes(lower, after)
          val declared = attrs.get("charset").filter(_.nonEmpty)
            .orElse {
              if (attrs.get("http-equiv").exists(_.trim == "content-type"))
                attrs.get("content").flatMap(contentTypeCharset)
                  .map(_.toLowerCase(java.util.Locale.ROOT))
              else None
            }
          if (declared.isDefined) return declared
        }
        i = after
      } else i = lt + 1
    }
    None
  }

  /** The spec's "get an attribute" loop over one tag's body starting
    * just past the tag name: (lowercased) name → value, FIRST
    * occurrence of a name wins, ends at the first top-level '>'.
    * Quoted values may contain '>' and whitespace; unquoted values
    * run to whitespace or '>'. */
  private def tagAttributes(lower: String, from: Int): Map[String, String] = {
    val attrs = scala.collection.mutable.Map.empty[String, String]
    val n = lower.length
    var p = from
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    while (p < n && lower.charAt(p) != '>') {
      while (p < n && (ws(lower.charAt(p)) || lower.charAt(p) == '/')) p += 1
      if (p >= n || lower.charAt(p) == '>') return attrs.toMap
      val nameStart = p
      while (p < n && !ws(lower.charAt(p)) && lower.charAt(p) != '=' &&
        lower.charAt(p) != '/' && lower.charAt(p) != '>') p += 1
      val name = lower.substring(nameStart, p)
      while (p < n && ws(lower.charAt(p))) p += 1
      var value = ""
      if (p < n && lower.charAt(p) == '=') {
        p += 1
        while (p < n && ws(lower.charAt(p))) p += 1
        if (p < n && (lower.charAt(p) == '"' || lower.charAt(p) == '\'')) {
          val q = lower.charAt(p)
          p += 1
          val vStart = p
          while (p < n && lower.charAt(p) != q) p += 1
          value = lower.substring(vStart, p)
          if (p < n) p += 1
        } else {
          val vStart = p
          while (p < n && !ws(lower.charAt(p)) && lower.charAt(p) != '>') p += 1
          value = lower.substring(vStart, p)
        }
      }
      if (name.nonEmpty && !attrs.contains(name)) attrs(name) = value
    }
    attrs.toMap
  }

  /** Resolve per the precedence order in the object doc. Returns the
    * charset plus the payload offset past any BOM. */
  def resolve(contentType: Option[String], body: Array[Byte]): (Charset, Int) =
    bom(body) match {
      case Some((cs, skip)) => (cs, skip)
      case None =>
        val cs = contentType.flatMap(contentTypeCharset).flatMap(byLabel)
          .orElse(metaCharset(body).flatMap(byLabel))
          .getOrElse(Cp1252)
        (cs, 0)
    }

  /** [[decode]] with a UTF-8 default instead of windows-1252 — for
    * PRODUCED formats (WET extracted-text records) whose convention
    * is UTF-8, as opposed to wild-web HTML bytes where the WHATWG
    * en-locale default applies. BOM and an explicit Content-Type
    * charset parameter still take precedence; no meta prescan
    * (plain text has no meta). */
  def decodeWet(contentType: Option[String], body: Array[Byte]): (String, String) = {
    val (cs, skip) = bom(body) match {
      case Some((c, s)) => (c, s)
      case None =>
        (contentType.flatMap(contentTypeCharset).flatMap(byLabel)
          .getOrElse(StandardCharsets.UTF_8), 0)
    }
    decodeWith(cs, body, skip)
  }

  /** Resolve + decode, totally (malformed sequences → U+FFFD).
    * Returns (canonical charset name, decoded text). */
  def decode(contentType: Option[String], body: Array[Byte]): (String, String) = {
    val (cs, skip) = resolve(contentType, body)
    decodeWith(cs, body, skip)
  }

  private def decodeWith(cs: Charset, body: Array[Byte],
      skip: Int): (String, String) = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(body, skip,
      body.length - skip)).toString
    (cs.name(), text)
  }
}
