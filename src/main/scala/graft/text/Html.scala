package graft.text

/** HTML → training-text extraction — the missing center of the crawl
  * chain (r15 verdict #1): a WARC response record's payload is HTML,
  * and an LLM corpus wants the VISIBLE text — tags stripped,
  * script/style/template content dropped, block boundaries preserved
  * as newlines, character references decoded, whitespace collapsed.
  *
  * The rules implemented are the public WHATWG HTML ones that matter
  * for text extraction (html.spec.whatwg.org, "13.2 Parsing HTML
  * documents" tokenizer states + "named character references"):
  *  - tag tokenization honors quoted attribute values (a `>` inside
  *    `data-x="a>b"` does not end the tag) per the attribute-value
  *    states;
  *  - `<!--` comments run to `-->` (to EOF when unterminated — the
  *    spec's eof-in-comment parse error still emits the comment);
  *  - `<!...>` markup declarations (DOCTYPE, the HTML reading of
  *    `<![CDATA[`) and `<?...>` bogus comments run to the first `>`;
  *  - a `<` not followed by `[a-zA-Z]`, `/`, `!` or `?` is literal
  *    text (the data-state "<" rule);
  *  - raw-text elements: `script` and `style` content runs to the
  *    matching case-insensitive `</name` — nothing inside is text;
  *    `template` content is likewise dropped (it is inert DOM, never
  *    rendered) to the FIRST close tag — unlike script/style,
  *    templates can nest in real DOM parsing, a documented
  *    simplification this text extractor accepts; `title` and
  *    `textarea` are RCDATA — their content IS text with character
  *    references decoded;
  *  - character references: `&#D;` / `&#xH;` numeric forms (out-of-
  *    range, surrogate and NUL code points → U+FFFD per the spec's
  *    numeric-reference error table) and the core named set below;
  *    an unknown or unterminated reference stays literal (the
  *    ambiguous-ampersand rule);
  *  - block-level elements (p, div, li, tr, h1-h6, br, …) contribute
  *    line boundaries; inline elements (a, b, span, em, …) contribute
  *    nothing — the CSS initial display values the spec's rendering
  *    section assigns.
  *
  * Canonical output: per-line whitespace runs collapse to one space
  * (U+00A0 from `&nbsp;` is normalized to a plain space first — the
  * training-text convention), lines are trimmed, empty lines drop,
  * lines join with `\n`. None (malformedness) ONLY for an
  * unterminated raw-text element: an unclosed `<script>` swallows the
  * remainder of the document, so no honest text can be produced —
  * every other soup degrades gracefully per the spec's error rules.
  *
  * Foreign pin: HtmlSpec runs the SAME documents through the JDK's
  * own independent HTML parser (`javax.swing.text.html.parser
  * .ParserDelegator`, the HTMLEditorKit engine) and compares the
  * extracted token streams — the ImageIO differential strategy
  * applied to text.
  *
  * Scale posture: pure function over one string — map-only over the
  * payload column, no shuffle, embarrassingly parallel. */
object Html {

  /** Elements whose content is dropped wholesale (raw-text or inert). */
  private val Dropped = Set("script", "style", "template")

  /** RCDATA elements: content is text, references decode, tags inside
    * are literal until the matching close tag. */
  private val Rcdata = Set("title", "textarea")

  /** Elements whose open OR close tag is a line boundary (block-level
    * initial display per the WHATWG rendering section, plus br/hr). */
  private val Block = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "section", "article", "aside", "header", "footer", "nav", "main",
    "figure", "figcaption", "form", "fieldset", "legend", "address",
    "details", "summary", "body", "html", "head")

  /** Core named character references (WHATWG named-references table,
    * the entries that dominate wild pages; all require the trailing
    * `;` here — the legacy semicolonless forms are not accepted). */
  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "hellip" -> "…",
    "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "middot" -> "·",
    "sect" -> "§", "para" -> "¶", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "frac12" -> "½", "frac14" -> "¼", "sup2" -> "²",
    "sup3" -> "³", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "szlig" -> "ß",
    "aelig" -> "æ", "oslash" -> "ø", "aring" -> "å",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê",
    "euml" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "iuml" -> "ï", "ntilde" -> "ñ", "ograve" -> "ò",
    "oacute" -> "ó", "ocirc" -> "ô", "otilde" -> "õ",
    "ouml" -> "ö", "ugrave" -> "ù", "uacute" -> "ú",
    "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
    "bull" -> "•", "dagger" -> "†", "prime" -> "′",
    "minus" -> "−", "shy" -> "")

  /** Event sink for [[walk]] — the tokenizer core feeds visible text,
    * line boundaries and (non-raw-text) tag open/close events; the
    * consumers differ only in what they accumulate ([[extractText]]
    * builds one buffer; [[Boilerplate]] builds per-block records with
    * link-char accounting). */
  private[text] trait Sink {
    def ch(c: Char): Unit
    def codePoint(cp: Int): Unit
    def str(s: String): Unit
    def boundary(): Unit
    def open(name: String): Unit = ()
    def close(name: String): Unit = ()
  }

  /** Extract visible text. None ONLY on an unterminated raw-text
    * element (see object doc); every other malformation degrades per
    * the WHATWG error rules. */
  def extractText(html: String): Option[String] = {
    val out = new java.lang.StringBuilder(math.min(html.length, 1 << 16))
    val sink = new Sink {
      def ch(c: Char): Unit = out.append(c)
      def codePoint(cp: Int): Unit = out.appendCodePoint(cp)
      def str(s: String): Unit = out.append(s)
      def boundary(): Unit = out.append('\n')
    }
    if (walk(html, sink)) Some(canonical(out.toString)) else None
  }

  /** The tokenizer core; false on the one malformed shape (an
    * unterminated raw-text element). */
  private[text] def walk(html: String, out: Sink): Boolean = {
    val n = html.length
    var i = 0
    var malformed = false

    // emit a line boundary (canonicalized by the consumer)
    def boundary(): Unit = out.boundary()

    // decode one character reference starting at `&` (index p);
    // returns the index AFTER the reference, appending its value —
    // or appends the literal '&' and returns p+1 when not a reference
    def reference(p: Int): Int = {
      if (p + 1 >= n) { out.ch('&'); return p + 1 }
      if (html.charAt(p + 1) == '#') {
        val hex = p + 2 < n &&
          (html.charAt(p + 2) == 'x' || html.charAt(p + 2) == 'X')
        var q = if (hex) p + 3 else p + 2
        var v = 0L
        var any = false
        while (q < n && {
          val c = html.charAt(q)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
            else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
            else -1
          // consume EVERY digit even once overflowed (the spec reads
          // the whole reference, then the error table maps it to
          // U+FFFD) — the cap just keeps v from wrapping
          if (d >= 0) {
            if (v <= 0x10ffffL) v = v * (if (hex) 16 else 10) + d
            any = true; true
          } else false
        }) q += 1
        if (!any || q >= n || html.charAt(q) != ';') {
          out.ch('&'); return p + 1 // not a reference: literal &
        }
        // numeric-reference error table: NUL, out-of-range and
        // surrogate code points are replaced with U+FFFD
        val cp =
          if (v == 0 || v > 0x10ffffL || (v >= 0xd800L && v <= 0xdfffL))
            0xfffd
          else v.toInt
        out.codePoint(cp)
        q + 1
      } else {
        var q = p + 1
        while (q < n && q - p <= 32 && {
          val c = html.charAt(q)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9')
        }) q += 1
        if (q < n && q > p + 1 && html.charAt(q) == ';')
          Named.get(html.substring(p + 1, q).toLowerCase(java.util.Locale.ROOT)) match {
            case Some(s) => out.str(s); q + 1
            case None => out.ch('&'); p + 1 // ambiguous ampersand
          }
        else { out.ch('&'); p + 1 }
      }
    }

    // scan past a tag's attributes honoring quoted values; returns
    // the index AFTER the closing '>' (or n at EOF — eof-in-tag
    // drops the partial tag, emitting nothing)
    def tagEnd(p0: Int): Int = {
      var p = p0
      while (p < n) {
        val c = html.charAt(p)
        if (c == '"' || c == '\'') {
          p += 1
          while (p < n && html.charAt(p) != c) p += 1
          if (p < n) p += 1
        } else if (c == '>') return p + 1
        else p += 1
      }
      n
    }

    // find `</name` (case-insensitive) at or after p; returns the
    // index of its '<', or -1
    def closeTagAt(p0: Int, name: String): Int = {
      var p = p0
      val limit = n - name.length - 2
      while (p <= limit) {
        if (html.charAt(p) == '<' && html.charAt(p + 1) == '/' &&
          html.regionMatches(true, p + 2, name, 0, name.length)) {
          val after = p + 2 + name.length
          if (after >= n || html.charAt(after) == '>' ||
            html.charAt(after) == ' ' || html.charAt(after) == '\t' ||
            html.charAt(after) == '\n' || html.charAt(after) == '\r' ||
            html.charAt(after) == '/')
            return p
        }
        p += 1
      }
      -1
    }

    while (i < n && !malformed) {
      val c = html.charAt(i)
      if (c == '&') i = reference(i)
      else if (c != '<') { out.ch(c); i += 1 }
      else if (i + 1 >= n) { out.ch('<'); i += 1 }
      else {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          if (html.regionMatches(false, i + 2, "--", 0, 2)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3 // eof-in-comment: to EOF
          } else {
            // DOCTYPE / CDATA-as-bogus-markup: to the first '>'
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          val e = html.indexOf('>', i + 2) // bogus comment
          i = if (e < 0) n else e + 1
        } else if (c1 == '/' || (c1 >= 'a' && c1 <= 'z') ||
          (c1 >= 'A' && c1 <= 'Z')) {
          val nameStart = if (c1 == '/') i + 2 else i + 1
          var q = nameStart
          while (q < n && {
            val ch = html.charAt(q)
            (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
              (ch >= '0' && ch <= '9')
          }) q += 1
          val name = html.substring(nameStart, q).toLowerCase(java.util.Locale.ROOT)
          if (c1 == '/' && name.isEmpty) {
            // "</>" / "</ " — bogus comment per the spec
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          } else {
            val afterTag = tagEnd(q)
            if (c1 != '/' && Dropped.contains(name)) {
              // raw-text: nothing inside is text; unterminated = the
              // rest of the document is swallowed → malformed
              val close = closeTagAt(afterTag, name)
              if (close < 0) malformed = true
              else { boundary(); i = tagEnd(close + 2 + name.length) }
            } else if (c1 != '/' && Rcdata.contains(name)) {
              val close = closeTagAt(afterTag, name)
              if (close < 0) malformed = true
              else {
                boundary()
                var p = afterTag
                while (p < close)
                  if (html.charAt(p) == '&') p = reference(p)
                  else { out.ch(html.charAt(p)); p += 1 }
                boundary()
                i = tagEnd(close + 2 + name.length)
              }
            } else {
              if (Block.contains(name)) boundary()
              if (c1 == '/') out.close(name) else out.open(name)
              i = afterTag
            }
          }
        } else { out.ch('<'); i += 1 } // literal "<" (data state)
      }
    }
    !malformed
  }

  /** Canonical whitespace: U+00A0 → space, per-line `\s+` collapse,
    * trim, drop empties, join with `\n`. */
  private[text] def canonical(raw: String): String =
    raw.replace('\u00a0', ' ')
      .split('\n')
      .map(_.replaceAll("\\s+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
}
