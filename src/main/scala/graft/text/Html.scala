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
  *    numeric-reference error table; a missing trailing `;` still
  *    decodes per the missing-semicolon rule), the case-sensitive
  *    named set below (full HTML 4.01 + apos + legacy uppercase),
  *    and the WHATWG legacy semicolonless forms (`&copy`, `&eacute`)
  *    by longest-prefix match; an unknown reference stays literal
  *    (the ambiguous-ampersand rule);
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

  /** The ISO-8859-1 entity names for code points 160..255 IN CODE
    * POINT ORDER (HTML 4.01 §24.2 / the same rows of the WHATWG
    * named-references table) — built positionally so each name's
    * value is its index's code point, not a hand-typed glyph. */
  private val Latin1Names: Seq[String] = Seq(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar",
    "sect", "uml", "copy", "ordf", "laquo", "not", "shy", "reg",
    "macr", "deg", "plusmn", "sup2", "sup3", "acute", "micro",
    "para", "middot", "cedil", "sup1", "ordm", "raquo", "frac14",
    "frac12", "frac34", "iquest", "Agrave", "Aacute", "Acirc",
    "Atilde", "Auml", "Aring", "AElig", "Ccedil", "Egrave",
    "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml",
    "times", "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml",
    "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
    "atilde", "auml", "aring", "aelig", "ccedil", "egrave",
    "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml",
    "divide", "oslash", "ugrave", "uacute", "ucirc", "uuml",
    "yacute", "thorn", "yuml")

  /** Named character references, CASE-SENSITIVE per the WHATWG table
    * (`&Aacute;` and `&aacute;` are different letters): the complete
    * HTML 4.01 set (§24.2 Latin-1, §24.3 symbols/Greek, §24.4
    * markup/i18n — the 252 names that dominate wild pages) plus
    * `apos` and the uppercase legacy aliases (AMP/LT/GT/QUOT/COPY/
    * REG/TRADE). The long WHATWG tail (MathML operators like
    * `&NotGreaterGreater;`) is out of scope — a documented fidelity
    * boundary, not an error path: unknown names stay literal.
    * `shy` (U+00AD) maps to the empty string — the training-text
    * convention drops discretionary hyphenation points. */
  private[text] val Entities: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    Latin1Names.zipWithIndex.foreach { case (n, i) =>
      b += n -> new String(Character.toChars(160 + i))
    }
    // markup-significant + i18n (HTML4 §24.4) + apos + legacy upper
    Seq("quot" -> 34, "amp" -> 38, "apos" -> 39, "lt" -> 60, "gt" -> 62,
      "QUOT" -> 34, "AMP" -> 38, "LT" -> 60, "GT" -> 62,
      "COPY" -> 169, "REG" -> 174, "TRADE" -> 8482,
      "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
      "Yuml" -> 376, "circ" -> 710, "tilde" -> 732,
      "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201,
      "zwnj" -> 8204, "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207,
      "ndash" -> 8211, "mdash" -> 8212,
      "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
      "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222,
      "dagger" -> 8224, "Dagger" -> 8225, "permil" -> 8240,
      "lsaquo" -> 8249, "rsaquo" -> 8250, "euro" -> 8364,
      // symbols + Greek (HTML4 §24.3)
      "fnof" -> 402,
      "Alpha" -> 913, "Beta" -> 914, "Gamma" -> 915, "Delta" -> 916,
      "Epsilon" -> 917, "Zeta" -> 918, "Eta" -> 919, "Theta" -> 920,
      "Iota" -> 921, "Kappa" -> 922, "Lambda" -> 923, "Mu" -> 924,
      "Nu" -> 925, "Xi" -> 926, "Omicron" -> 927, "Pi" -> 928,
      "Rho" -> 929, "Sigma" -> 931, "Tau" -> 932, "Upsilon" -> 933,
      "Phi" -> 934, "Chi" -> 935, "Psi" -> 936, "Omega" -> 937,
      "alpha" -> 945, "beta" -> 946, "gamma" -> 947, "delta" -> 948,
      "epsilon" -> 949, "zeta" -> 950, "eta" -> 951, "theta" -> 952,
      "iota" -> 953, "kappa" -> 954, "lambda" -> 955, "mu" -> 956,
      "nu" -> 957, "xi" -> 958, "omicron" -> 959, "pi" -> 960,
      "rho" -> 961, "sigmaf" -> 962, "sigma" -> 963, "tau" -> 964,
      "upsilon" -> 965, "phi" -> 966, "chi" -> 967, "psi" -> 968,
      "omega" -> 969, "thetasym" -> 977, "upsih" -> 978, "piv" -> 982,
      "bull" -> 8226, "hellip" -> 8230, "prime" -> 8242,
      "Prime" -> 8243, "oline" -> 8254, "frasl" -> 8260,
      "weierp" -> 8472, "image" -> 8465, "real" -> 8476,
      "trade" -> 8482, "alefsym" -> 8501,
      "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594, "darr" -> 8595,
      "harr" -> 8596, "crarr" -> 8629,
      "lArr" -> 8656, "uArr" -> 8657, "rArr" -> 8658, "dArr" -> 8659,
      "hArr" -> 8660,
      "forall" -> 8704, "part" -> 8706, "exist" -> 8707,
      "empty" -> 8709, "nabla" -> 8711, "isin" -> 8712,
      "notin" -> 8713, "ni" -> 8715, "prod" -> 8719, "sum" -> 8721,
      "minus" -> 8722, "lowast" -> 8727, "radic" -> 8730,
      "prop" -> 8733, "infin" -> 8734, "ang" -> 8736,
      "and" -> 8743, "or" -> 8744, "cap" -> 8745, "cup" -> 8746,
      "int" -> 8747, "there4" -> 8756, "sim" -> 8764, "cong" -> 8773,
      "asymp" -> 8776, "ne" -> 8800, "equiv" -> 8801,
      "le" -> 8804, "ge" -> 8805, "sub" -> 8834, "sup" -> 8835,
      "nsub" -> 8836, "sube" -> 8838, "supe" -> 8839,
      "oplus" -> 8853, "otimes" -> 8855, "perp" -> 8869,
      "sdot" -> 8901, "lceil" -> 8968, "rceil" -> 8969,
      "lfloor" -> 8970, "rfloor" -> 8971, "lang" -> 9001,
      "rang" -> 9002, "loz" -> 9674, "spades" -> 9824,
      "clubs" -> 9827, "hearts" -> 9829, "diams" -> 9830
    ).foreach { case (n, cp) =>
      b += n -> new String(Character.toChars(cp))
    }
    b.result() + ("shy" -> "")
  }

  /** The WHATWG legacy names that decode WITHOUT a trailing `;`
    * (the without-semicolon rows of the named-references table —
    * exactly the 96 Latin-1 names plus amp/lt/gt/quot and their
    * uppercase aliases plus COPY/REG). Matching is longest-prefix on
    * a failed strict match: in `&notit;` the legacy `not` prefix
    * decodes and `it;` stays text — the spec's "flush code points
    * consumed as a character reference" rule. */
  private[text] val Legacy: Map[String, String] =
    (Latin1Names ++ Seq("amp", "AMP", "lt", "LT", "gt", "GT",
      "quot", "QUOT", "COPY", "REG")).map(n => n -> Entities(n)).toMap

  private val LegacyMaxLen: Int = Legacy.keysIterator.map(_.length).max

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
        if (!any) { out.ch('&'); return p + 1 } // no digits: literal &
        // numeric-reference error table: NUL, out-of-range and
        // surrogate code points are replaced with U+FFFD
        val cp =
          if (v == 0 || v > 0x10ffffL || (v >= 0xd800L && v <= 0xdfffL))
            0xfffd
          else v.toInt
        out.codePoint(cp)
        // a missing ';' is a parse error but STILL DECODES per the
        // spec's missing-semicolon-after-character-reference rule
        // (only the digits are consumed)
        if (q < n && html.charAt(q) == ';') q + 1 else q
      } else {
        var q = p + 1
        while (q < n && q - p <= 32 && {
          val c = html.charAt(q)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9')
        }) q += 1
        val run = html.substring(p + 1, q)
        if (q < n && run.nonEmpty && html.charAt(q) == ';' &&
          Entities.contains(run)) {
          out.str(Entities(run)); q + 1
        } else {
          // no strict `name;` match: the longest legacy
          // (semicolonless) prefix decodes, the rest stays text —
          // `&copy2024` is "©2024", `&notit;` is "¬it;"
          var len = math.min(run.length, LegacyMaxLen)
          while (len > 0 && !Legacy.contains(run.substring(0, len))) len -= 1
          if (len > 0) { out.str(Legacy(run.substring(0, len))); p + 1 + len }
          else { out.ch('&'); p + 1 } // ambiguous ampersand
        }
      }
    }

    // scan past a tag's attributes honoring quoted values; returns
    // the index AFTER the closing '>' (or n at EOF — eof-in-tag
    // drops the partial tag, emitting nothing). A quote opens a
    // value ONLY immediately after '=' (plus optional whitespace) —
    // the before-attribute-value state; a quote anywhere else in the
    // tag is a plain character (an unquoted value like alt=world's
    // must not swallow text to the next quote)
    def tagEnd(p0: Int): Int = {
      var p = p0
      while (p < n) {
        val c = html.charAt(p)
        if (c == '>') return p + 1
        else if (c == '=') {
          p += 1
          while (p < n && (html.charAt(p) == ' ' || html.charAt(p) == '\t' ||
            html.charAt(p) == '\n' || html.charAt(p) == '\r' ||
            html.charAt(p) == '\f')) p += 1
          if (p < n && (html.charAt(p) == '"' || html.charAt(p) == '\'')) {
            val qc = html.charAt(p)
            p += 1
            while (p < n && html.charAt(p) != qc) p += 1
            if (p < n) p += 1
          }
        } else p += 1
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
