package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Boilerplate removal — the step between "visible text" and
  * "training text": a real page's visible text is main content PLUS
  * navigation, footers, share bars and link farms, and shipping those
  * into a corpus is how models learn to emit "home | about | contact".
  * The public heuristics (jusText, Kohlschütter et al.'s boilerpipe)
  * classify BLOCKS by link density and length; this implements the
  * deterministic core of that family:
  *
  *  - the page is segmented into blocks at [[Html]]'s block-level
  *    boundaries (one `Sink` pass — same tokenizer, no second parser);
  *  - per block, visible characters and LINK characters (those
  *    emitted inside an `<a>` element) are counted on the raw
  *    pre-collapse text;
  *  - a block is boilerplate when its link density
  *    (linkChars / chars) exceeds [[MaxLinkDensity]], or when it is
  *    SHORT (< [[MinShortChars]] canonical chars) and contains any
  *    link text at all (share bars, "read more" stubs);
  *  - jusText's second axis (r16 verdict #4): a block BELOW
  *    [[LengthLow]] canonical chars whose stopword density (share of
  *    whitespace tokens in the engine's stopword list,
  *    case-insensitive) is under [[MinStopDensity]] is boilerplate
  *    even with zero links — breadcrumbs, tag clouds and nav crumbs
  *    rendered without anchors carry no function words, sentences
  *    do. The axis is deliberately NOT applied above [[LengthLow]]:
  *    a long link-free block is content in this family's terms
  *    (jusText itself only trusts the stopword signal against its
  *    length bands, and the corpus floor — documents text is ≥ 44
  *    chars — sits above the band this rule judges);
  *  - kept blocks join with `\n` in document order.
  *
  * The thresholds are fixed constants, not tuned knobs: the gate
  * plants nav/footer/share/crumb blocks that any reasonable setting
  * must drop, main content no reasonable setting may touch, and —
  * pinning the constants themselves against silent drift (r16
  * verdict #7) — BOUNDARY blocks sitting exactly on each side of
  * [[MaxLinkDensity]] and [[MinShortChars]]. Totality mirrors
  * [[Html.extractText]]: None only on an unterminated raw-text
  * element. Map-only; one pass. */
object Boilerplate {

  /** Link-density ceiling for a content block (jusText's "good"
    * blocks sit far below; nav/footer rows sit near 1.0). */
  val MaxLinkDensity: Double = 0.4

  /** Blocks shorter than this (canonical chars) that contain ANY
    * link text are boilerplate stubs ("share", "read more"). */
  val MinShortChars: Int = 25

  /** The stopword axis's length band: blocks below this (canonical
    * chars) are judged by stopword density; at or above it, length
    * plus the link rules decide. Sits under the corpus documents
    * floor (44 chars at sf0.1) by design — the axis judges crumbs,
    * not content. */
  val LengthLow: Int = 40

  /** Minimum stopword density (stopword tokens / tokens,
    * case-insensitive, [[QualityClassifier.StopWords]]) for a block
    * under [[LengthLow]] to count as prose — jusText's stopwords_low
    * band. */
  val MinStopDensity: Double = 0.30

  /** One visible-text block with link accounting. `text` is
    * canonical (collapsed/trimmed); `chars`/`linkChars` are counted
    * on the raw emission so the density ratio is unaffected by
    * collapse. */
  final case class Block(text: String, chars: Int, linkChars: Int) {
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  /** Segment a page into visible-text blocks. None per
    * [[Html.extractText]]'s malformedness contract. */
  def blocks(html: String): Option[Seq[Block]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    final class BlockSink extends Html.Sink {
      private val buf = new java.lang.StringBuilder(256)
      private var links = 0
      private var aDepth = 0
      private def flush(): Unit = {
        val text = Html.canonical(buf.toString)
        if (text.nonEmpty)
          out += Block(text, buf.codePoints().count().toInt, links)
        buf.setLength(0); links = 0
      }
      private def count(k: Int): Unit = if (aDepth > 0) links += k
      def ch(c: Char): Unit = { buf.append(c); count(1) }
      def codePoint(cp: Int): Unit = { buf.appendCodePoint(cp); count(1) }
      def str(s: String): Unit = {
        buf.append(s); count(s.codePointCount(0, s.length))
      }
      def boundary(): Unit = flush()
      override def open(name: String): Unit =
        if (name == "a") aDepth += 1
      override def close(name: String): Unit =
        if (name == "a") aDepth = math.max(0, aDepth - 1)
      def finish(): Unit = flush()
    }
    val sink = new BlockSink
    if (!Html.walk(html, sink)) None
    else {
      // flush the trailing block (text after the last boundary)
      sink.finish()
      Some(out.toSeq)
    }
  }

  /** The kept (main-content) text: boilerplate blocks dropped, the
    * rest joined in document order. */
  def mainText(html: String): Option[String] =
    blocks(html).map(_.filter(keep).map(_.text).mkString("\n"))

  /** Stopword density of a block's canonical text: stopword tokens
    * over all whitespace tokens, case-insensitive; 0 for an empty
    * block. */
  def stopDensity(text: String): Double = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) 0.0
    else toks.count(t =>
      QualityClassifier.StopWords.contains(
        t.toLowerCase(java.util.Locale.ROOT))).toDouble / toks.length
  }

  /** The classification rule (public so audits can report per-block
    * verdicts). */
  def keep(b: Block): Boolean = {
    val canonLen = b.text.codePointCount(0, b.text.length)
    b.linkDensity <= MaxLinkDensity &&
      !(canonLen < MinShortChars && b.linkChars > 0) &&
      !(canonLen < LengthLow && stopDensity(b.text) < MinStopDensity)
  }

  /** Gate surface (`text_html_main`): per document, plant a page
    * whose body is the document text wrapped with boilerplate any
    * reasonable classifier must drop — a nav link row, a share stub,
    * a link-dense footer, a link-FREE no-stopword crumb row only the
    * stopword axis can separate (plus per-class comment soup / extra
    * link farms) — AND four threshold-BOUNDARY blocks that pin the
    * constants: link density exactly [[MaxLinkDensity]] (20/50,
    * kept) vs just over (21/50, dropped), and exactly
    * [[MinShortChars]] canonical chars with a link (kept) vs one
    * char fewer (dropped). Extract through [[mainText]]: every
    * well-formed class reduces to the document text plus the two
    * kept boundary blocks (fixed 15 tokens / 77 chars including
    * their newlines), so the oracle is the plain counts plus those
    * constants; the malformed class (unterminated script,
    * id % 5 == 3) owes (-1, -1). Map-only. */
  def htmlMainReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        mainText(plant(id, text)) match {
          case Some(t) =>
            (id, t.split("\\s+").count(_.nonEmpty).toLong,
              t.codePointCount(0, t.length).toLong)
          case None => (id, -1L, -1L)
        }
      }
      .toDF("doc_id", "n_tokens", "n_chars")
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[text] def plant(id: Long, text: String): String = {
    val extraFarm = id % 7 == 1 // a second link farm mid-page
    val soup = id % 7 == 4 // comments/bogus markup between blocks
    val bad = id % 5 == 3
    val nav = """<nav><a href="/">home</a> <a href="/a">about</a> """ +
      """<a href="/c">contact</a> <a href="/b">blog</a></nav>"""
    // link-free crumb row: 29 chars, zero links, zero stopwords —
    // invisible to the link rules, dropped by the stopword axis
    val crumb = """<div>Home Products Support Sitemap</div>"""
    // boundary blocks (doc): densities 20/50 = MaxLinkDensity exactly
    // (KEEP — the rule is <=) and 21/50 just over (DROP); lengths
    // exactly MinShortChars = 25 with a link (KEEP — the rule is <)
    // and 24 (DROP). The density keeper ALSO pins the stopword
    // axis's length band: its own stopword density (2/7) is below
    // MinStopDensity, so it survives only because 50 >= LengthLow
    // exempts it; the length keeper (25 chars) passes the axis at 6/8
    val densityKeep = """<p>the boundary keep block is xx """ +
      """<a href="#k">aaaaaaaaaaaaaaaaaaaa</a></p>"""
    val densityDrop = """<p>the boundary drop block is x """ +
      """<a href="#d">bbbbbbbbbbbbbbbbbbbbb</a></p>"""
    val lenKeep = """<p>a of and to is in block <a href="#">x</a></p>"""
    val lenDrop = """<p>a of and to is in blok <a href="#">x</a></p>"""
    val share = """<p>share <a href="#t">tweet</a></p>"""
    val footer = """<footer><a href="/tos">terms</a> <a href="/p">privacy</a> """ +
      """<a href="/i">imprint</a> ©</footer>"""
    val farm =
      if (extraFarm) """<div><a href="/1">one</a> <a href="/2">two</a> """ +
        """<a href="/3">three</a> <a href="/4">four</a></div>"""
      else ""
    val soupBits =
      if (soup) "<!--<p>ghost</p>--><?php ghost ?>" else ""
    val tail = if (bad) "<script>var ghost = 1;" else ""
    s"""<!DOCTYPE html><html><head><style>nav{display:flex}</style>""" +
      s"""<script>track("<p>");</script></head><body>$nav$crumb$soupBits""" +
      s"""<p>${escape(text)}</p>$densityKeep$densityDrop$lenKeep$lenDrop""" +
      s"""$farm$share$footer$tail</body></html>"""
  }
}
