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
  *  - kept blocks join with `\n` in document order.
  *
  * The thresholds are fixed constants, not tuned knobs: the gate
  * plants nav/footer/share blocks that any reasonable setting must
  * drop and main content no reasonable setting may touch (documents
  * text is ≥ 44 chars and link-free). Totality mirrors
  * [[Html.extractText]]: None only on an unterminated raw-text
  * element. Map-only; one pass. */
object Boilerplate {

  /** Link-density ceiling for a content block (jusText's "good"
    * blocks sit far below; nav/footer rows sit near 1.0). */
  val MaxLinkDensity: Double = 0.4

  /** Blocks shorter than this (canonical chars) that contain ANY
    * link text are boilerplate stubs ("share", "read more"). */
  val MinShortChars: Int = 25

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

  /** The classification rule (public so audits can report per-block
    * verdicts). */
  def keep(b: Block): Boolean =
    b.linkDensity <= MaxLinkDensity &&
      !(b.text.codePointCount(0, b.text.length) < MinShortChars && b.linkChars > 0)

  /** Gate surface (`text_html_main`): per document, plant a page
    * whose body is the document text wrapped with boilerplate any
    * reasonable classifier must drop — a nav link row, a share stub,
    * a link-dense footer (plus per-class comment soup / extra link
    * farms) — and extract through [[mainText]]. Every well-formed
    * class reduces to exactly the document text, so the oracle is
    * the plain counts; the malformed class (unterminated script,
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
      s"""<script>track("<p>");</script></head><body>$nav$soupBits""" +
      s"""<p>${escape(text)}</p>$farm$share$footer$tail</body></html>"""
  }
}
