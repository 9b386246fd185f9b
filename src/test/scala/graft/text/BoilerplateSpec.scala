package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate removal: block segmentation with link accounting, the
  * jusText/boilerpipe-style density rules, plant-class reduction to
  * exactly the document text, totality. */
class BoilerplateSpec extends AnyFunSuite {

  test("blocks: segmentation and link-char accounting") {
    val html = """<p>plain paragraph here</p>""" +
      """<div><a href="/">home</a> <a href="/a">about</a></div>""" +
      """<p>trailing <a href="#">link</a> words</p>"""
    val bs = Boilerplate.blocks(html).get
    assert(bs.map(_.text) === Seq("plain paragraph here",
      "home about", "trailing link words"))
    assert(bs(0).linkChars === 0)
    assert(bs(1).linkChars === "homeabout".length) // the space is outside <a>
    assert(bs(1).chars === "home about".length)
    assert(bs(2).linkChars === "link".length)
  }

  test("keep: density ceiling, short-with-links stub rule") {
    import Boilerplate.{keep, Block}
    assert(keep(Block("a perfectly normal content paragraph of text", 45, 0)))
    // density above the ceiling drops regardless of length
    assert(!keep(Block("home about contact blog and more links here xx", 47, 40)))
    // short + any link = stub
    assert(!keep(Block("share tweet", 11, 5)))
    // short but link-free survives WHEN it reads like prose (headings
    // with function words)
    assert(keep(Block("A Heading", 9, 0)))
    // long with a MODERATE link share survives (inline citations)
    assert(keep(Block("a" * 80 + " link", 85, 4)))
  }

  test("keep: the stopword axis separates crumbs a link rule cannot see") {
    import Boilerplate.{keep, Block, stopDensity}
    // link-FREE crumb rows: zero stopwords, under LengthLow → drop
    assert(!keep(Block("Home Products Support Sitemap", 29, 0)))
    assert(!keep(Block("News Blog Shop Careers Press", 28, 0)))
    // the same words as prose (function words present) → keep
    assert(keep(Block("the home of products and support", 32, 0)))
    // AT or above LengthLow the axis does not apply — a long
    // link-free block is content even with zero stopwords
    assert(keep(Block("Widget Catalog Spring Summer Autumn Winter xx", 45, 0)))
    assert(stopDensity("the home of products") === 0.5)
    assert(stopDensity("Home Products") === 0.0)
    assert(stopDensity("") === 0.0)
  }

  test("keep: threshold boundaries pin the constants exactly") {
    import Boilerplate.{keep, Block}
    val keep50 = "the boundary keep block is xx " + "a" * 20
    val drop50 = "the boundary drop block is x " + "b" * 21
    // density 20/50 = MaxLinkDensity exactly: kept (rule is <=)
    assert(keep(Block(keep50, 50, 20)))
    // 21/50 just over: dropped
    assert(!keep(Block(drop50, 50, 21)))
    // exactly MinShortChars canonical chars with a link: kept
    assert(keep(Block("a of and to is in block x", 25, 1)))
    // one char fewer: dropped
    assert(!keep(Block("a of and to is in blok x", 24, 1)))
  }

  test("mainText: every well-formed plant class keeps the text + boundary keepers") {
    val text = "spark query window merge scan filter join order batch"
    val kept = s"$text\nthe boundary keep block is xx ${"a" * 20}" +
      "\na of and to is in block x"
    for (id <- Seq(0L, 1L, 11L, 2L, 6L))
      assert(Boilerplate.mainText(Boilerplate.plant(id, text))
        === Some(kept), s"id=$id")
    assert(Boilerplate.mainText(Boilerplate.plant(3L, text)) === None)
  }

  test("trailing text after the last boundary is not lost") {
    assert(Boilerplate.blocks("<p>block</p>tail words here four five")
      .get.map(_.text) === Seq("block", "tail words here four five"))
  }

  test("nested and stray anchor tags keep the depth sane") {
    val bs = Boilerplate.blocks("</a>free text here<a><a>in</a>half</a> out").get
    assert(bs.length === 1)
    // "in" + "half" are inside anchors; "free text here"/" out" are not
    assert(bs.head.linkChars === "inhalf".length)
  }

  test("totality: prefixes never throw; unterminated raw-text is None") {
    val page = Boilerplate.plant(1L, "the quick brown fox")
    for (n <- 0 to page.length) Boilerplate.blocks(page.substring(0, n))
    assert(Boilerplate.blocks("x<style>p{") === None)
  }
}
