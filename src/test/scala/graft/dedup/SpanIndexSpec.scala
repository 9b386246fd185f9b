package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanIndexSpec extends SparkSpec {

  private def docs() = spark.read.parquet(s"${sf()}/documents.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("probe equals the one-shot operator restricted to batch docs") {
    val path = "/tmp/graft_spanidx_diff"
    val batch = docs().filter(col("doc_id") % 10 === 0)
    SpanIndex.build(docs().filter(col("doc_id") % 10 =!= 0), path)
    val probed = rows(SpanIndex.probe(spark, path, batch))
    // one-shot over EVERYTHING, then keep only batch-side extents:
    // "shared with any other doc" is exactly index ∪ batch-internal
    val oneShot = rows(SuffixDedup.maximalSpans(spark, sf()))
      .filter(_._1 % 10 == 0)
    assert(probed === oneShot)
    assert(probed.nonEmpty, "gate corpus should flag batch spans")
  }

  test("incremental append: build(A) + append(B) probes like build(A ∪ B)") {
    val all = docs().filter(col("doc_id") % 10 =!= 0)
    val a = all.filter(col("doc_id") % 3 === 1)
    val b = all.filter(col("doc_id") % 3 =!= 1)
    val batch = docs().filter(col("doc_id") % 10 === 0)
    val p1 = "/tmp/graft_spanidx_inc"
    SpanIndex.build(a, p1)
    SpanIndex.append(b, p1)
    val p2 = "/tmp/graft_spanidx_full"
    SpanIndex.build(all, p2)
    assert(rows(SpanIndex.probe(spark, p1, batch))
      === rows(SpanIndex.probe(spark, p2, batch)))
  }

  test("streaming ingestion: foreachBatch append grows the index probe-exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxDocs = docs().filter(col("doc_id") % 10 =!= 0)
    val batch = docs().filter(col("doc_id") % 10 === 0)
    val pStream = "/tmp/graft_spanidx_stream"
    val pBatch = "/tmp/graft_spanidx_batchref"
    // seed build on a backfill slice, stream the rest in micro-batches
    SpanIndex.build(idxDocs.filter(col("doc_id") < 250), pStream)
    val live = idxDocs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
        SpanIndex.append(ds, pStream); ()
      }.start()
    try {
      live.grouped(100).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    SpanIndex.build(idxDocs, pBatch)
    assert(rows(SpanIndex.probe(spark, pStream, batch))
      === rows(SpanIndex.probe(spark, pBatch, batch)))
  }

  test("crawl loop: unseen batch is silent, a re-crawled copy flags exactly") {
    import spark.implicits._
    def tok(tag: String, i: Int): String =
      s"$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val body = (0 until 30).map(tok("s", _))
    val corpus = Seq(
      (1L, (Seq("fa") ++ body ++ Seq("fb")).mkString(" ")),
      (2L, (0 until 40).map(tok("u", _)).mkString(" "))).toDF("doc_id", "text")
    val fresh = Seq((100L, (0 until 40).map(tok("v", _)).mkString(" "))).toDF("doc_id", "text")
    val recrawl = Seq((101L, (Seq("ga", "gb") ++ body).mkString(" "))).toDF("doc_id", "text")
    val path = "/tmp/graft_spanidx_crawl"
    SpanIndex.build(corpus, path)
    assert(rows(SpanIndex.probe(spark, path, fresh)) === Set.empty,
      "an unseen batch must not flag")
    assert(rows(SpanIndex.probe(spark, path, recrawl)) === Set((101L, 2L, 32L)),
      "the re-crawled body must flag at its exact extent")
    // batch-internal duplication flags without any index hit
    val twins = Seq(
      (200L, (Seq("ha") ++ (0 until 20).map(tok("w", _))).mkString(" ")),
      (201L, ((0 until 20).map(tok("w", _)) ++ Seq("hb")).mkString(" "))
    ).toDF("doc_id", "text")
    assert(rows(SpanIndex.probe(spark, path, twins))
      === Set((200L, 1L, 21L), (201L, 0L, 20L)))
  }

  private def matchRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  test("probeMatches: exact partner/offsets/length; equals maximalMatches on unique witnesses") {
    import spark.implicits._
    def tok(tag: String, i: Int): String =
      s"$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val body = (0 until 30).map(tok("s", _))
    val corpus = Seq(
      (1L, (Seq("fa") ++ body ++ Seq("fb")).mkString(" ")),
      (2L, (0 until 40).map(tok("u", _)).mkString(" "))).toDF("doc_id", "text")
    val recrawl = Seq((101L, (Seq("ga", "gb") ++ body).mkString(" "))).toDF("doc_id", "text")
    val path = "/tmp/graft_spanidx_m_plant"
    SpanIndex.buildWithSamples(corpus, path)
    assert(matchRows(SpanIndex.probeMatches(spark, path, recrawl))
      === Set((101L, 1L, 2L, 1L, 30L)),
      "the re-crawled body: partner doc 1, offsets 2/1, length 30")
    // the single-partner case must agree with the one-shot pair view
    // over index ∪ batch (pair order normalized: maximalMatches emits
    // doc_i < doc_j, the probe emits batch-first)
    val dir = "/tmp/graft_spanidx_m_union"
    corpus.union(recrawl).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val oneShot = matchRows(SuffixDedup.maximalMatches(spark, dir, minSpan = 8))
      .filter { case (i, j, _, _, _) => j == 101L && i % 10 != 0 }
      .map { case (i, j, oi, oj, l) => (j, i, oj, oi, l) }
    assert(matchRows(SpanIndex.probeMatches(spark, path, recrawl)) === oneShot)
  }

  test("probeMatches: witness switch mid-span splits the run, every row verbatim-true") {
    import spark.implicits._
    def tok(tag: String, i: Int): String =
      s"$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val body = (0 until 30).map(tok("s", _))
    // doc 5 holds the WHOLE span; doc 3 (the smaller id — the witness
    // winner) holds only its second half, so the batch run's witness
    // switches partners mid-span
    val corpus = Seq(
      (5L, (Seq("fa") ++ body ++ Seq("fb")).mkString(" ")),
      (3L, (Seq("ha", "hb", "hc") ++ body.drop(15)).mkString(" "))
    ).toDF("doc_id", "text")
    val batch = Seq((101L, (Seq("ga") ++ body ++ Seq("gb")).mkString(" ")))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_spanidx_m_switch"
    SpanIndex.buildWithSamples(corpus, path)
    val got = matchRows(SpanIndex.probeMatches(spark, path, batch))
    assert(got.map(_._2) === Set(3L, 5L),
      s"the run must split across both witnesses: $got")
    // every reported row is a TRUE verbatim match at its exact offsets
    val texts = corpus.union(batch).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    got.foreach { case (di, dj, oi, oj, len) =>
      assert(texts(di).slice(oi.toInt, (oi + len).toInt)
        === texts(dj).slice(oj.toInt, (oj + len).toInt),
        s"match ($di,$dj,$oi,$oj,$len) must be verbatim")
    }
    // and the matches view covers exactly the extent the bare probe
    // flags (same evidence, diagnosis vs union view)
    val probePath = "/tmp/graft_spanidx_m_switch_bare"
    SpanIndex.build(corpus, probePath)
    val extents = got.toSeq.map { case (di, _, oi, _, len) => (di, oi, oi + len) }
      .sortBy(_._2)
    val merged = extents.foldLeft(List.empty[(Long, Long, Long)]) {
      case (acc, (d, s, e)) => acc match {
        case (pd, ps, pe) :: rest if pd == d && s <= pe =>
          (pd, ps, math.max(pe, e)) :: rest
        case _ => (d, s, e) :: acc
      }
    }.toSet
    assert(merged === rows(SpanIndex.probe(spark, probePath, batch)))
  }

  test("probeMatches: append order never changes the witness") {
    val all = docs().filter(col("doc_id") % 10 =!= 0)
    val a = all.filter(col("doc_id") % 3 === 1)
    val b = all.filter(col("doc_id") % 3 =!= 1)
    val batch = docs().filter(col("doc_id") % 10 === 0)
    val pAb = "/tmp/graft_spanidx_m_ab"
    SpanIndex.buildWithSamples(a, pAb)
    SpanIndex.appendWithSamples(b, pAb)
    val pBa = "/tmp/graft_spanidx_m_ba"
    SpanIndex.buildWithSamples(b, pBa)
    SpanIndex.appendWithSamples(a, pBa)
    val pFull = "/tmp/graft_spanidx_m_full"
    SpanIndex.buildWithSamples(all, pFull)
    val full = matchRows(SpanIndex.probeMatches(spark, pFull, batch))
    assert(full.nonEmpty, "gate corpus should produce matches")
    assert(matchRows(SpanIndex.probeMatches(spark, pAb, batch)) === full)
    assert(matchRows(SpanIndex.probeMatches(spark, pBa, batch)) === full)
  }
}
