package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  /** Pure-Scala BPE reference (independent oracle, mrsequential-style):
    * word histogram → char+terminal symbols → k merge rounds with the
    * same (count desc, pair asc) tiebreak. */
  private def referenceMerges(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    val wc = texts
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[Seq[String], Long] =
      wc.map { case (w, c) => (w.map(_.toString) :+ "</w>") -> c }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, s"$x $y") }
        merges += ((a, b, c))
        vocab = vocab.groupMapReduce {
          case (syms, _) => Bpe.mergePair(syms, a, b)
        } { case (_, c2) => c2 }(_ + _)
      }
    }
    merges.result()
  }

  test("pair counts equal an independent in-memory count") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val expected = {
      val wc = texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong)
      val pairs = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        val syms = w.map(_.toString) :+ "</w>"
        syms.sliding(2).foreach {
          case Seq(a, b) => val p = s"$a $b"; pairs(p) = pairs.getOrElse(p, 0L) + c
          case _ =>
        }
      }
      pairs.toMap
    }
    val got = Bpe.pairCounts(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("trainMerges matches the pure-Scala reference trainer") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val got = Bpe.trainMerges(spark, sf(), k = 6)
    val expected = referenceMerges(texts, k = 6)
    assert(got === expected)
    // regime equivalence: incremental driver == distributed recount
    val dist = Bpe.trainMergesDistributed(spark, sf(), k = 6)
    assert(dist === got)
    // merge counts are non-increasing only per greedy step guarantee?
    // no — later merges can exceed earlier ones after symbol fusion;
    // assert instead that every merged pair had positive support
    assert(got.forall(_._3 > 0L))
  }

  test("encode: zero merges = chars+terminal; more merges never increase tokens") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val zero = Bpe.encode(spark, sf(), k = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eight = Bpe.encode(spark, sf(), k = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseline = docs.selectExpr("doc_id",
      "aggregate(transform(filter(split(lower(text), '[^a-z]+'), x -> x != ''), " +
        "w -> length(w) + 1), 0L, (acc, x) -> acc + x) AS n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === baseline)
    assert(eight.keySet === zero.keySet)
    eight.foreach { case (id, n) => assert(n <= zero(id) && n > 0L) }
    // with 8 merges something must actually have merged
    assert(eight.values.sum < zero.values.sum)
  }

  test("incremental driver trainer at large k matches the reference") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    // k large enough to exhaust most of this corpus's pair space —
    // exercises retraction, stale-index no-ops, merged-symbol pairs
    val got = Bpe.trainMerges(spark, sf(), k = 60)
    val expected = referenceMerges(texts, k = 60)
    assert(got === expected)
    assert(got.size === 60 || got.size === expected.size)
  }

  test("token ids: vocab round-trip reconstructs the word sequence") {
    import spark.implicits._
    val merges = Bpe.trainMerges(spark, sf(), k = 8).map(m => (m._1, m._2))
    val vocab = Bpe.vocabOf(merges).toMap
    val ids = Bpe.encodeIdsDocs(
        spark.read.parquet(s"${sf()}/documents.parquet"), merges)
      .as[(Long, Seq[Int])].collect().toMap
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(ids.keySet === texts.map(_._1).toSet)
    texts.take(50).foreach { case (docId, text) =>
      // decode: concatenate tokens, split words at the '</w>' terminal
      val decoded = ids(docId).map(vocab).mkString
        .split("</w>", -1).filter(_.nonEmpty).toSeq
      val expected = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
      assert(decoded === expected, s"doc $docId")
    }
    // every id is in vocab; per-doc id count equals the QC token count
    val counts = Bpe.encode(spark, sf(), k = 8)
      .as[(Long, Long)].collect().toMap
    ids.foreach { case (docId, seq) =>
      assert(seq.forall(vocab.contains))
      assert(seq.length.toLong === counts(docId), s"doc $docId")
    }
  }

  test("token ids match a sequential pure-Scala BPE apply") {
    import spark.implicits._
    val merges = Bpe.trainMerges(spark, sf(), k = 8).map(m => (m._1, m._2))
    val toId = Bpe.vocabOf(merges).map(_.swap).toMap
    val got = Bpe.encodeIdsDocs(
        spark.read.parquet(s"${sf()}/documents.parquet"), merges)
      .as[(Long, Seq[Int])].collect().toMap
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .take(30).foreach { case (docId, text) =>
        val expected = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
          .toSeq.flatMap { w =>
            var syms: Seq[String] = w.map(_.toString) :+ "</w>"
            merges.foreach { case (a, b) => syms = Bpe.mergePair(syms, a, b) }
            syms.map(toId)
          }
        assert(got(docId) === expected, s"doc $docId")
      }
  }

  test("mergePair: greedy non-overlapping left-to-right") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(Bpe.mergePair(Seq("x"), "a", "b") === Seq("x"))
    assert(Bpe.mergePair(Nil, "a", "b") === Nil)
  }
}
