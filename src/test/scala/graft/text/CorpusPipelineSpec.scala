package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("composed pipeline: quality floor, first-copy dedup, contiguous packs") {
    val out = CorpusPipeline.prepare(spark, sf(), budget = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // every kept doc meets the token floor
    assert(out.forall(_._2 >= 5L))
    // kept ids are unique
    assert(out.map(_._1).distinct.length === out.length)
    // pack ids: start at 0, contiguous, and each pack's preceding mass
    // is exactly pre/budget of the doc-ordered running sum
    val sorted = out.sortBy(_._1)
    var run = 0L
    sorted.foreach { case (_, n, pack) =>
      assert(pack === run / 512L)
      run += n
    }
    // cross-check the dedup stage: kept cleaned texts are distinct and
    // each is the minimum doc_id of its duplicate group
    val cleaned = Cleaning.cleanText(spark.read.parquet(s"${sf()}/documents.parquet"))
      .select(col("doc_id"), col("clean_text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keptSet = out.map(_._1).toSet
    val byText = cleaned.groupBy(_._2)
    keptSet.foreach { id =>
      val text = cleaned.find(_._1 == id).get._2
      val groupMin = byText(text).map(_._1).min
      assert(id === groupMin, s"doc $id kept but ${groupMin} is the group min")
    }
  }

  test("decontaminated pipeline: excision feeds the UNCHANGED standard stages") {
    import spark.implicits._
    // planted: doc 37 is benchmark; doc 1 quotes its 20-token passage
    // after 6 unique filler tokens; doc 2 is clean
    def tk(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val passage = tk("s", 20)
    Seq(
      (37L, (Seq("ba") ++ passage ++ Seq("bb")).mkString(" ")),
      (1L, (tk("f", 6) ++ passage).mkString(" ")),
      (2L, tk("g", 8).mkString(" "))
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet("/tmp/graft_pipe_decon/documents.parquet")
    val out = CorpusPipeline.prepareDecontaminated(spark, "/tmp/graft_pipe_decon")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the quote is cut BEFORE counting: doc 1 keeps only its fillers
    assert(out === Map(1L -> 6L, 2L -> 8L))
    // the plain pipeline on the same dir keeps the quote (26 tokens)
    val plain = CorpusPipeline.prepare(spark, "/tmp/graft_pipe_decon")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(plain(1L) === 26L)
    // composition differential on the corpus: the one-call pipeline
    // equals excise-materialize-then-standard-pipeline — including the
    // full scrub stage, proving scrub is a no-op on excised text
    val exc = graft.dedup.SuffixDedup.exciseBenchmarkSpans(spark, sf())
      .select(col("doc_id"), col("clean_text").as("text"))
    exc.write.mode("overwrite")
      .parquet("/tmp/graft_pipe_decon_corpus/documents.parquet")
    val composed = CorpusPipeline.prepareDecontaminated(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val manual = CorpusPipeline.prepare(spark, "/tmp/graft_pipe_decon_corpus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(composed === manual)
    assert(composed.nonEmpty)
    assert(composed.forall(_._1 % 37 != 0), "no benchmark docs in the output")
  }

  test("token-id pipeline: same kept set, ids from the cleaned text, id-count packs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = CorpusPipeline.prepareIds(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val countBased = CorpusPipeline.prepare(spark, sf()).collect()
      .map(r => r.getLong(0)).toSet
    // identical survivor set (same scrub/quality/dedup stages)
    assert(out.map(_._1).toSet === countBased)
    // n_bpe_tokens matches the standalone id encoder over the SAME
    // cleaned survivors (the ids must come from cleaned text, not raw)
    val merges = Bpe.trainMerges(spark, sf(), 8).map(m => (m._1, m._2))
    val cleanedKept = Cleaning.cleanText(spark.read.parquet(s"${sf()}/documents.parquet"))
      .filter(col("doc_id").isin(out.map(_._1).toIndexedSeq: _*))
      .select(col("doc_id"), col("clean_text").as("text"))
    val expected = Bpe.encodeIdsDocs(cleanedKept, merges)
      .as[(Long, Seq[Int])].collect().map { case (id, ids) => id -> ids.length.toLong }.toMap
    out.foreach { case (id, n, _) => assert(n === expected(id), s"doc $id") }
    // contiguous id-count packing at budget 512
    var run = 0L
    out.sortBy(_._1).foreach { case (_, n, pack) =>
      assert(pack === run / 512L)
      run += n
    }
  }
}
