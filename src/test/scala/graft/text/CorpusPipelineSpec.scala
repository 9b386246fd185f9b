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
