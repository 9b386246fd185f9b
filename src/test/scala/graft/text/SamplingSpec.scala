package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("hash sample: deterministic, layout-independent, ~fraction sized") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "sample must not depend on physical layout")
    val n = docs.count().toDouble
    assert(a.size > n * 0.15 && a.size < n * 0.45, s"${a.size} of $n")
  }

  test("nested sample property: smaller fraction is a subset of larger") {
    val small = Sampling.hashSample(docs, "doc_id", 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, "doc_id", 0.4).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "threshold sampling must nest")
  }

  test("stratified sample honors per-stratum fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.05, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.5))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val deRate = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(enRate < deRate, s"en $enRate should be sampled far below de $deRate")
  }

  test("per-stratum top-k: exactly k per language, deterministic, nested in hash order") {
    val a = Sampling.sampleTopKDocuments(spark, sf(), k = 20).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b = Sampling.sampleTopKDocuments(spark, sf(), k = 20).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.toSeq === b.sorted.toSeq) // deterministic
    val langSizes = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_._2).view.mapValues(_.length).toMap
    langSizes.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0) === math.min(20L, n).toInt, s"lang $lang")
    }
    // k=10 is a prefix of k=20 within each stratum (same hash order)
    val small = Sampling.sampleTopKDocuments(spark, sf(), k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(small.subsetOf(a.toSet))
  }

  test("source mixture: weights cover all sources, sum to ~1e6, temper the skew") {
    val out = Sampling.sourceMixture(spark, sf()).collect()
    val srcs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("source").distinct().count()
    assert(out.length === srcs.toInt)
    val wsum = out.map(_.getAs[Long]("weight_ppm")).sum
    // each source's ppm rounds independently: off by at most n/2 total
    assert(math.abs(wsum - 1000000L) <= out.length)
    // α=0.5 tempering: the weight RATIO between the largest and
    // smallest source must be the sqrt of the token ratio (flatter
    // than proportional sampling), and ordering must be preserved
    val byTokens = out.sortBy(_.getAs[Long]("n_tokens"))
    val (lo, hi) = (byTokens.head, byTokens.last)
    assert(lo.getAs[Long]("weight_ppm") <= hi.getAs[Long]("weight_ppm"))
    if (lo.getAs[Long]("n_tokens") < hi.getAs[Long]("n_tokens")) {
      val tokRatio = hi.getAs[Long]("n_tokens").toDouble / lo.getAs[Long]("n_tokens")
      val wRatio = hi.getAs[Long]("weight_ppm").toDouble / lo.getAs[Long]("weight_ppm")
      assert(math.abs(wRatio - math.sqrt(tokRatio)) / math.sqrt(tokRatio) < 0.01)
    }
    // score really is the correctly-rounded sqrt — the property the
    // exact SQL oracle rests on
    out.foreach { r =>
      assert(r.getAs[Long]("score") ===
        math.round(math.sqrt(r.getAs[Long]("n_tokens").toDouble) * 1000))
    }
  }

  test("weighted sample: per-flag rates honored, deterministic, quality-enriched") {
    import org.apache.spark.sql.functions._
    val quality = TextAnalysis.quality(spark, sf())
      .select(col("doc_id"), col("is_quality"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kept = Sampling.weightedSample(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // flags pass through unchanged
    kept.foreach { case (id, q) => assert(q === quality(id)) }
    // per-stratum rates land near their targets (hi 0.8, lo 0.1)
    val hiTotal = quality.count(_._2 == 1); val hiKept = kept.count(_._2 == 1)
    val loTotal = quality.count(_._2 == 0); val loKept = kept.count(_._2 == 0)
    assert(hiTotal > 0 && loTotal > 0, "corpus must have both strata")
    assert(math.abs(hiKept.toDouble / hiTotal - 0.8) < 0.1,
      s"hi rate ${hiKept.toDouble / hiTotal}")
    assert(math.abs(loKept.toDouble / loTotal - 0.1) < 0.1,
      s"lo rate ${loKept.toDouble / loTotal}")
    // determinism
    val again = Sampling.weightedSample(spark, sf()).collect()
      .map(r => r.getLong(0)).toSet
    assert(again === kept.keySet)
  }
}
