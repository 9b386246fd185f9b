package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  private val goodVocab = Array("clear", "detailed", "thorough", "analysis",
    "method", "result", "evidence", "measured", "precise", "documented")
  private val badVocab = Array("click", "winner", "free", "spam", "junk",
    "buzz", "scam", "noise", "filler", "blah")

  /** Deterministic separable corpus: doc i draws `len` words from its
    * class vocab plus a little cross-class noise. */
  private def syntheticDocs(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val good = i % 2 == 0
      val vocab = if (good) goodVocab else badVocab
      val other = if (good) badVocab else goodVocab
      val words = (0 until 30).map { _ =>
        if (rnd.nextDouble() < 0.15) other(rnd.nextInt(other.length))
        else vocab(rnd.nextInt(vocab.length))
      }
      (i.toLong, words.mkString(" "), if (good) 1.0 else 0.0)
    }
  }

  test("learns a separable concept: accuracy >= 0.95, loss strictly improves") {
    import spark.implicits._
    val docs = syntheticDocs(200, seed = 5L)
      .toDF("doc_id", "text", "label")
    val dim = 512
    val (model, losses) = QualityClassifier.train(
      QualityClassifier.examples(docs, dim), dim, iters = 40)
    assert(losses.last < losses.head * 0.5,
      s"log-loss barely moved: ${losses.head} -> ${losses.last}")
    val scored = QualityClassifier.score(docs.select($"doc_id", $"text"), model)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val acc = docs.collect().count { r =>
      scored(r.getLong(0)) == r.getDouble(2).toInt
    } / 200.0
    info(f"train accuracy = $acc%.3f, loss ${losses.head}%.3f -> ${losses.last}%.3f")
    assert(acc >= 0.95, s"accuracy too low: $acc")
  }

  test("generalizes to held-out documents (train/test split)") {
    import spark.implicits._
    val all = syntheticDocs(300, seed = 17L)
    val train = all.take(200).toDF("doc_id", "text", "label")
    val test = all.drop(200).toDF("doc_id", "text", "label")
    val dim = 512
    val (model, _) = QualityClassifier.train(
      QualityClassifier.examples(train, dim), dim, iters = 40)
    val scored = QualityClassifier.score(test.select($"doc_id", $"text"), model)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val acc = test.collect().count { r =>
      scored(r.getLong(0)) == r.getDouble(2).toInt
    } / 100.0
    info(f"held-out accuracy = $acc%.3f")
    assert(acc >= 0.9, s"held-out accuracy too low: $acc")
  }

  test("training is bit-reproducible for a fixed input layout") {
    import spark.implicits._
    val docs = syntheticDocs(100, seed = 23L).toDF("doc_id", "text", "label")
    val dim = 256
    val (m1, l1) = QualityClassifier.train(
      QualityClassifier.examples(docs, dim), dim, iters = 10)
    val (m2, l2) = QualityClassifier.train(
      QualityClassifier.examples(docs, dim), dim, iters = 10)
    assert(m1.w.toSeq == m2.w.toSeq && m1.bias == m2.bias,
      "weights differ between identical runs")
    assert(l1.toSeq == l2.toSeq, "loss traces differ between identical runs")
  }

  test("hierarchical gradient fold: bit-reproducible, agrees with flat") {
    import spark.implicits._
    val docs = syntheticDocs(100, seed = 23L).toDF("doc_id", "text", "label")
    val dim = 256
    // 9 partitions > fanIn 2 → two deterministic reduce levels per pass
    val wide = QualityClassifier.examples(docs, dim).repartition(9)
    val (m1, l1) = QualityClassifier.train(wide, dim, iters = 10, fanIn = 2)
    val (m2, _) = QualityClassifier.train(wide, dim, iters = 10, fanIn = 2)
    assert(m1.w.toSeq == m2.w.toSeq && m1.bias == m2.bias,
      "tree-fold training must be deterministic")
    // tree vs flat: float grouping differs, convex GD keeps them close
    val (mf, lf) = QualityClassifier.train(wide, dim, iters = 10, fanIn = 64)
    assert(math.abs(l1.last - lf.last) <= 1e-9 * math.max(1.0, lf.last),
      s"tree (${l1.last}) vs flat (${lf.last}) final loss diverged")
    m1.w.zip(mf.w).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-8 * math.max(1.0, math.abs(b)))
    }
  }

  test("gate surface: distillation agrees with the weak labels it trained on") {
    val verdicts = QualityClassifier.classifyTrained(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val weak = TextAnalysis.quality(spark, sf())
      .select(col("doc_id"), col("is_quality"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = weak.count { case (id, y) => verdicts(id) == y }.toDouble / weak.size
    info(f"weak-label agreement = $agree%.3f over ${weak.size} docs")
    // distillation should reproduce most of its supervision signal;
    // disagreements are the smoothing the classifier exists to add
    assert(agree >= 0.8, s"classifier diverged from its supervision: $agree")
    assert(verdicts.size == weak.size)
  }
}
