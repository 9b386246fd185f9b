package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private val IndexPath = "/tmp/graft_ivf_index"

  private def queries(n: Int): Array[Similarity.Vec] =
    Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < n).collect().sortBy(_.vec_id)

  test("full-probe index search equals exact brute force") {
    val cents = IvfIndex.build(spark, sf(), IndexPath, nCells = 16, iters = 2)
    val viaIndex = IvfIndex.probe(spark, IndexPath, queries(10), cents,
        k = 5, nprobe = 16) // probe every cell -> candidate set = corpus
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex === exact)
  }

  test("IVF-PQ: code-only ADC scan (plan-asserted), recall holds") {
    val path = "/tmp/graft_ivfpq_index"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    // the ADC scan must read (vec_id, code) and NOT the float vectors
    val scanPlan = spark.read.parquet(path)
      .select(col("vec_id"), col("code"))
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("ReadSchema") && !scanPlan.contains("v:array"),
      s"vector column not pruned from ADC scan:\n$scanPlan")
    val got = IvfIndex.probePq(spark, path, qs, idx, k = 5, nprobe = 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      got.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF-PQ mean recall@5 = $mean")
    assert(mean >= 0.4)
    got.values.foreach(s => assert(s.size === 5))
  }

  test("narrow probe reads only the probed partitions and keeps recall") {
    val cents = IvfIndex.build(spark, sf(), IndexPath, nCells = 16, iters = 2)
    val qs = queries(10)
    // IO-level pruning: the probed scan touches fewer files than the index has
    val allFiles = spark.read.parquet(IndexPath)
      .select(input_file_name()).distinct().count()
    val probedCells = qs.flatMap { q =>
      cents.map(c => (Similarity.cosine(q, Similarity.Vec(-1, c.v, 1.0)), c.cell))
        .sortBy { case (s, i) => (-s, i) }.take(4).map(_._2)
    }.distinct
    val readFiles = spark.read.parquet(IndexPath)
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .select(input_file_name()).distinct().count()
    info(s"files: probed=$readFiles of $allFiles (cells ${probedCells.length}/16)")
    assert(probedCells.length < 16, "queries probed every cell; fixture degenerate")
    assert(readFiles < allFiles)
    // recall against exact stays substantial at nprobe=4
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = IvfIndex.probe(spark, IndexPath, qs, cents, k = 5, nprobe = 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      got.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"indexed IVF mean recall@5 = $mean")
    assert(mean >= 0.4)
  }
}
