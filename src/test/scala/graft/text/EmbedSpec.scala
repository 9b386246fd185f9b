package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedSpec extends SparkSpec {

  private val enc = new Embed.HashEncoder(32)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d // encoder output is unit-normalized
  }

  test("hashing encoder: deterministic, unit-norm, lexical similarity orders correctly") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy cat again and again"
    val far = "completely unrelated legal boilerplate about insurance claims"
    val Array(e1, e2, e3, e4) = enc.encodeBatch(Array(base, near, far, base))
    assert(e1.toSeq === e4.toSeq, "same text, same embedding")
    assert(math.abs(math.sqrt(e1.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(cos(e1, e2) > cos(e1, e3),
      "near-duplicate text must embed closer than unrelated text")
    assert(cos(e1, e2) > 0.5)
    assert(enc.encodeBatch(Array(""))(0).forall(_ == 0.0), "empty text → zero vector")
  }

  test("embedColumn: batched inference appends the per-row embedding, batch-size invariant") {
    import spark.implicits._
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text")
    def run(bs: Int) = Embed.embedColumn(df, "text", enc, batchSize = bs)
      .select(col("doc_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val a = run(1); val b = run(500)
    assert(a === b, "batch boundaries must not change the embedding")
    // and every row got the encoder's output, not a default
    val direct = df.as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, t) => id -> enc.encodeBatch(Array(t))(0).toSeq }.toSeq
    assert(a === direct)
    // column collision fails loudly instead of silently overwriting
    intercept[IllegalArgumentException] {
      Embed.embedColumn(run2frame(), "text", enc)
    }
  }

  private def run2frame() =
    Embed.embedColumn(
      spark.read.parquet(s"${sf()}/documents.parquet").selectExpr("doc_id", "text"),
      "text", enc)

  test("integer bucket vectors match a driver re-derivation of the FNV fold") {
    val dim = 32
    val got = Embed.hashBuckets(spark, sf(), dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val grams = t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      grams.foreach { g =>
        val h = graft.core.FnvHash31.hash(g.getBytes("UTF-8"))
        val key = (id, (h % dim).toLong)
        expected(key) = expected.getOrElse(key, 0L) + (if (h % 2 == 0) 1L else -1L)
      }
    }
    assert(got === expected.filter(_._2 != 0L).toMap,
      "distributed bucket weights must equal the driver FNV fold")
    // negative and positive weights both occur (signed hashing trick)
    assert(got.values.exists(_ > 0) && got.values.exists(_ < 0))
  }

  test("bucket top-k: ranks match a driver cosine over the integer vectors") {
    val got = Embed.bucketTopK(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val w = Embed.hashBuckets(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def dot(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.iterator.map { case (k, v) => v * b.getOrElse(k, 0L) }.sum
    def n2(a: Map[Long, Long]): Long = a.valuesIterator.map(v => v * v).sum
    (0L until 5L).foreach { q =>
      val qv = w(q)
      // Spark scores only doc pairs sharing >= 1 bucket; with dim=32
      // and the corpus vocabulary every pair shares buckets, so the
      // driver ranking over all docs is the same candidate set
      val ranked = w.keys.filter(_ != q).toSeq
        .map { d =>
          val c = dot(qv, w(d)).toDouble /
            math.sqrt(n2(w(d)).toDouble * n2(qv).toDouble)
          (d, c)
        }
        .sortBy { case (d, c) => (-c, d) }
        .take(10)
      ranked.zipWithIndex.foreach { case ((d, c), i) =>
        val (gd, gmicro) = got((q, i + 1L))
        assert(gd === d, s"query $q rank ${i + 1}")
        assert(gmicro === (c * 1e6).toLong, s"query $q rank ${i + 1} micro")
      }
    }
  }

  test("bucket top-k: the heap tail equals the window tail exactly") {
    // force both tails on the same input: heapAbove=0 routes ALL
    // queries through the partition-local k-heaps
    val window = Embed.bucketTopK(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val heap = Embed.bucketTopK(spark, sf(), heapAbove = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(heap === window, "heap retention must reproduce the window rank")
    assert(window.nonEmpty)
  }

  test("chunk embeddings line up with the chunk frame") {
    val out = Embed.embedChunks(
      spark.read.parquet(s"${sf()}/documents.parquet").selectExpr("doc_id", "text"),
      enc)
    val chunks = Chunking.chunks(spark, sf())
    assert(out.count() === chunks.count())
    val row = out.select(col("chunk"), col("embedding")).head()
    assert(row.getSeq[Double](1).toArray.toSeq ===
      enc.encodeBatch(Array(row.getString(0)))(0).toSeq)
  }
}
