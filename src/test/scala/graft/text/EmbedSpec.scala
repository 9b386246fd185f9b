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
