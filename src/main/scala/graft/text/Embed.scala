package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The EMBEDDER SEAM: where a real text encoder plugs into the
  * pipeline. Everywhere else the engine consumes `embeddings.parquet`
  * as a fixture; [[embedColumn]] makes chunk → embed → semantic-dedup
  * a single composable program by appending an embedding column to any
  * frame, with the encoder as an opaque broadcast model invoked in
  * partition-local batches — the [[QualityClassifier]] posture
  * (model-as-broadcast, executor-side inference, no shuffle) and the
  * exact call shape a vectorized real encoder (ONNX/JNI session, or
  * `mapInPandas` + a GPU model on PySpark) drops into: one
  * `encodeBatch(texts)` per `batchSize` rows, so a real model amortizes
  * its per-call overhead and bounds peak memory per task.
  *
  * [[HashEncoder]] is the shipped baseline — feature hashing (token
  * n-grams → [[graft.core.Mix]]-signed buckets, unit-normalized), the
  * classic hashing-trick embedder: deterministic, dimension-bounded,
  * and genuinely useful as a cheap lexical-similarity signal (near-dup
  * text gets near-parallel vectors). Not a stub: EmbedSpec pins that
  * jittered near-dup chunks embed closer than unrelated ones.
  *
  * Scale: map-only (the narrow pass adds one array column); the
  * encoder broadcast is shipped once per executor, not per task.
  */
object Embed {

  /** Batched text encoder — the model seam. Implementations must be
    * deterministic per input (the differential specs and any retry
    * replay depend on it). */
  trait Encoder extends Serializable {
    def dim: Int
    /** One vectorized call per partition-local batch: out(i) is the
      * `dim`-length embedding of texts(i). */
    def encodeBatch(texts: Array[String]): Array[Array[Double]]
  }

  /** Feature-hashing encoder: unigrams + bigrams of the engine-wide
    * tokenizer's tokens, each hashed to a bucket and a deterministic
    * sign ([[graft.core.Mix.splitmix64]] of the n-gram's FNV hash),
    * accumulated and L2-normalized. Empty text → the zero vector. */
  final class HashEncoder(val dim: Int = 64) extends Encoder {
    private def fnv(s: String): Long = {
      var h = 2166136261L
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 16777619L; i += 1 }
      h
    }
    private def add(v: Array[Double], gram: String): Unit = {
      val m = graft.core.Mix.splitmix64(fnv(gram))
      val b = ((m % dim) + dim) % dim
      v(b.toInt) += (if ((m & 1L) == 0L) 1.0 else -1.0)
    }
    def encodeBatch(texts: Array[String]): Array[Array[Double]] =
      texts.map { t =>
        val v = new Array[Double](dim)
        val toks = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        var i = 0
        while (i < toks.length) {
          add(v, toks(i))
          if (i + 1 < toks.length) add(v, toks(i) + " " + toks(i + 1))
          i += 1
        }
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
  }

  /** Append `outCol` (array<double>, length `enc.dim`) to `df` by
    * batched executor-side inference over `textCol`. */
  def embedColumn(df: DataFrame, textCol: String, enc: Encoder,
      outCol: String = "embedding", batchSize: Int = 64): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already carries a $outCol column")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(enc)
    val tIdx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType), nullable = false)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map { r =>
          val t = r.get(tIdx); if (t == null) "" else t.toString
        }.toArray
        val embs = bc.value.encodeBatch(texts) // ONE model call per batch
        batch.iterator.zip(embs.iterator).map { case (r, e) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e.toSeq)
        }
      }
    }(rowEnc)
  }

  /** Convenience: chunk a document frame and embed each chunk — the
    * chunk→embed head of the semantic ingest pipeline. */
  def embedChunks(docs: DataFrame, enc: Encoder, window: Int = 64,
      stride: Int = 48, batchSize: Int = 64): DataFrame =
    embedColumn(Chunking.chunksOf(docs, window, stride), "chunk", enc,
      batchSize = batchSize)
}
