package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge
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

  // ── INTEGER feature-hash embedding (the gate-able twin) ───────────
  //
  // [[HashEncoder]]'s splitmix64 needs 64-bit WRAPPING multiplies,
  // which DuckDB errors on rather than wraps — so the hash-gated
  // surface uses the engine's FNV-1a-31 Catalyst expression
  // ([[graft.core.FnvHash31]], codegen) with INTEGER bucket weights:
  // every value is exactly representable, so the oracle re-derives the
  // vectors (and the cosine ranking over them) with no float faith.

  /** Sparse integer bucket vectors (idCols…, bucket, weight) over the
    * engine tokenizer's unigrams + bigrams of `textCol`: bucket =
    * fnv31(gram) mod dim, sign = parity of the hash; zero-sum buckets
    * dropped (the vector is sparse by construction). Fully
    * declarative — the FNV expression is codegen, the rest is explode
    * + groupBy (one shuffle, map-side combined). `idCols` generalizes
    * the unit of embedding: docs embed by doc_id, chunks by
    * (doc_id, chunk_id). */
  def hashBucketsOf(docs: DataFrame, dim: Int = 32,
      idCols: Seq[String] = Seq("doc_id"),
      textCol: String = "text"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val ids = idCols.map(col)
    val toks = Tok.alphaToksOf(textCol)
    val grams = docs
      .select(ids :+ expr(toks).as("t"): _*)
      .select(ids :+ explode(expr(
        """concat(t, CASE WHEN size(t) >= 2
          |  THEN transform(slice(t, 1, size(t) - 1),
          |    (x, i) -> concat(x, ' ', element_at(t, i + 2)))
          |  ELSE array() END)""".stripMargin)).as("g"): _*)
    val h = bridge.column(graft.core.FnvHash31(bridge.expression(col("g"))))
    grams
      .select(ids ++ Seq((h % dim).cast("long").as("bucket"),
        when(h % 2 === 0, 1L).otherwise(-1L).as("s")): _*)
      .groupBy(ids :+ col("bucket"): _*)
      .agg(sum(col("s")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** Gate surface over the documents table. */
  def hashBuckets(spark: SparkSession, sfDir: String, dim: Int = 32): DataFrame =
    hashBucketsOf(spark.read.parquet(s"$sfDir/documents.parquet"), dim)

  /** Chunk-level bucket vectors — the chunk→embed composition as one
    * hash-gated frame: (doc_id, chunk_id, bucket, weight) over the
    * sliding windows' text. Chunk text is the tokenizer's own tokens
    * space-joined, so re-tokenizing is the identity and chunk vectors
    * relate exactly to the doc vectors they partition. */
  def chunkHashBuckets(spark: SparkSession, sfDir: String,
      dim: Int = 32): DataFrame =
    hashBucketsOf(
      Chunking.chunks(spark, sfDir)
        .select(col("doc_id"), col("chunk_id"), col("chunk")),
      dim, idCols = Seq("doc_id", "chunk_id"), textCol = "chunk")

  /** Lexical nearest-neighbors over the integer bucket vectors: the
    * first `nQueries` doc ids rank the whole corpus by cosine (integer
    * dot and norms; ONE double division at the end, identical operands
    * on both engines), top-`k` per query, ties to the lower doc_id.
    * Plan shape: the query slice is a broadcast join on `bucket`
    * (tiny side — nQueries × ≤ dim rows) and dot products are one
    * map-side-combined groupBy. The rank tail switches on the query
    * count: up to `heapAbove` queries, a plain window (candidate sets
    * are corpus-sized — dim is small, so every doc shares buckets
    * with every query — but nQueries reducers over a bounded
    * interactive query set is fine); ABOVE it, partition-local k-heaps
    * ([[graft.sim.Similarity.worstFirst]]'s retention rule) shrink
    * the stream to ≤ nQueries·k·partitions rows BEFORE the window, so
    * a large query sweep never funnels corpus-sized partitions into
    * per-query reducers. Identical output by construction (same
    * (cos desc, neighbor_id) key, heap retention = that key's top-k,
    * arrival-order independent) — EmbedSpec pins window ≡ heap. */
  def bucketTopK(spark: SparkSession, sfDir: String, dim: Int = 32,
      nQueries: Int = 5, k: Int = 10, heapAbove: Int = 32): DataFrame = {
    // the bucket frame feeds THREE plan branches (dots, both norm
    // sides) — materialize once so the FNV fold doesn't execute 3×
    val buckets = hashBuckets(spark, sfDir, dim).localCheckpoint()
    val norms = buckets.groupBy(col("doc_id"))
      .agg(sum(col("weight") * col("weight")).as("n2"))
    val queries = buckets.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("bucket"),
        col("weight").as("qw"))
    val dots = buckets.join(broadcast(queries), Seq("bucket"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("weight") * col("qw")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id"), col("n2").as("dn2")), Seq("doc_id"))
      .join(broadcast(norms.select(col("doc_id").as("query_id"),
        col("n2").as("qn2"))), Seq("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        (col("dot").cast("double") /
          sqrt(col("dn2").cast("double") * col("qn2").cast("double")))
          .as("cos"))
    val reduced =
      if (nQueries <= heapAbove) scored
      else {
        // partition-local bounded heaps: each task keeps at most k
        // candidates per query, so the window below ranks
        // nQueries·k·partitions rows instead of nQueries·corpus
        import spark.implicits._
        scored.select(col("query_id"), col("neighbor_id"), col("cos"))
          .as[(Long, Long, Double)]
          .mapPartitions { it =>
            val heaps = scala.collection.mutable.LongMap
              .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
            it.foreach { case (q, n, c) =>
              val h = heaps.getOrElseUpdate(q, scala.collection.mutable
                .PriorityQueue.empty[(Double, Long)](
                  graft.sim.Similarity.worstFirst))
              if (h.size < k) h.enqueue((c, n))
              else {
                val (ws, wid) = h.head
                if (c > ws || (c == ws && n < wid)) { h.dequeue(); h.enqueue((c, n)) }
              }
            }
            heaps.iterator.flatMap { case (q, h) =>
              h.iterator.map { case (c, n) => (q, n, c) }
            }
          }
          .toDF("query_id", "neighbor_id", "cos")
      }
    reduced
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      // CAST double→bigint truncates toward zero in Spark — the DuckDB
      // side spells the same truncation trunc() (its CAST rounds)
      .selectExpr("query_id", "neighbor_id", "CAST(rank AS BIGINT) AS rank",
        "CAST(cos * 1000000 AS BIGINT) AS cos_micro")
  }
}
