package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Similarity.{Vec, cosine}

/** PERSISTED IVF index: embeddings written partitioned by trained
  * cell id, so a probe reads only `nprobe` of `nCells` partition
  * directories — the IO-level pruning the in-memory IVF
  * (`Similarity.topKIvf`) cannot give. At 100 TB the scan IS the
  * cost: `cell=` partition pruning turns a full-corpus scan into
  * nprobe/nCells of it, visible in the plan's PartitionFilters and
  * in `df.inputFiles`.
  *
  * Build once (one assignment pass + partitioned write), probe many —
  * the standard index lifecycle, with the cell column doubling as the
  * Hive-style partition key.
  */
object IvfIndex {

  /** Assign every vector to its nearest trained centroid and write
    * the corpus partitioned by cell. Returns the centroids used. */
  def build(spark: SparkSession, sfDir: String, indexPath: String,
      nCells: Int = 16, iters: Int = 3): Array[Kmeans.Centroid] = {
    import spark.implicits._
    val corpus = Similarity.loadVectors(spark, sfDir)
    val cents = Kmeans.train(corpus, nCells, iters)
    val bc = spark.sparkContext.broadcast(cents)
    corpus.map(r => (r.vec_id, r.v, Kmeans.nearest(r, bc.value)))
      .toDF("vec_id", "v", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    cents
  }

  /** Top-k probe against the persisted index: the `cell IN (...)`
    * filter is a PARTITION filter — only the probed directories are
    * read. Query vectors come from the caller (tiny, broadcast). */
  def probe(spark: SparkSession, indexPath: String,
      queries: Array[Vec], cents: Array[Kmeans.Centroid],
      k: Int = 5, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val cells = queries.flatMap { q =>
      cents.map(c => (cosine(q, Vec(-1, c.v, 1.0)), c.cell))
        .sortBy { case (s, i) => (-s, i) }.take(nprobe).map(_._2)
    }.distinct.sorted
    val probed = spark.read.parquet(indexPath)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .select(col("vec_id"),
        expr("transform(v, x -> cast(x AS double))").as("v"),
        expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))").as("nrm"))
      .as[Vec]
    // same bounded per-partition heaps + final rank as the in-memory path
    Similarity.rankHits(Similarity.partialTopK(probed, queries, k), k)
  }
}
