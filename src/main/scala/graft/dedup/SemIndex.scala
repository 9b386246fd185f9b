package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.{CentroidIndex, Kmeans, Similarity}
import graft.sim.Kmeans.Centroid
import graft.sim.Similarity.Vec

/** PERSISTED semantic-dedup index — [[SemDedup]]'s build-once/
  * probe-many lifecycle twin (the [[LshIndex]] pattern, over
  * embeddings instead of shingles). A 100 TB corpus is semantically
  * deduplicated ONCE; each new crawl batch afterwards is checked
  * against the accepted corpus WITHOUT re-clustering or re-comparing
  * the corpus against itself.
  *
  * Index storage (parquet under one path):
  *  - `cents`: the trained cluster centroids (cell, v) — the corpus
  *    partitioning the whole scheme prunes with;
  *  - `members`: one row per ACCEPTED vector (vec_id, cell,
  *    cent_sim) — 20 bytes/vector, no embedding stored (vectors are
  *    re-fetched from the corpus table at probe time, the same
  *    fetch-for-verification shape as [[LshIndex.probe]]).
  *
  * Probe semantics (incremental flavor of the SemDeDup rule): index
  * members are ALREADY KEPT — a batch vector is dropped iff some
  * index member of its cell is τ-close, or some HIGHER-PRIORITY batch
  * member of its cell is ((cent_sim, vec_id) ascending, the
  * [[SemDedup]] priority). Index-internal pairs are never generated:
  * a tiny batch against a huge index costs the batch's cell lookups,
  * not the corpus' own quadratic comparisons.
  *
  * Scale posture: probe joins index members to corpus vectors only
  * for cells the batch actually touches (broadcast semi-join on the
  * batch's cell set); per-task work is Σ|cell ∩ touched|·|batch
  * cell|. Growing k with corpus size bounds cell sizes exactly as in
  * the one-shot operator. `append` assigns new accepted vectors under
  * the FIXED stored centroids (no retrain — codebook drift is the
  * retrain-signal concern of `streaming.IndexMaintenance`).
  */
object SemIndex {

  /** Basename of the corpus dir of the last gate run — binds the
    * oracle glob ([[SemDedup.lastBase]] pattern). */
  @volatile var lastBase: String = "sf0.01"

  def centsDumpPath(base: String): String =
    graft.core.SideDump.path("semidx_cents", base)

  private def writeCents(spark: SparkSession, cents: Array[Centroid],
      path: String): Unit = {
    import spark.implicits._
    cents.toSeq.map(c => (c.cell, c.v.toSeq)).toDF("cell", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cents")
  }

  private def loadCents(spark: SparkSession, path: String): Array[Centroid] =
    spark.read.parquet(s"$path/cents").collect()
      .map(r => Centroid(r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_.cell)

  /** (vec_id, cell, cent_sim) under `cents` — the same argmax-cosine
    * + lowest-cell assignment as every other trainer surface. */
  private def assign(vecs: Dataset[Vec],
      cents: Array[Centroid]): Dataset[(Long, Int, Double)] = {
    import vecs.sparkSession.implicits._
    val bc = vecs.sparkSession.sparkContext.broadcast(CentroidIndex.build(cents))
    vecs.map { r =>
      val (cell, sim) = SemDedup.assignCell(bc.value, r)
      (r.vec_id, cell, sim)
    }
  }

  /** Build: train on the accepted slice, persist centroids + member
    * assignment. `trainer` is pluggable for corpora whose id space
    * defeats [[Kmeans.train]]'s id-value seeding (chunk vectors seed
    * via [[Kmeans.trainOrdered]]). */
  def build(vecs: Dataset[Vec], path: String, k: Int = 16,
      iters: Int = 3,
      trainer: (Dataset[Vec], Int, Int) => Array[Centroid] = Kmeans.train): Unit = {
    val spark = vecs.sparkSession
    val cents = trainer(vecs, k, iters)
    writeCents(spark, cents, path)
    assign(vecs, cents).toDF("vec_id", "cell", "cent_sim")
      .write.mode("overwrite").parquet(s"$path/members")
  }

  /** Incrementally accept another batch of vectors into the index
    * (assignment under the FIXED stored centroids; parquet append —
    * no rebuild, no read-back of existing members). */
  def append(spark: SparkSession, path: String, vecs: Dataset[Vec]): Unit =
    assign(vecs, loadCents(spark, path)).toDF("vec_id", "cell", "cent_sim")
      .write.mode("append").parquet(s"$path/members")

  /** Probe a batch: (vec_id, cell, cent_sim_micro, kept) per batch
    * vector, batch rows only. Corpus vectors (the index members'
    * re-fetch source) come from the `sfDir` embeddings table. */
  def probe(spark: SparkSession, sfDir: String, path: String,
      batch: Dataset[Vec], tau: Double = 0.45): DataFrame =
    probeFrom(spark, Similarity.loadVectors(spark, sfDir), path, batch, tau)

  /** [[probe]] with a PLUGGABLE corpus-vector source — the fetch-for-
    * verification side generalized the way [[graft.dedup.Dedup
    * .leakSafeSplitFrom]] generalizes its pair source, so index
    * members may live in any vector frame (e.g. chunk-level vectors
    * from the embedder seam, [[graft.streaming.SemStream]]) rather
    * than only the corpus `embeddings` table. */
  def probeFrom(spark: SparkSession, corpus: Dataset[Vec], path: String,
      batch: Dataset[Vec], tau: Double = 0.45): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      CentroidIndex.build(loadCents(spark, path)))
    probeAssigned(spark, assignBatch(batch, bc),
      spark.read.parquet(s"$path/members"), corpus, tau)
  }

  /** (cell, sim, vec, is_batch) — localCheckpoint, not cache(): both
    * the touched-cells side and the union side read it (without it
    * every probe would run the batch assignment twice), but a cache()
    * entry would pin one batch copy in executor storage PER PROBE
    * CALL for the life of the session; checkpoint blocks are
    * reclaimed by the ContextCleaner once the plan is unreferenced. */
  private def assignBatch(batch: Dataset[Vec],
      bc: org.apache.spark.broadcast.Broadcast[CentroidIndex])
      : Dataset[(Int, Double, Vec, Boolean)] = {
    import batch.sparkSession.implicits._
    batch.map { r =>
      val (cell, sim) = SemDedup.assignCell(bc.value, r)
      (cell, sim, r, true)
    }.localCheckpoint()
  }

  /** The probe body over an ALREADY-ASSIGNED batch and an explicit
    * member frame — shared by the per-call [[probeFrom]] (members
    * re-read from the index path each probe) and the amortized
    * [[ProbeSession]] (members carried forward across a batch
    * sequence); SemStreamSpec pins the two equal through the gate's
    * foreachBatch twin. */
  private def probeAssigned(spark: SparkSession,
      batchAsg: Dataset[(Int, Double, Vec, Boolean)], membersAll: DataFrame,
      corpus: Dataset[Vec], tau: Double): DataFrame = {
    import spark.implicits._
    // index members of touched cells only, vectors re-fetched from
    // the corpus table (broadcast the batch's cell set — tiny)
    val touched = batchAsg.map(_._1).distinct()
    val members = membersAll
      .join(broadcast(touched.toDF("cell")), "cell")
    val indexAsg = members
      .join(corpus.toDF("vec_id", "v", "nrm"), "vec_id")
      .select(col("cell"), col("cent_sim"), col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Double, Long, Array[Double], Double)]
      .map { case (cell, sim, id, v, nrm) => (cell, sim, Vec(id, v, nrm), false) }
    batchAsg.union(indexAsg)
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val all = it.toArray
        val idxMembers = all.filter(!_._4).map(_._3)
        // batch keep-priority order: (cent_sim, vec_id) ascending
        val bat = all.filter(_._4).sortBy { case (_, sim, r, _) => (sim, r.vec_id) }
        val dropped = new Array[Boolean](bat.length)
        var i = 0
        while (i < bat.length) {
          val x = bat(i)._3
          var hit = false
          var m = 0
          while (m < idxMembers.length && !hit) {
            if (Similarity.cosine(x, idxMembers(m)) >= tau) hit = true
            m += 1
          }
          var j = 0
          while (j < i && !hit) {
            if (Similarity.cosine(x, bat(j)._3) >= tau) hit = true
            j += 1
          }
          dropped(i) = hit
          i += 1
        }
        bat.iterator.zipWithIndex.map { case ((_, sim, r, _), m) =>
          (r.vec_id, cell, sim, !dropped(m))
        }
      }
      .toDF("vec_id", "cell", "cent_sim", "kept")
      .selectExpr("vec_id", "cell",
        "CAST(round(cent_sim * 1000000) AS BIGINT) AS cent_sim_micro", "kept")
  }

  /** Gate surface: index = corpus slice `vec_id % 10 != 0` (built
    * once per session), batch = `vec_id % 10 == 0` probed against it
    * — the [[LshIndex.dedupIncremental]] split. Centroids are
    * side-dumped every call (run-scoped, cheap) so the oracle always
    * reads THIS run's codebook even when the build was skipped. */
  def dedupSemanticIncremental(spark: SparkSession, sfDir: String,
      tau: Double = 0.45): DataFrame = {
    val path = graft.core.SessionScratch.path(spark, sfDir, "graft_semidx")
    val all = Similarity.loadVectors(spark, sfDir)
    graft.core.SessionScratch.buildOnce(spark, path,
      marker = "members/_SUCCESS") {
      build(all.filter(v => v.vec_id % 10 != 0), path)
    }
    val base = new java.io.File(sfDir).getName
    graft.core.SideDump.write(
      spark.read.parquet(s"$path/cents"), "semidx_cents", base)
    lastBase = base
    probe(spark, sfDir, path, all.filter(v => v.vec_id % 10 == 0), tau)
  }

  /** Amortized probe-then-append loop over a built index — the
    * sequential-micro-batch shape ([[graft.streaming.SemStream]]'s
    * gate, a crawl loop's per-fetch dedup) re-pays three floors per
    * batch when driven through the per-call surface: a cents parquet
    * read + collect in the probe, ANOTHER in the append, a full
    * re-read of the GROWING members parquet, and a re-assignment of
    * the survivors the probe already assigned. At n batches that is
    * O(n) index re-reads of an index only ever extended by known
    * rows. A session loads the centroids once (they are FIXED after
    * build — append never retrains), carries the member frame forward
    * (checkpointed union per batch), and reuses the probe's own batch
    * assignment for the append. The parquet index at `path` is still
    * appended every batch — it remains the durable, authoritative
    * copy (a new session starts from it); only the REREADS are
    * elided. Equality with the per-call surface is pinned by
    * SemStreamSpec's foreachBatch twin, which drives
    * [[graft.streaming.SemStream.probeAppendBatch]] (per-call,
    * path-based) against the session-driven gate replay. */
  final class ProbeSession(spark: SparkSession, path: String,
      corpus: Dataset[Vec]) {
    import spark.implicits._
    private val bc = spark.sparkContext.broadcast(
      CentroidIndex.build(loadCents(spark, path)))
    // same rows as $path/members at every point in the sequence:
    // seeded from the built index, extended by exactly the rows each
    // append writes
    private var members: DataFrame =
      spark.read.parquet(s"$path/members").localCheckpoint()

    /** Probe `batch`, materialize the verdicts, then append the kept
      * survivors to the index (parquet AND the carried frame). Same
      * eager-before-append discipline as the per-call body: the
      * verdicts are fixed before the member set they were judged
      * against changes. */
    def probeAppend(batch: Dataset[Vec], tau: Double): DataFrame = {
      val batchAsg = assignBatch(batch, bc)
      val out = graft.core.Materialize.frame(
        probeAssigned(spark, batchAsg, members, corpus, tau),
        "semstream_probe")
      // the survivors' (vec_id, cell, cent_sim) rows are the probe's
      // own assignment — identical values to what a re-assignment
      // under the same fixed centroids would produce
      val keptRows = batchAsg
        .map { case (cell, sim, r, _) => (r.vec_id, cell, sim) }
        .toDF("vec_id", "cell", "cent_sim")
        .join(out.filter(col("kept")).select("vec_id"), Seq("vec_id"),
          "left_semi")
        .localCheckpoint()
      keptRows.write.mode("append").parquet(s"$path/members")
      // the carried member set is a UNION OF CHECKPOINTS — no
      // re-checkpoint of the union itself (r18): that was an O(index)
      // copy job per batch; the pieces are each materialized exactly
      // once and the union is pure lineage concat. (Dropping the
      // keptRows checkpoint as well was measured WORSE — the growing
      // un-materialized lineage replans and re-executes per batch.)
      members = members.unionByName(keptRows)
      out
    }
  }
}
