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

  test("gate twins: topKIvfFull and topKIvfPqRerankAll equal exact brute force") {
    // tripwire for the ann_ivf_full / ann_ivfpq_rerank_all hash gates:
    // they share the exact DuckDB oracle on THIS equality — if a
    // config or corpus change ever breaks it, fail here, not there
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(Similarity.topKExact(spark, sf(), k = 5, numQueries = 10))
    assert(rows(IvfIndex.topKIvfFull(spark, sf())) === exact)
    assert(rows(IvfIndex.topKIvfPqRerankAll(spark, sf())) === exact)
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

  test("model persistence: loaded model probes identically; underscore dirs invisible to the data scan") {
    val path = "/tmp/graft_ivfpq_model_spec"
    val built = IvfIndex.buildPq(spark, sf(), path)
    IvfIndex.saveModel(spark, path, built)
    val loaded = IvfIndex.loadModel(spark, path)
    // byte-level model round-trip
    assert(loaded.cents.map(_.cell).toSeq === built.cents.map(_.cell).toSeq)
    loaded.cents.zip(built.cents).foreach { case (a, b) => assert(a.v.toSeq === b.v.toSeq) }
    assert(loaded.cb.m === built.cb.m && loaded.cb.dsub === built.cb.dsub)
    for (j <- 0 until built.cb.m; c <- built.cb.centroids(j).indices)
      assert(loaded.cb.centroids(j)(c).toSeq === built.cb.centroids(j)(c).toSeq)
    // identical probes through the loaded model
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val a = IvfIndex.probePq(spark, path, qs, built, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = IvfIndex.probePq(spark, path, qs, loaded, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    // the data scan must not pick up _model rows
    assert(spark.read.parquet(path).columns.toSet === Set("vec_id", "v", "code", "cell"))
    // buildOrLoadPq now takes the load path (no rebuild)
    val reloaded = IvfIndex.buildOrLoadPq(spark, sf(), path)
    assert(reloaded.cents.map(_.cell).toSeq === built.cents.map(_.cell).toSeq)
  }

  test("incremental append: probes see appended vectors, layout intact, drift signal sane") {
    import spark.implicits._
    val path = "/tmp/graft_ivf_incr_index"
    val corpus = Similarity.loadVectors(spark, sf())
    // build on the first 400 vectors only, then append the rest
    val head = corpus.filter(col("vec_id") < 400)
    val tail = corpus.filter(col("vec_id") >= 400)
    val bcHold = head.collect() // force both sides split deterministically
    assert(bcHold.length === 400)
    val cents = {
      val c = Kmeans.train(head, 16, 2)
      val bc = spark.sparkContext.broadcast(c)
      head.map(r => (r.vec_id, r.v, Kmeans.nearest(r, bc.value)))
        .toDF("vec_id", "v", "cell")
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      c
    }
    val buildCohesion = Kmeans.cohesionMicro(head, cents)
    val appendCohesion = IvfIndex.append(spark, path, cents, tail)
    // same distribution → the drift signal stays in the same band
    info(s"cohesion (micro): build=$buildCohesion appended=$appendCohesion")
    assert(math.abs(appendCohesion - buildCohesion) < buildCohesion / 2)
    // layout invariant: every row still lives under a cell= directory,
    // and the index now holds the whole corpus
    val all = spark.read.parquet(path)
    assert(all.count() === 500)
    assert(all.inputFiles.forall(_.contains("/cell=")))
    // a FULL probe of the appended index equals exact brute force over
    // the whole corpus — appended vectors are really searchable
    val viaIndex = IvfIndex.probe(spark, path, queries(10), cents,
        k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex === exact)
  }

  test("adaptive probe: recall >= fixed nprobe=2, probes fewer cells than max, full-probe = exact-candidate parity") {
    val path = "/tmp/graft_ivfpq_adp_spec"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.topKExact(spark, sf(), k = 5, numQueries = 10))
    def recall(got: Map[Long, Set[Long]]): Double = exact.map { case (q, ex) =>
      got.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size

    val probedN = new Array[Int](qs.length)
    val adaptive = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = 1, probedCellsOut = Some(probedN)))
    val fixed2 = topSets(IvfIndex.probePq(spark, path, qs, idx, k = 5, nprobe = 2))
    val rAdp = recall(adaptive); val rF2 = recall(fixed2)
    info(s"adaptive recall@5 = $rAdp (fixed-2 = $rF2), probes/query = ${probedN.toVector}")
    assert(rAdp >= 0.8, "adaptive probe with default budget lost too much recall")
    assert(probedN.forall(p => p >= 2 && p <= 16))
    assert(probedN.sum < 16 * qs.length,
      "adaptive probe never stopped early — convergence rule is dead")
    // apples-to-apples vs fixed nprobe=2: at this corpus scale probePq's
    // per-partition heaps keep essentially every scanned row for the
    // exact re-rank, so give the adaptive prober the same candidate
    // budget; same probed coverage + same budget must match or beat it
    val matched = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = 1, rerank = 300))
    val rM = recall(matched)
    info(s"adaptive (matched budget) recall@5 = $rM")
    assert(rM >= rF2 - 1e-9, "matched-budget adaptive probe lost recall vs fixed nprobe=2")
    // patience = forever → probes every cell; candidate set covers the
    // corpus, so re-ranked top-k must equal exact brute force
    val full = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = Int.MaxValue,
      rerank = 600)) // rerank > corpus: exhaustive candidates
    assert(recall(full) === 1.0, "full adaptive probe with corpus-wide rerank must be exact")
  }

  test("adaptive probe batches ranks: fewer jobs at equal recall; cell-pruned rerank") {
    val path = "/tmp/graft_ivfpq_batch_spec"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSets(Similarity.topKExact(spark, sf(), k = 5, numQueries = 10))
    def recall(got: Map[Long, Set[Long]]): Double = exact.map { case (q, ex) =>
      got.get(q).map(g => (ex intersect g).size.toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    // (a) exhaustive regime — identical result set, half the jobs: with
    // patience=forever both variants probe all 16 cells and re-rank the
    // whole corpus, so outputs are equal and the job count is the only
    // difference
    val ex1 = Array(0); val ex2 = Array(0)
    val full1 = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = Int.MaxValue, rerank = 600,
      rankBatch = 1, roundsOut = Some(ex1)))
    val full2 = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = Int.MaxValue, rerank = 600,
      rankBatch = 2, roundsOut = Some(ex2)))
    info(s"exhaustive rounds: batch1=${ex1(0)} batch2=${ex2(0)}")
    assert(full1 === full2, "same probed universe must give the same top-k")
    assert(ex2(0) * 2 === ex1(0), "rank batching must halve the job count")
    // (b) early-stop regime — batching prefetches a superset per round,
    // so recall must not drop, and each job must cover >1 probed cell
    val probed2 = new Array[Int](qs.length)
    val rounds1 = Array(0); val rounds2 = Array(0)
    val one = topSets(IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = 1, rankBatch = 1, roundsOut = Some(rounds1)))
    val df2 = IvfIndex.probePqAdaptive(spark, path, qs, idx,
      k = 5, maxProbe = 16, patience = 1, rankBatch = 2,
      probedCellsOut = Some(probed2), roundsOut = Some(rounds2))
    val two = topSets(df2)
    info(s"early-stop rounds: batch1=${rounds1(0)} batch2=${rounds2(0)}; " +
      s"recall: batch1=${recall(one)} batch2=${recall(two)}; " +
      s"cells/query (batch2) = ${probed2.toVector}")
    assert(recall(two) >= recall(one) - 1e-9,
      "batched prefetch must not lose recall (it probes a superset per round)")
    assert(rounds2(0) < probed2.max,
      "each batched job must cover more than one probed cell")
    // the exact re-rank reads only the probed cells' partitions
    val plan = df2.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ IN".r.findFirstIn(plan).isDefined ||
      plan.contains("PartitionFilters: [cell"),
      s"rerank scan not partition-pruned:\n${plan.take(3000)}")
  }

  test("plain append refuses a PQ index; appendPq keeps it probe-able") {
    import spark.implicits._
    val path = "/tmp/graft_ivfpq_append_spec"
    val idx = IvfIndex.buildPq(spark, sf(), path)
    IvfIndex.saveModel(spark, path, idx)
    val extra = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10)
      .map(v => Similarity.Vec(v.vec_id + 10000L, v.v, v.nrm))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, path, idx.cents, extra)
    }
    assert(e.getMessage.contains("appendPq"))
    // the PQ-encoding append: appended exact copies of the query
    // vectors must surface as their own (cosine 1) neighbors
    IvfIndex.appendPq(spark, path, idx, extra)
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val got = IvfIndex.probePq(spark, path, qs, idx, k = 5, nprobe = 16)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qs.foreach(q => assert(got(q.vec_id).contains(q.vec_id + 10000L),
      s"appended clone of ${q.vec_id} not found: ${got(q.vec_id)}"))
  }

  test("streaming index maintenance: foreachBatch appendPq stays probe-exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = "/tmp/graft_ivfpq_stream_spec"
    val corpus = Similarity.loadVectors(spark, sf())
    // seed build on the backfill (first 300), stream the rest in
    // micro-batches through the PQ-encoding incremental append
    val idx = IvfIndex.buildPqOf(spark, corpus.filter(col("vec_id") < 300), path)
    IvfIndex.saveModel(spark, path, idx)
    val live = corpus.filter(col("vec_id") >= 300).collect().sortBy(_.vec_id)
    val input = MemoryStream[Similarity.Vec]
    val q = input.toDS().writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Similarity.Vec], _: Long) =>
        IvfIndex.appendPq(spark, path, idx, ds); ()
      }.start()
    try {
      live.grouped(80).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val all = spark.read.parquet(path)
    assert(all.count() === 500)
    assert(all.filter(col("code").isNull).count() === 0L,
      "appended rows must carry PQ codes")
    assert(all.inputFiles.forall(_.contains("/cell=")), "cell layout broken")
    // full probe + corpus-wide rerank over the maintained index equals
    // exact brute force — streamed vectors are first-class citizens
    val qs = Similarity.loadVectors(spark, sf())
      .filter(col("vec_id") < 10).collect().sortBy(_.vec_id)
      .map(v => Similarity.Vec(v.vec_id, Pq.l2normalize(v.v), 1.0))
    val got = IvfIndex.probePq(spark, path, qs, idx, k = 5, nprobe = 16, rerank = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.topKExact(spark, sf(), k = 5, numQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === exact)
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
