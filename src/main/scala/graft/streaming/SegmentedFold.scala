package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col
import graft.streaming.ShardMigration.RangedOp

/** The SEGMENTED-FOLD primitive — the two-level scan shape that
  * removes fixed-key-count task ceilings from ordered per-key folds.
  *
  * A per-key sorted-group walk (`groupByKey(key).flatMapSortedGroups`)
  * can never use more tasks than there are keys: with the reference's
  * fixed NShards=10, a 100 TB log folds on 10 tasks however large the
  * cluster. When the walk's state is either (a) mergeable (so a prefix
  * of the log can be summarized and stitched — [[ShardMigration]]'s
  * owner + tally) or (b) reconstructible from a compact global view
  * (so per-range scans only need to surface change points —
  * [[ShardServe]]'s handoff windows), the fold splits into:
  *
  *   1. [[summarize]] — fold every (key, seq-range) partition
  *      independently with a NEUTRAL seed to one summary row
  *      (keys × ranges parallel tasks), collected to the driver
  *      (≤ keys × ranges rows, each bounded by construction);
  *   2. [[stitchSeeds]] / [[stitchFinal]] — per key, an ordered
  *      driver-side prefix-merge of the summaries: O(keys × ranges)
  *      serial work on rows that carry NO per-op data;
  *   3. [[refold]] — re-fold each (key, range) from its stitched,
  *      broadcast seed, emitting the real outputs (again keys × ranges
  *      tasks) — or, when outputs are derivable map-only from the
  *      stitched view (ShardServe), the caller's own narrow passes.
  *
  * Wall-clock drops from O(log/keys) to O(log/(keys·ranges)); equality
  * with the sequential walk is exact whenever the stitch reproduces
  * the walker's state at each range entry — each user pins that with a
  * differential spec against its sequential twin
  * (ShardMigrationSpec / ShardServeSpec).
  *
  * Users: [[ShardMigration.migrationsBatchSegmented]] (summarize +
  * stitchSeeds + refold), [[ShardServe.serveBatchSegmented]]
  * (summarize + stitchFinal + map-only emission). The same discipline
  * at expression level — carry a boundary overlap instead of a seed —
  * is [[graft.dedup.SuffixDedup.chunkedLeads]].
  */
object SegmentedFold {

  /** Pass 1: fold every (shard, range) group of `ranged` in seq order
    * to ONE summary row, collected to the driver. `f` must produce a
    * bounded summary (never per-op data) — the collect is
    * keys × ranges rows by construction. */
  def summarize[S: Encoder](ranged: Dataset[RangedOp])(
      f: (Int, Int, Iterator[RangedOp]) => S): Array[S] = {
    import ranged.sparkSession.implicits._
    ranged.groupByKey(r => (r.shard, r.range))
      .flatMapSortedGroups(col("seq")) { case ((shard, range), it) =>
        Iterator.single(f(shard, range, it))
      }.collect()
  }

  /** Per-key ordered prefix-merge producing the seed each range's
    * re-fold starts from: visiting summaries in range order, the seed
    * BEFORE advancing over a summary is that range's entry state. */
  def stitchSeeds[S, Seed](summaries: Array[S], keyOf: S => Int,
      rangeOf: S => Int, neutral: Seed)(
      advance: (Seed, S) => Seed): Map[(Int, Int), Seed] = {
    val out = Map.newBuilder[(Int, Int), Seed]
    summaries.groupBy(keyOf).foreach { case (k, ss) =>
      var seed = neutral
      ss.sortBy(rangeOf).foreach { s =>
        out += ((k, rangeOf(s)) -> seed)
        seed = advance(seed, s)
      }
    }
    out.result()
  }

  /** Per-key ordered fold of the summaries to one FINAL value per key
    * — for users whose second pass needs a global per-key view (e.g.
    * coalesced handoff windows) rather than per-range seeds. */
  def stitchFinal[S, A](summaries: Array[S], keyOf: S => Int,
      rangeOf: S => Int, neutral: A)(
      advance: (A, S) => A): Map[Int, A] =
    summaries.groupBy(keyOf).map { case (k, ss) =>
      k -> ss.sortBy(rangeOf).foldLeft(neutral)(advance)
    }

  /** Pass 2: re-fold each (shard, range) group in seq order from its
    * stitched seed. Seeds are broadcast once; groups absent from the
    * map (no pass-1 summary ⇒ no ops) cannot occur by construction. */
  def refold[Seed, Out: Encoder](ranged: Dataset[RangedOp],
      seeds: Map[(Int, Int), Seed])(
      f: (Int, Int, Seed, Iterator[RangedOp]) => Iterator[Out]): Dataset[Out] = {
    import ranged.sparkSession.implicits._
    val b = ranged.sparkSession.sparkContext.broadcast(seeds)
    ranged.groupByKey(r => (r.shard, r.range))
      .flatMapSortedGroups(col("seq")) { case ((shard, range), it) =>
        f(shard, range, b.value((shard, range)), it)
      }
  }
}
