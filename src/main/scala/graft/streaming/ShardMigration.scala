package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.Hll

/** Streaming shard-migration tracker — the live half of K9
  * (data-follows-shards, `src/shardkv/test_test.go:95-146` of the
  * reference): as the config epoch advances under a running op
  * stream, each shard's ownership can move between replica groups;
  * the state machine detects every handoff and emits a migration
  * record carrying how much state moves.
  *
  * Keyed by SHARD (10 keys — the reference's fixed NShards), state =
  * current owner + a BOUNDED tally of the shard's key population; an
  * op whose epoch maps the shard to a different gid than the previous
  * op's epoch emits `(shard, at_seq, from_gid, to_gid, n_keys)` — the
  * exact "shard S with K keys moves from group A to group B at log
  * position N" event a reconfiguration executor would act on.
  *
  * STATE BOUND: the tally is a hybrid — an exact key set up to
  * [[MaxExactKeys]] entries (hash gates and small shards stay exact),
  * converting to a fixed 4 KiB HyperLogLog past it. State per shard is
  * therefore O(min(population, MaxExactKeys) + 4 KiB) forever, however
  * many keys a 100 TB stream pushes through the shard; `n_keys`
  * degrades from exact to a ±1.6% estimate at the crossover, which is
  * all a reconfiguration planner needs from a population count.
  *
  * EVICTION (the `TestChallenge1Delete` analogue,
  * `/root/reference/src/shardkv/test_test.go:732-814`: a group must
  * DELETE state for shards it no longer owns, bounding total state):
  * the `*Evicting` variants drop the tally at every handoff, so a
  * state row never retains a previous owner's population — `n_keys`
  * then counts the OUTGOING OWNER'S ERA only, which is exactly the
  * state that group hands off and deletes.
  *
  * Ordering contract matches KvStream: seq order within a batch,
  * per-shard in-order delivery across batches (the reference's log
  * order). */
object ShardMigration {

  final case class ShardOp(shard: Int, seq: Long, key: String, gid: Long)

  /** State-store row: owner + hybrid tally (`exact` holds the keys
    * while small; `regs` is the HLL after conversion, at which point
    * `exact` is empty). */
  final case class ShardState(gid: Long, exact: Seq[String], regs: Array[Byte])

  final case class Migration(shard: Int, at_seq: Long, from_gid: Long,
      to_gid: Long, n_keys: Long)

  /** Exact-set size above which a tally converts to the HLL. */
  val MaxExactKeys = 1024

  /** Routed ops (graft.kv.Kv.routeOps output) → typed shard stream. */
  def shardOps(routed: DataFrame): Dataset[ShardOp] = {
    import routed.sparkSession.implicits._
    routed.select(col("shard").cast("int"), col("seq"), col("key"),
        col("gid").cast("long"))
      .as[ShardOp]
  }

  /** Mutable per-group walker — ONE definition of the fold, shared by
    * the streaming machine (micro-batch-bounded buffer) and the batch
    * sorted-group scan. `evict` selects the Challenge1Delete-style
    * reset-on-handoff semantics. */
  private[streaming] final class Walker(evict: Boolean) {
    private var gid = -1L
    private var set: scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty
    private var regs: Array[Byte] = null

    def load(st: ShardState): Unit = {
      gid = st.gid
      // clone: the walker mutates regs in place, and the segmented
      // path hands out seeds via broadcast — a task retry (or local
      // mode's same-JVM broadcast) must never see a half-folded seed
      regs = if (st.regs == null) null else st.regs.clone()
      set = if (regs == null) scala.collection.mutable.Set.from(st.exact)
            else scala.collection.mutable.Set.empty
    }

    def snapshot: ShardState =
      ShardState(gid, if (regs == null) set.toSeq else Seq.empty, regs)

    private def count: Long =
      if (regs == null) set.size.toLong else Hll.estimate(regs)

    private def addKey(k: String): Unit =
      if (regs != null) Hll.add(regs, Hll.hashString(k))
      else if (!set.contains(k)) {
        if (set.size < MaxExactKeys) set += k
        else { // crossover: fold the exact set into a fresh sketch
          regs = Hll.empty
          set.foreach(s => Hll.add(regs, Hll.hashString(s)))
          Hll.add(regs, Hll.hashString(k))
          set = scala.collection.mutable.Set.empty
        }
      }

    /** Advance by one op; the population is read BEFORE the op's own
      * key lands (the handoff carries what the old owner held). */
    def onOp(shard: Int, o: ShardOp): Option[Migration] = {
      val mig =
        if (gid != o.gid && gid != -1L) {
          val m = Some(Migration(shard, o.seq, gid, o.gid, count))
          if (evict) { // old owner's state deleted at handoff
            set = scala.collection.mutable.Set.empty
            regs = null
          }
          m
        } else None
      gid = o.gid
      addKey(o.key)
      mig
    }
  }

  private def streamMachine(ops: Dataset[ShardOp],
      evict: Boolean): Dataset[Migration] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, Migration](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[ShardOp], state) =>
          val w = new Walker(evict)
          w.load(state.getOption.getOrElse(ShardState(-1L, Seq.empty, null)))
          val out = Seq.newBuilder[Migration]
          batch.toSeq.sortBy(_.seq).foreach(o => w.onOp(shard, o).foreach(out += _))
          state.update(w.snapshot)
          out.result().iterator
      }
  }

  private def batchMachine(ops: Dataset[ShardOp],
      evict: Boolean): Dataset[Migration] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapSortedGroups(col("seq")) { (shard, it) =>
        val w = new Walker(evict)
        w.load(ShardState(-1L, Seq.empty, null))
        it.flatMap(o => w.onOp(shard, o).iterator)
      }
  }

  /** Streaming state machine (true streams: the sort is bounded by a
    * micro-batch; batch executions go through [[migrationsBatch]]). */
  def migrations(ops: Dataset[ShardOp]): Dataset[Migration] =
    streamMachine(ops, evict = false)

  /** Streaming machine with state eviction on handoff. */
  def migrationsEvicting(ops: Dataset[ShardOp]): Dataset[Migration] =
    streamMachine(ops, evict = true)

  /** BATCH execution of the same machine via `flatMapSortedGroups` —
    * the shuffle delivers each shard's ops already seq-ordered, so
    * the walk holds only the current owner + bounded tally, never the
    * whole log (in batch mode one "group" is the shard's entire
    * history; the micro-batch path's toSeq.sortBy would buffer it).
    * Differential vs streaming + window oracle in ShardMigrationSpec. */
  def migrationsBatch(ops: Dataset[ShardOp]): Dataset[Migration] =
    batchMachine(ops, evict = false)

  /** Batch execution of the evicting machine — `k_migrations_evict`'s
    * per-era key counts are exact SQL (windows over era boundaries),
    * so this variant carries its own hash gate. */
  def migrationsEvictingBatch(ops: Dataset[ShardOp]): Dataset[Migration] =
    batchMachine(ops, evict = true)

  // ------------------------------------------------------------------
  // Segmented (two-level) batch fold — removes the NShards(=10)-task
  // wall-clock ceiling of [[batchMachine]]. The reference fixes the
  // shard count, so a per-shard sorted-group scan can never use more
  // than 10 tasks however large the cluster: at a 100 TB log that is
  // the suite's bottleneck. The walker state is mergeable (owner gid +
  // a tally whose two forms both merge: exact sets by union, HLL
  // registers by max), so the classic segmented-scan shape applies:
  //   pass 1  range-partition each shard's log by seq and fold every
  //           (shard, range) independently to a boundary summary;
  //   stitch  prefix-merge the (≤ NShards × ranges, tiny) summaries in
  //           seq order into a seed state per range;
  //   pass 2  re-fold each range from its stitched seed, emitting
  //           migrations.
  // Wall-clock drops from O(log/NShards) to O(log/(NShards·ranges));
  // both passes spread over shards × ranges tasks. Equality with the
  // sequential walker is exact, not approximate: HLL registers are a
  // pure function of the distinct-key set (register = max over key
  // hashes, order-free), and the exact→HLL crossover rule is the same
  // on both paths (sketch iff distinct keys > MaxExactKeys) — proven
  // by the differential in ShardMigrationSpec across the crossover.
  // ------------------------------------------------------------------

  private[streaming] final case class RangedOp(
      shard: Int, range: Int, seq: Long, key: String, gid: Long)

  /** Per-(shard, range) boundary summary from the neutral-seed fold:
    * `changed` records whether any handoff happened INSIDE the range
    * (seed-independent — gid comparisons between in-range neighbours);
    * (exact, regs) is the walker tally at range end under that seed. */
  private[streaming] final case class RangeSummary(shard: Int, range: Int,
      firstGid: Long, lastGid: Long, changed: Boolean,
      exact: Seq[String], regs: Array[Byte])

  /** Uniform-width seq bucketing: one cheap min/max agg, then a pure
    * map — no per-shard window sort (which would reintroduce the very
    * 10-task ceiling this path removes). Log seqs are dense positions,
    * so uniform widths are balanced by construction. */
  private[streaming] def rangedBySeq(ops: Dataset[ShardOp],
      ranges: Int): Dataset[RangedOp] = {
    import ops.sparkSession.implicits._
    val bounds = ops.agg(min(col("seq")), max(col("seq"))).head()
    if (bounds.isNullAt(0)) ops.sparkSession.emptyDataset[RangedOp]
    else {
      val mn = bounds.getLong(0)
      val width = math.max(1L, (bounds.getLong(1) - mn) / math.max(1, ranges) + 1)
      ops.map(o => RangedOp(o.shard, ((o.seq - mn) / width).toInt, o.seq, o.key, o.gid))
    }
  }

  /** Merge two walker tallies under the sequential crossover rule:
    * exact∪exact stays exact up to [[MaxExactKeys]] then folds into a
    * sketch; any HLL side forces an HLL union (register-wise max —
    * lossless, so the segmented estimate equals the sequential one). */
  private[streaming] def mergeTally(aExact: Seq[String], aRegs: Array[Byte],
      bExact: Seq[String], bRegs: Array[Byte]): (Seq[String], Array[Byte]) =
    if (aRegs == null && bRegs == null) {
      val u = aExact.toSet ++ bExact
      if (u.size <= MaxExactKeys) (u.toSeq, null)
      else {
        val regs = Hll.empty
        u.foreach(k => Hll.add(regs, Hll.hashString(k)))
        (Seq.empty, regs)
      }
    } else {
      var regs = Hll.empty
      def fold(e: Seq[String], r: Array[Byte]): Unit =
        if (r == null) e.foreach(k => Hll.add(regs, Hll.hashString(k)))
        else regs = Hll.merge(regs, r) // the audited union rule, not a copy
      fold(aExact, aRegs); fold(bExact, bRegs)
      (Seq.empty, regs)
    }

  private def segmentedMachine(ops: Dataset[ShardOp], evict: Boolean,
      ranges: Int): Dataset[Migration] = {
    import ops.sparkSession.implicits._
    // three consumers of the op source (min/max bounds, pass 1, pass 2)
    // — materialize the routed log once; the checkpoint write is one
    // log-sized spill, cheaper than recomputing the route per pass and
    // lineage-free for task retries
    val ranged = rangedBySeq(ops.localCheckpoint(), ranges)

    // pass 1: neutral-seed fold of every range (shards × ranges tasks;
    // summaries ≤ NShards × ranges rows, each ≤ max(exact set, 4 KiB))
    val summaries = SegmentedFold.summarize(ranged) { (shard, range, it) =>
      val w = new Walker(evict)
      w.load(ShardState(-1L, Seq.empty, null))
      var firstGid = -1L
      var first = true
      var changed = false
      it.foreach { r =>
        if (first) { firstGid = r.gid; first = false }
        if (w.onOp(shard, ShardOp(r.shard, r.seq, r.key, r.gid)).isDefined)
          changed = true
      }
      val st = w.snapshot
      RangeSummary(shard, range, firstGid, st.gid, changed, st.exact, st.regs)
    }

    // stitch: prefix-merge summaries per shard in range order. With
    // eviction, a handoff inside the range (or at its first op, seen
    // from the seed gid) resets the tally, so the range's own tail
    // tally IS the outgoing state; otherwise tallies accumulate.
    val seeds = SegmentedFold.stitchSeeds(summaries,
        (s: RangeSummary) => s.shard, (s: RangeSummary) => s.range,
        ShardState(-1L, Seq.empty, null)) { (seed, s) =>
      val handoffAtEntry = seed.gid != -1L && seed.gid != s.firstGid
      val (e2, r2) =
        if (evict && (s.changed || handoffAtEntry)) (s.exact, s.regs)
        else mergeTally(seed.exact, seed.regs, s.exact, s.regs)
      ShardState(s.lastGid, e2, r2)
    }

    // pass 2: re-fold each range from its stitched seed
    SegmentedFold.refold(ranged, seeds) { (shard, _, seed, it) =>
      val w = new Walker(evict)
      w.load(seed)
      it.flatMap(r => w.onOp(shard, ShardOp(r.shard, r.seq, r.key, r.gid)).iterator)
    }
  }

  /** Segmented batch execution — same records as [[migrationsBatch]]
    * (differential-pinned), wall-clock O(log/(NShards·ranges)) instead
    * of O(log/NShards). The gate surface of `k_migrations`. */
  def migrationsBatchSegmented(ops: Dataset[ShardOp],
      ranges: Int = 32): Dataset[Migration] =
    segmentedMachine(ops, evict = false, ranges)

  /** Segmented evicting execution — gate surface of `k_migrations_evict`. */
  def migrationsEvictingBatchSegmented(ops: Dataset[ShardOp],
      ranges: Int = 32): Dataset[Migration] =
    segmentedMachine(ops, evict = true, ranges)

  /** Batch oracle: the same handoff walk as a window fold (lag over
    * per-shard seq order), for differential testing. */
  def migrationsBatchOracle(routed: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("seq"))
    routed
      .withColumn("prev_gid", lag(col("gid"), 1).over(w))
      .withColumn("n_keys", size(collect_set(col("key")).over(
        w.rowsBetween(Window.unboundedPreceding, -1))).cast("long"))
      .filter(col("prev_gid").isNotNull && col("prev_gid") =!= col("gid"))
      .select(col("shard").cast("int").as("shard"), col("seq").as("at_seq"),
        col("prev_gid").cast("long").as("from_gid"),
        col("gid").cast("long").as("to_gid"), col("n_keys"))
  }
}
