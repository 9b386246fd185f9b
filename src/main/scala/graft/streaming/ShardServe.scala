package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.ShardMigration.ShardOp

/** Availability during reconfiguration — the Challenge2 twin
  * (`/root/reference/src/shardkv/test_test.go:816-938`: while a shard
  * handoff is in flight, ops on shards NOT involved must keep being
  * served; only the migrating shard's ops may wait).
  *
  * The model: when a shard's owner changes at log position `h`, the
  * shard is "in transfer" for the next `holdSeqs` log positions — ops
  * on it inside `[h, h+holdSeqs)` are DEFERRED (buffered in state, in
  * seq order) and applied the moment the shard catches up (the first
  * of its ops at or past `h+holdSeqs`, or the hold boundary itself if
  * the log ends first). Every op on every other shard applies at its
  * own seq, in the same round it arrives — the state machine is keyed
  * by shard, so one shard's transfer cannot stall another's progress,
  * which is exactly the property the reference test asserts.
  *
  * Output (shard, seq, deferred, applied_at) is a pure function of the
  * routed log, so the whole timing model is RE-DERIVED in SQL by the
  * `k_serve` oracle (handoff windows from lag, trigger points from a
  * min-join) — a hash gate, not a rows-only check.
  *
  * State per shard is O(ops inside one hold window) — bounded by
  * construction, and empty outside transfers. Overlapping reconfigs
  * (a second owner change inside an open hold window) coalesce into
  * the first window; the gate fixture has none (corpus handoffs are
  * ≥100 seqs apart vs the default 50-seq hold).
  */
object ShardServe {

  final case class Applied(shard: Int, seq: Long, deferred: Int, applied_at: Long)

  final case class ServeState(gid: Long, holdUntil: Long, buf: Seq[Long])

  /** One fold definition for both execution modes. */
  private final class Walker(holdSeqs: Long) {
    private var gid = -1L
    private var holdUntil = -1L
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]

    def load(st: ServeState): Unit = {
      gid = st.gid; holdUntil = st.holdUntil
      buf.clear(); buf ++= st.buf
    }

    def snapshot: ServeState = ServeState(gid, holdUntil, buf.toSeq)

    def onOp(o: ShardOp): Iterator[Applied] = {
      val out = Seq.newBuilder[Applied]
      if (holdUntil >= 0 && o.seq >= holdUntil) {
        // the shard caught up: apply the transfer window's ops now
        buf.foreach(s => out += Applied(o.shard, s, 1, o.seq))
        buf.clear()
        holdUntil = -1L
      }
      if (holdUntil < 0 && gid != -1L && o.gid != gid)
        holdUntil = o.seq + holdSeqs // handoff begins at this op
      gid = o.gid
      if (holdUntil >= 0 && o.seq < holdUntil) buf += o.seq
      else out += Applied(o.shard, o.seq, 0, o.seq)
      out.result().iterator
    }

    /** End-of-log flush (batch mode): anything still in transfer
      * applies at the hold boundary. */
    def finish(shard: Int): Iterator[Applied] = {
      val out = buf.toSeq.map(s => Applied(shard, s, 1, holdUntil))
      buf.clear()
      out.iterator
    }
  }

  /** Streaming machine: unaffected shards emit in the batch their ops
    * arrive; a transferring shard's buffered ops emit in the batch its
    * catch-up op arrives. An unbounded stream has no end-of-log, so
    * ops inside a hold window the stream never advances past stay
    * buffered — only the BATCH twins flush at the hold boundary when
    * the log ends (ShardServeSpec's differential appends per-shard
    * sentinels to force both modes through the same final flush). */
  def serve(ops: Dataset[ShardOp], holdSeqs: Long = 50L): Dataset[Applied] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapGroupsWithState[ServeState, Applied](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, batch: Iterator[ShardOp], state) =>
          val w = new Walker(holdSeqs)
          w.load(state.getOption.getOrElse(ServeState(-1L, -1L, Seq.empty)))
          val out = batch.toSeq.sortBy(_.seq).flatMap(o => w.onOp(o))
          state.update(w.snapshot)
          out.iterator
      }
  }

  /** Batch twin (sorted-group scan; differential baseline for the
    * segmented gate path below). */
  def serveBatch(ops: Dataset[ShardOp], holdSeqs: Long = 50L): Dataset[Applied] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapSortedGroups(col("seq")) { (shard, it) =>
        val w = new Walker(holdSeqs)
        w.load(ServeState(-1L, -1L, Seq.empty))
        it.flatMap(o => w.onOp(o)) ++ w.finish(shard)
      }
  }

  /** Segmented batch execution — the defer/apply schedule is a pure
    * function of the shard's EFFECTIVE handoff windows, so instead of
    * walking each shard's whole log on one task (the [[serveBatch]]
    * shape: ≤ NShards=10 tasks at any cluster size) it is derived in
    * three fully-parallel passes plus a reconfiguration-sized stitch:
    *
    *   1. per (shard, seq-range) sorted scan (shards × ranges tasks)
    *      finds RAW gid-change points — comparisons between in-range
    *      neighbours plus range-boundary pairs from the (tiny) summary
    *      rows; gid changes are seed-independent because the walker
    *      always tracks the previous op's gid.
    *   2. stitch: greedy window coalescing per shard — a change inside
    *      an open hold window is absorbed (exactly the walker's
    *      `holdUntil` guard), one opening at or past it starts a new
    *      window. Serial work and driver state are O(#reconfigurations)
    *      — config changes, not ops — then broadcast.
    *   3. map-only passes over the log: each op binary-searches its
    *      shard's windows; the min op-seq at or past a window's end is
    *      that window's catch-up point (`applied_at` of its deferred
    *      ops — window end if the log ends first, the walker's
    *      end-of-log flush); every other op applies at its own seq.
    *
    * Exactly [[serveBatch]]'s records (differential in ShardServeSpec,
    * including handoff-at-catch-up and log-ends-in-window edges), with
    * wall-clock O(log/(NShards·ranges) + #reconfigs). Gate surface of
    * `k_serve`. */
  def serveBatchSegmented(ops: Dataset[ShardOp], holdSeqs: Long = 50L,
      ranges: Int = 32): Dataset[Applied] = {
    import ops.sparkSession.implicits._
    // four consumers of the op source (bounds, change scan, catch-up
    // scan, emission pass) — materialize the routed log once
    val opsM = ops.localCheckpoint()
    val ranged = ShardMigration.rangedBySeq(opsM, ranges)

    // pass 1: raw change points per range + boundary gids
    // (summaries are O(#reconfigurations + shards × ranges))
    val scans = SegmentedFold.summarize(ranged) { (shard, range, it) =>
      var first = true
      var firstSeq = -1L; var firstGid = -1L
      var prevGid = -1L
      val changes = Seq.newBuilder[Long]
      it.foreach { r =>
        if (first) { firstSeq = r.seq; firstGid = r.gid; first = false }
        // prevGid != -1: the walker treats -1 as "unassigned" and
        // opens no window when leaving it (its gid != -1L guard);
        // the raw comparison must suppress the same transitions or
        // the twins diverge on logs carrying literal -1 gids
        else if (r.gid != prevGid && prevGid != -1L) changes += r.seq
        prevGid = r.gid
      }
      (shard, range, firstSeq, firstGid, prevGid, changes.result())
    }

    // stitch: per shard, boundary changes + internal changes in seq
    // order collected, then greedily coalesced into effective hold
    // windows (a change inside an open window is absorbed — exactly
    // the walker's holdUntil guard)
    val windows: Map[Int, Array[(Long, Long)]] =
      SegmentedFold.stitchFinal(scans,
          (s: (Int, Int, Long, Long, Long, Seq[Long])) => s._1,
          (s: (Int, Int, Long, Long, Long, Seq[Long])) => s._2,
          (-1L, Vector.empty[Long])) {
        case ((gid, raw), (_, _, fSeq, fGid, lGid, changes)) =>
          val withBoundary =
            if (gid != -1L && fGid != gid) raw :+ fSeq else raw
          (lGid, withBoundary ++ changes)
      }.map { case (shard, (_, raw)) =>
        var holdUntil = -1L
        val ws = Seq.newBuilder[(Long, Long)]
        raw.foreach { c =>
          if (c >= holdUntil) { ws += ((c, c + holdSeqs)); holdUntil = c + holdSeqs }
        }
        shard -> ws.result().toArray
      }
    val bW = ops.sparkSession.sparkContext.broadcast(windows)

    // pass 2: catch-up point per window — min op seq at/past its end
    // (an op past window i's end maps to the LAST such window, which
    // is exactly the one the walker would be flushing at that op)
    val catchUps = opsM.flatMap { o =>
      val ws = bW.value.getOrElse(o.shard, Array.empty[(Long, Long)])
      var lo = 0; var hi = ws.length - 1; var j = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ws(mid)._2 <= o.seq) { j = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (j >= 0) Iterator.single((o.shard, j, o.seq)) else Iterator.empty
    }.toDF("shard", "w", "seq")
      .groupBy(col("shard"), col("w")).agg(min(col("seq")).as("applied_at"))
      .as[(Int, Int, Long)].collect() // one row per effective window
    val bCatch = ops.sparkSession.sparkContext
      .broadcast(catchUps.map(t => ((t._1, t._2), t._3)).toMap)

    // pass 3: map-only emission
    opsM.map { o =>
      val ws = bW.value.getOrElse(o.shard, Array.empty[(Long, Long)])
      var lo = 0; var hi = ws.length - 1; var j = -1
      while (lo <= hi) { // max i with start_i <= seq (windows disjoint, sorted)
        val mid = (lo + hi) >>> 1
        if (ws(mid)._1 <= o.seq) { j = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (j >= 0 && o.seq < ws(j)._2)
        Applied(o.shard, o.seq, 1, bCatch.value.getOrElse((o.shard, j), ws(j)._2))
      else Applied(o.shard, o.seq, 0, o.seq)
    }
  }
}
