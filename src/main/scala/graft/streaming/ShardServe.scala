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
    * catch-up op arrives. */
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

  /** Batch twin (sorted-group scan; the gate surface of `k_serve`). */
  def serveBatch(ops: Dataset[ShardOp], holdSeqs: Long = 50L): Dataset[Applied] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapSortedGroups(col("seq")) { (shard, it) =>
        val w = new Walker(holdSeqs)
        w.load(ServeState(-1L, -1L, Seq.empty))
        it.flatMap(o => w.onOp(o)) ++ w.finish(shard)
      }
  }
}
