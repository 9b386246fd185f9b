package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming shard-migration tracker — the live half of K9
  * (data-follows-shards, `src/shardkv/test_test.go:95-146` of the
  * reference): as the config epoch advances under a running op
  * stream, each shard's ownership can move between replica groups;
  * the state machine detects every handoff and emits a migration
  * record carrying how much state moves.
  *
  * Keyed by SHARD (10 keys — the reference's fixed NShards), state =
  * current owner + the shard's key population so far; an op whose
  * epoch maps the shard to a different gid than the previous op's
  * epoch emits `(shard, at_seq, from_gid, to_gid, n_keys)` — the
  * exact "shard S with K keys moves from group A to group B at log
  * position N" event a reconfiguration executor would act on.
  *
  * Ordering contract matches KvStream: seq order within a batch,
  * per-shard in-order delivery across batches (the reference's log
  * order). State is O(keys-per-shard); at 100 TB the key POPULATION
  * count (not values) is what's tracked — swap the Set for an HLL
  * sketch when exact populations stop fitting. */
object ShardMigration {

  final case class ShardOp(shard: Int, seq: Long, key: String, gid: Long)
  final case class ShardState(gid: Long, keys: Set[String])
  final case class Migration(shard: Int, at_seq: Long, from_gid: Long,
      to_gid: Long, n_keys: Long)

  /** Routed ops (graft.kv.Kv.routeOps output) → typed shard stream. */
  def shardOps(routed: DataFrame): Dataset[ShardOp] = {
    import routed.sparkSession.implicits._
    routed.select(col("shard").cast("int"), col("seq"), col("key"),
        col("gid").cast("long"))
      .as[ShardOp]
  }

  /** One op transition: next state plus the handoff record if the
    * shard changed owners at this op — shared by the streaming
    * machine and the batch sorted-group scan. */
  private[streaming] def step(shard: Int, st: ShardState,
      o: ShardOp): (ShardState, Option[Migration]) = {
    val mig =
      if (st.gid != o.gid && st.gid != -1L)
        Some(Migration(shard, o.seq, st.gid, o.gid, st.keys.size.toLong))
      else None
    (ShardState(o.gid, st.keys + o.key), mig)
  }

  /** Streaming state machine (true streams: the sort is bounded by a
    * micro-batch; batch executions go through [[migrationsBatch]]). */
  def migrations(ops: Dataset[ShardOp]): Dataset[Migration] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, Migration](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[ShardOp], state) =>
          var st = state.getOption.getOrElse(ShardState(-1L, Set.empty))
          val out = Seq.newBuilder[Migration]
          batch.toSeq.sortBy(_.seq).foreach { o =>
            val (next, mig) = step(shard, st, o)
            mig.foreach(out += _)
            st = next
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** BATCH execution of the same machine via `flatMapSortedGroups` —
    * the shuffle delivers each shard's ops already seq-ordered, so
    * the walk holds only the current owner + key population, never
    * the whole log (in batch mode one "group" is the shard's entire
    * history; the micro-batch path's toSeq.sortBy would buffer it).
    * Differential vs streaming + window oracle in ShardMigrationSpec. */
  def migrationsBatch(ops: Dataset[ShardOp]): Dataset[Migration] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.shard)
      .flatMapSortedGroups(col("seq")) { (shard, it) =>
        var st = ShardState(-1L, Set.empty)
        it.flatMap { o =>
          val (next, mig) = step(shard, st, o)
          st = next
          mig.iterator
        }
      }
  }

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
