package graft.core

import graft.SparkSpec
import org.apache.spark.util.CollectionAccumulator

import scala.jdk.CollectionConverters._

/** Parallelism probes — the twin of the reference's `mtiming`/`rtiming`
  * apps (`src/mrapps/mtiming.go:19-62`, `rtiming.go`), which assert
  * that ≥2 map tasks (resp. reduce tasks) actually execute
  * CONCURRENTLY, not just interleaved. Here each probed task records
  * its (start, end) wall-clock interval into an accumulator while
  * holding the partition busy for ~400 ms; the assertion is the
  * reference's: some pair of intervals in the same stage overlaps.
  *
  * The map probe and reduce probe sit on opposite sides of the
  * engine's shuffle (flatMap side / mapGroups side of
  * [[MapReduce.run]]'s shape), so both phases of the MR dataflow are
  * shown parallel at `local[4]`.
  */
class ParallelismProbeSpec extends SparkSpec {

  private def overlaps(iv: Seq[(Long, Long)]): Boolean =
    iv.combinations(2).exists { case Seq((a0, a1), (b0, b1)) => a0 < b1 && b0 < a1 }

  test("map and reduce stages each run >=2 tasks concurrently (mtiming/rtiming)") {
    import spark.implicits._
    // AQE would coalesce this tiny shuffle into ONE reduce task, which is
    // exactly what the probe must rule out — pin the fan-out for the test.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val mapIv: CollectionAccumulator[(Long, Long)] =
      spark.sparkContext.collectionAccumulator[(Long, Long)]("mapIntervals")
    val redIv: CollectionAccumulator[(Long, Long)] =
      spark.sparkContext.collectionAccumulator[(Long, Long)]("reduceIntervals")

    // 4 whole-file-shaped inputs across 4 partitions -> 4 map tasks
    val input = spark.createDataset(
      (0 until 4).map(i => (s"f$i", s"alpha beta gamma delta epsilon f$i"))
    ).repartition(4)

    val kv = input
      .mapPartitions { it =>
        val rows = it.toVector // read the split, then hold the slot busy
        val t0 = System.currentTimeMillis()
        Thread.sleep(400)
        mapIv.add((t0, System.currentTimeMillis()))
        rows.iterator.flatMap { case (n, c) =>
          c.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(KeyValue(_, n))
        }
      }
      .groupByKey(_.key)
      .mapGroups { (k, rows) => KeyValue(k, rows.size.toString) }
      .mapPartitions { it =>
        val rows = it.toVector
        val t0 = System.currentTimeMillis()
        Thread.sleep(400)
        redIv.add((t0, System.currentTimeMillis()))
        rows.iterator
      }

    val n = kv.count()
    assert(n >= 5) // the shared vocabulary plus per-file tokens

    val mapIntervals = mapIv.value.asScala.toVector
    val redIntervals = redIv.value.asScala.toVector
    assert(mapIntervals.size >= 2, s"expected >=2 map tasks, saw $mapIntervals")
    assert(redIntervals.size >= 2, s"expected >=2 reduce tasks, saw $redIntervals")
    assert(overlaps(mapIntervals),
      s"no two map tasks ran concurrently: $mapIntervals (mtiming contract)")
    assert(overlaps(redIntervals),
      s"no two reduce tasks ran concurrently: $redIntervals (rtiming contract)")
    } finally {
      prev.fold(spark.conf.unset(coalesceKey))(v => spark.conf.set(coalesceKey, v))
    }
  }
}
