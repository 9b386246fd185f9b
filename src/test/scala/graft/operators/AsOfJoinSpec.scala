package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asof: latest right <= left time, per key; null when none precedes") {
    import spark.implicits._
    val left = Seq(
      ("a", 10L, 100L), ("a", 20L, 101L), ("a", 5L, 102L),
      ("b", 7L, 103L)).toDF("k", "t", "left_id")
    val right = Seq(
      ("a", 8L, 1L), ("a", 15L, 2L), ("b", 9L, 3L)).toDF("k", "t", "p")
    val got = AsOfJoin.asof(left, right, "k", "t", "p").collect()
      .map(r => r.getAs[Long]("left_id") -> Option(r.getAs[Any]("p"))).toMap
    assert(got(100L) === Some(1L)) // t=10: latest right at 8
    assert(got(101L) === Some(2L)) // t=20: latest right at 15
    assert(got(102L) === None)     // t=5: nothing precedes
    assert(got(103L) === None)     // b at 7: right at 9 is later
  }

  test("asof: equal timestamps match (<= semantics), max payload on ties") {
    import spark.implicits._
    val left = Seq(("k", 10L, 1L)).toDF("k", "t", "left_id")
    val right = Seq(("k", 10L, 5L), ("k", 10L, 9L), ("k", 3L, 1L)).toDF("k", "t", "p")
    val got = AsOfJoin.asof(left, right, "k", "t", "p").collect()
    assert(got.head.getAs[Long]("p") === 9L)
  }

  test("asof matches a brute-force oracle on random data (8 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val keys = Vector("a", "b", "c")
      val left = Vector.tabulate(60)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(100).toLong, i.toLong))
      val right = Vector.tabulate(40)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(100).toLong, i.toLong + 1000))
      val got = AsOfJoin.asof(left.toDF("k", "t", "lid"), right.toDF("k", "t", "p"),
          "k", "t", "p").collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("p"))).toMap
      left.foreach { case (k, t, lid) =>
        val want = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(lid) === want, s"seed=$seed left=($k,$t,$lid)")
      }
    }
  }

  test("asof plan: single exchange on the key (no range join explosion)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (s"k${i % 5}", i.toLong, i.toLong)).toDF("k", "t", "lid")
    val right = (1 to 50).map(i => (s"k${i % 5}", i.toLong * 2, i.toLong)).toDF("k", "t", "p")
    val plan = AsOfJoin.asof(left, right, "k", "t", "p")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
  }
}
