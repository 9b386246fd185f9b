package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge

class MapReduceSpec extends SparkSpec {

  /** wc app exactly as the reference defines it (`src/mrapps/wc.go`). */
  private val wcMap: (String, String) => IterableOnce[KeyValue] =
    (_, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(KeyValue(_, "1"))
  private val wcReduce: (String, Iterator[String]) => String =
    (_, values) => values.size.toString

  private val fixture = Seq(
    ("f1", "the quick brown fox the fox"),
    ("f2", "the lazy dog; dog-EARED the"),
    ("f3", ""))

  test("generic MapReduce matches the sequential oracle (mrsequential parity)") {
    import spark.implicits._
    val got = MapReduce
      .run(spark, fixture.toDS(), wcMap, wcReduce, numPartitions = 3)
      .collect().map(kv => kv.key -> kv.value).toMap
    val want = MapReduce.sequentialOracle(fixture, wcMap, wcReduce)
      .map(kv => kv.key -> kv.value).toMap
    assert(got === want)
    assert(got("the") === "4" && got("fox") === "2" && got("EARED") === "1")
  }

  test("output content is invariant to numPartitions (test-mr.sh:103 invariant)") {
    import spark.implicits._
    val runs = Seq(1, 3, 10).map { n =>
      MapReduce.run(spark, fixture.toDS(), wcMap, wcReduce, n)
        .collect().map(kv => kv.key -> kv.value).sorted.toVector
    }
    assert(runs.distinct.size === 1)
  }

  test("holistic reducer: sorted group-concat is deterministic") {
    import spark.implicits._
    val concatReduce: (String, Iterator[String]) => String =
      (_, values) => values.toVector.sorted.mkString(" ")
    val profMap: (String, String) => IterableOnce[KeyValue] =
      (name, contents) => Seq(
        KeyValue("a", name), KeyValue("b", name.length.toString),
        KeyValue("c", contents.length.toString), KeyValue("d", "xyzzy"))
    val out = MapReduce.run(spark, fixture.toDS(), profMap, concatReduce, 2)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(out("a") === "f1 f2 f3")
    assert(out("d") === "xyzzy xyzzy xyzzy")
  }

  test("FnvHash31 matches Go hash/fnv New32a & 0x7fffffff") {
    // Vectors computed from the FNV-1a reference definition
    // (offset 2166136261, prime 16777619), as in Go's hash/fnv.
    assert(FnvHash31.hash("".getBytes("UTF-8")) === (2166136261L & 0x7fffffffL).toInt)
    assert(FnvHash31.hash("a".getBytes("UTF-8")) === (3826002220L & 0x7fffffffL).toInt)
    assert(FnvHash31.hash("foobar".getBytes("UTF-8")) === (3214735720L & 0x7fffffffL).toInt)
  }

  test("FnvHash31 works as a Catalyst expression (eval + codegen paths)") {
    import spark.implicits._
    val df = Seq("", "a", "foobar", "the").toDF("s")
      .select(col("s"), bridge.column(FnvHash31(bridge.expression(col("s")))).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("a") === FnvHash31.hash("a".getBytes("UTF-8")))
    assert(got("foobar") === FnvHash31.hash("foobar".getBytes("UTF-8")))
    // reduce-bucket parity: ihash(key) % nReduce (src/mr/worker.go:140)
    assert(got("the") % 10 === FnvHash31.hash("the".getBytes("UTF-8")) % 10)
  }

  test("text sink writes key-sorted 'key value' lines") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val kv = MapReduce.run(spark, fixture.toDS(), wcMap, wcReduce, 2)
    MapReduce.writeTextSink(kv, tmp, numPartitions = 2)
    val lines = spark.read.text(tmp).as[String].collect()
    assert(lines.length === lines.distinct.length)
    assert(lines.map(_.split(" ")(0)).toSet.contains("the"))
    assert(lines.find(_.startsWith("the ")).get === "the 4")
  }
}
