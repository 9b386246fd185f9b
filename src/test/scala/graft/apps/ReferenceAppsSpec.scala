package graft.apps

import graft.SparkSpec
import graft.core.MapReduce

class ReferenceAppsSpec extends SparkSpec {

  test("indexer app through the generic engine matches the declarative plan") {
    import spark.implicits._
    val input = MapReduce.documentsAsFiles(spark, sf())
      .map { case (id, text) => (f"${id.toLong}%09d", text) }
    val engine = MrJob(ReferenceApps.indexerMap, ReferenceApps.indexerReduce)
      .dataset(spark, input)
      .collect().map(kv => kv.key -> kv.value).toMap
    val df = graft.queries.MrQueries.invertedIndex(spark, sf()).collect()
      .map(r => r.getString(0) ->
        s"${r.getAs[Long]("n_docs")} ${r.getAs[String]("docs")}").toMap
    assert(engine === df)
  }

  test("wc and filecount apps agree with their declarative plans") {
    import spark.implicits._
    val input = MapReduce.documentsAsFiles(spark, sf())
    val wc = MrJob(ReferenceApps.wcMap, ReferenceApps.wcReduce)
      .dataset(spark, input).collect().map(kv => kv.key -> kv.value.toLong).toMap
    val wcDf = graft.queries.MrQueries.wordCount(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === wcDf)
    val fc = MrJob(ReferenceApps.fileCountMap, ReferenceApps.fileCountReduce)
      .dataset(spark, input).collect()
    assert(fc.forall(_.value === "1")) // one row per file, as the reference app
  }

  test("MrJob.run: whole-file glob to sorted text output end-to-end") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-mrin")
    val out = java.nio.file.Files.createTempDirectory("graft-mrout").toString + "/o"
    java.nio.file.Files.writeString(in.resolve("f1.txt"), "apple banana apple")
    java.nio.file.Files.writeString(in.resolve("f2.txt"), "banana! cherry")
    MrJob(ReferenceApps.wcMap, ReferenceApps.wcReduce, nReduce = 3)
      .run(spark, in.toString, out)
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines.toSeq === Seq("apple 2", "banana 2", "cherry 1"))
  }
}
