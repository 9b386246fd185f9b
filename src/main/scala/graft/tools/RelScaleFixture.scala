package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ~N× scale-rehearsal fixture for the EVENT/ORDER families (r10
  * VERDICT next-round #7): [[ScaleFixture]] scales `documents` only,
  * so the KV and relational rehearsals (`k_route`, `k_serve`,
  * `rel_running`, `rel_sessions`) had no measured scale row — their
  * inputs are `events` and `orders`. This tool replicates those two
  * tables `factor`× with pure id-offset arithmetic (replica r adds
  * r·[[ScaleFixture.IdStride]] to every entity id; timestamps,
  * types and values carried), copying every other parquet through so
  * the output dir is a drop-in SPARK_GRAFT_SF_DIR.
  *
  * The replication direction matches how these workloads actually
  * scale: MORE users / customers with the same per-entity activity —
  * the per-key window/fold partitions grow in NUMBER, not size (the
  * posture the segmented folds and windows claim to handle), while
  * the KV op volume per routed key grows with the corpus (`key` is
  * `user_id mod 97`, so key cardinality stays fixed and per-key
  * throughput is what the rehearsal stresses). Deterministic: every
  * derived row is a pure function of (source row, replica).
  */
object RelScaleFixture {

  def main(args: Array[String]): Unit = {
    val inDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("target/relscale10x")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      Files.createDirectories(Paths.get(outDir))
      val src = Paths.get(inDir)
      Files.list(src).forEach { p =>
        val name = p.getFileName.toString
        if (name.endsWith(".parquet") && name != "events.parquet" &&
            name != "orders.parquet") {
          val dst = Paths.get(outDir, name)
          if (Files.isDirectory(p)) {
            Files.createDirectories(dst)
            Files.list(p).forEach(f => Files.copy(f,
              dst.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING))
          } else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
        }
      }
      val stride = ScaleFixture.IdStride
      val rep = explode(expr(s"sequence(0, ${factor - 1})"))
      spark.read.parquet(s"$inDir/events.parquet")
        .withColumn("r", rep)
        .select(
          (col("event_id") + col("r") * stride).as("event_id"),
          col("ts"),
          (col("user_id") + col("r") * stride).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      spark.read.parquet(s"$inDir/orders.parquet")
        .withColumn("r", rep)
        .select(
          (col("o_orderkey") + col("r") * stride).as("o_orderkey"),
          (col("o_custkey") + col("r") * stride).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
      val ne = spark.read.parquet(s"$outDir/events.parquet").count()
      val no = spark.read.parquet(s"$outDir/orders.parquet").count()
      println(s"[relscale] $outDir events=$ne orders=$no factor=$factor")
    } finally spark.stop()
  }
}
