package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped scratch paths for build-once/probe-many index
  * lifecycles (IVF-PQ, LSH, span indexes) — ONE registry and shutdown
  * hook instead of a per-object copy. The path is keyed by an md5 of
  * the FULL corpus dir (a 32-bit hashCode could collide two corpora in
  * one session and silently reuse the wrong index) plus the Spark
  * applicationId, so concurrent Verify/Bench/test runs on one machine
  * never clobber each other mid-read; every path registers for
  * shutdown-hook deletion so repeated sessions don't accumulate
  * corpus-sized /tmp garbage. */
object SessionScratch {

  private val paths = scala.collection.mutable.Set.empty[String]
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.synchronized(paths.toSeq).foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(p))
      }))
    true
  }

  /** Register and return `/tmp/<prefix>_<corpus-md5>_<appId>`. */
  def path(spark: SparkSession, sfDir: String, prefix: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val p = s"/tmp/${prefix}_${tag}_${spark.sparkContext.applicationId}"
    require(hookInstalled)
    paths.synchronized { paths += p }
    p
  }

  /** Run `build` once per path: existence via Hadoop FileSystem (the
    * parquet write goes through Spark's default filesystem, which need
    * not be the driver's local disk), synchronized against concurrent
    * gate invocations in one JVM. */
  def buildOnce(spark: SparkSession, path: String,
      marker: String = "_SUCCESS")(build: => Unit): Unit =
    paths.synchronized {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/$marker"))) build
    }
}
