package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the edit-dedup blocking: stage-by-stage row
  * counts and walls at an arbitrary SF dir, so a regression like the
  * r12 36 s sf0.1 wall decomposes into "which stage blew up" before
  * any fix is attempted. Not a gate; not registered. */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val norm = docs.select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("nt"))
      .withColumn("len", length(col("nt")).cast("long"))
      .localCheckpoint()
    println(s"[probe] docs=${norm.count()}")

    // mirror the private chunk/gram construction via the public audit
    val drops = timed("blockingDrops") {
      graft.dedup.EditDedup.blockingDrops(docs).count()
    }
    println(s"[probe] dropped_keys=$drops")

    // rebuild the key frames inline (same SQL as EditDedup)
    val withL = norm
      .withColumn("tmax", expr("least(CAST(64 AS BIGINT), (len * 2) DIV 19)"))
      .withColumn("cl", expr("greatest(1L, len DIV (tmax + 1L))"))
    val chunks = withL.select(col("doc_id"), col("len"), explode(expr(
        """CASE WHEN len = 0
          |  THEN array(named_struct('pos', 0L, 'k', 0L, 'l', 0L))
          |  ELSE transform(sequence(0L, len DIV cl - 1L), i ->
          |    named_struct(
          |      'pos', i * cl,
          |      'k', xxhash64(substring(nt, CAST(i * cl + 1L AS INT), CAST(cl AS INT))),
          |      'l', cl))
          |END""".stripMargin)).as("c"))
      .select(col("doc_id"), col("len"), col("c.l").as("l"),
        col("c.k").as("k"), col("c.pos").as("pos"))
      .withColumn("pb", expr("pos DIV 64"))
      .withColumn("lb", expr("len DIV 64"))
    val grams = norm.filter(col("len") >= 1L)
      .withColumn("ls", expr(
        """array_distinct(transform(
          |  sequence(greatest(len - CAST(64 AS BIGINT), 1L), len),
          |  m -> greatest(1L, m DIV (least(CAST(64 AS BIGINT), (m * 2) DIV 19) + 1L))))""".stripMargin))
      .select(col("doc_id"), col("len"), col("nt"), explode(col("ls")).as("l"))
      .select(col("doc_id"), col("len"), col("l"), explode(expr(
        """transform(sequence(0L, len - l), p ->
          |  named_struct('pos', p,
          |    'k', xxhash64(substring(nt, CAST(p + 1L AS INT), CAST(l AS INT)))))""".stripMargin)).as("g"))
      .select(col("doc_id"), col("len"), col("l"),
        col("g.k").as("k"), col("g.pos").as("pos"))
      .withColumn("pb", expr("pos DIV 64"))
      .withColumn("lb", expr("len DIV 64"))
    val nc = timed("chunk rows (x1 buckets)") { chunks.count() }
    val ng = timed("gram rows") { grams.count() }
    println(s"[probe] chunks=$nc grams=$ng")

    val cagg = chunks.groupBy("l", "k", "pb", "lb").count()
    val gagg = grams.groupBy("l", "k", "pb", "lb").count()
    timed("key density") {
      val j = cagg.withColumnRenamed("count", "cc")
        .join(gagg.withColumnRenamed("count", "gc"), Seq("l", "k", "pb", "lb"))
        .agg(count(lit(1)).as("keys"),
          sum(col("cc") * col("gc")).as("pairs_pre"),
          max(col("cc") * col("gc")).as("max_key_product"),
          max(col("cc")).as("max_cc"), max(col("gc")).as("max_gc"))
      j.show(false)
    }
    // decompose the operator: capped sides -> join -> distinct -> DP
    val chunks6 = chunks.select(col("doc_id"), col("len"), col("l"),
        col("k"), col("pos"),
        explode(expr(
          """array(named_struct('pb', pb - 1L, 'lb', lb),
            |      named_struct('pb', pb,      'lb', lb),
            |      named_struct('pb', pb + 1L, 'lb', lb),
            |      named_struct('pb', pb - 1L, 'lb', lb + 1L),
            |      named_struct('pb', pb,      'lb', lb + 1L),
            |      named_struct('pb', pb + 1L, 'lb', lb + 1L))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("len"), col("l"), col("k"), col("pos"),
        col("b.pb").as("pb"), col("b.lb").as("lb"))
    def capped(side: org.apache.spark.sql.DataFrame) =
      side.withColumn("key_n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l"), col("k"), col("pb"), col("lb"))))
        .filter(col("key_n") <= 1000)
        .drop("key_n")
    val cc = timed("capped chunks6 count") { capped(chunks6).count() }
    val cg = timed("capped grams count") { capped(grams).count() }
    println(s"[probe] capped chunks6=$cc grams=$cg")
    val theta = least(lit(64L), expr("(a.len + b.len) DIV 20"))
    val joined = capped(chunks6).as("a").join(capped(grams).as("b"),
      col("a.l") === col("b.l") && col("a.k") === col("b.k") &&
        col("a.pb") === col("b.pb") && col("a.lb") === col("b.lb") &&
        col("a.len") <= col("b.len") &&
        col("a.doc_id") =!= col("b.doc_id") &&
        (col("b.len") - col("a.len")) <= theta &&
        abs(col("a.pos") - col("b.pos")) <= theta)
    val nj = timed("join (pre-distinct)") { joined.count() }
    val pd = timed("distinct pair ids") {
      joined.select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct().count()
    }
    println(s"[probe] joined=$nj distinct_pairs=$pd")
    val normCv = timed("norm+cv checkpoint") {
      docs.select(col("doc_id"),
          trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("nt"))
        .withColumn("len", length(col("nt")).cast("long"))
        .withColumn("cv", array((('a' to 'z') ++ ('0' to '9')).map(c =>
          col("len") - length(regexp_replace(col("nt"), c.toString, "")).cast("long")): _*))
        .localCheckpoint()
    }
    println(s"[probe] norm rows=${normCv.count()}")
    // how selective is the cv-L1 prefilter on this corpus?
    timed("cv filter selectivity") {
      val ids = joined.select(
          least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      val withPayload = ids
        .join(normCv.select(col("doc_id").as("doc_a"), col("len").as("len_a"),
          col("cv").as("cv_a")), Seq("doc_a"))
        .join(normCv.select(col("doc_id").as("doc_b"), col("len").as("len_b"),
          col("cv").as("cv_b")), Seq("doc_b"))
      val surv = withPayload.filter(expr(
        """aggregate(zip_with(cv_a, cv_b, (x, y) -> abs(x - y)),
          |  0L, (acc, x) -> acc + x)
          |<= 2 * least(CAST(64 AS BIGINT), (len_a + len_b) DIV 20)""".stripMargin)).count()
      println(s"[probe] cv survivors=$surv of 663471")
    }
    // r18: would a hashed q-gram PROFILE bound (ed >= L1/(2q), Gravano
    // et al.-style; bucket collisions only shrink the L1, so the bound
    // survives hashing) reject more of the cv survivors before the DP?
    timed("trigram-profile selectivity") {
      val B = 64
      val triProf = udf { (nt: String) =>
        val out = new Array[Int](B)
        var i = 0
        while (i + 3 <= nt.length) {
          var h = 1469598103934665603L // FNV-1a 64 over the 3 chars
          var j = i
          while (j < i + 3) { h ^= nt.charAt(j); h *= 1099511628211L; j += 1 }
          out(((h % B) + B).toInt % B) += 1
          i += 1
        }
        out
      }
      val prof = normCv.withColumn("tp", triProf(col("nt")))
        .select(col("doc_id"), col("len"), col("cv"), col("tp"))
        .localCheckpoint()
      val ids = joined.select(
          least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      val withPayload = ids
        .join(prof.select(col("doc_id").as("doc_a"), col("len").as("len_a"),
          col("cv").as("cv_a"), col("tp").as("tp_a")), Seq("doc_a"))
        .join(prof.select(col("doc_id").as("doc_b"), col("len").as("len_b"),
          col("cv").as("cv_b"), col("tp").as("tp_b")), Seq("doc_b"))
      val cvPass = expr(
        """aggregate(zip_with(cv_a, cv_b, (x, y) -> abs(x - y)),
          |  0L, (acc, x) -> acc + x)
          |<= 2 * least(CAST(64 AS BIGINT), (len_a + len_b) DIV 20)""".stripMargin)
      val triPass = expr(
        """aggregate(zip_with(tp_a, tp_b, (x, y) -> abs(x - y)),
          |  0, (acc, x) -> acc + x)
          |<= 6 * least(CAST(64 AS BIGINT), (len_a + len_b) DIV 20)""".stripMargin)
      val both = withPayload.filter(cvPass && triPass).count()
      println(s"[probe] cv+trigram survivors=$both of 663471 (cv alone kept 262341)")
    }
    val t0 = System.nanoTime()
    val pairs = graft.dedup.EditDedup.editPairsOf(docs)
    val n = pairs.count()
    println(f"[probe] editPairsOf full: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$n")
    spark.stop()
  }
}
