package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token/char counts are consistent") {
    val df = TextAnalysis.tokenCount(spark, sf()).collect()
    val nchars = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.foreach { r =>
      assert(r.getAs[Long]("n_chars") === nchars(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_tokens") >= 0)
    }
  }

  test("quality flag follows its integer definition") {
    TextAnalysis.quality(spark, sf()).collect().foreach { r =>
      val expect = r.getAs[Long]("n_tokens") >= 5 && r.getAs[Long]("n_tokens") <= 10000 &&
        r.getAs[Long]("n_stop") * 20 >= r.getAs[Long]("n_tokens")
      assert(r.getAs[Int]("is_quality") === (if (expect) 1 else 0))
    }
  }

  test("langid emits a language for every doc") {
    val langs = TextAnalysis.langId(spark, sf()).collect()
      .map(_.getAs[String]("lang_pred")).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr")))
  }

  test("fingerprint collapses case/whitespace/punct variants") {
    import spark.implicits._
    val df = Seq("Hello, World!", "hello   world", "HELLO-WORLD", "other text")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val fps = df.select(
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1) && fps(1) === fps(2))
    assert(fps(3) !== fps(0))
  }

  test("LM score: deterministic, bounded, common-word docs score higher") {
    val a = TextAnalysis.lmScore(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = TextAnalysis.lmScore(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b, "must be reproducible run-to-run")
    assert(a.values.forall(_ < 0))
    // a doc made entirely of the corpus's most common token would score
    // log(p_max); every doc's mean must be <= that bound
    val pMax = {
      import org.apache.spark.sql.functions._
      val toks = spark.read.parquet(s"${sf()}/documents.parquet")
        .select(explode(expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')")).as("t"))
      val total = toks.count().toDouble
      toks.groupBy("t").count().agg(max("count")).head().getLong(0) / total
    }
    assert(a.values.max <= math.round(math.log(pMax) * 1e6) + 1)
  }

  test("TF-IDF top terms: dense ranks 1..k per doc, scores non-increasing") {
    val rows = TextAnalysis.tfIdfTop(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      // score non-increasing with rank
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      })
    }
    // every doc with at least one token gets ranked terms
    assert(byDoc.size > 0)
  }

  test("sequence packing: distributed prefix sum equals single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val got = SequencePacking.packDocuments(spark, sf(), budget = 256L, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // ground truth: the (non-scalable) global window formulation
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
          .cast("long").as("n_tokens"))
    val expected = docs.withColumn("pre",
        coalesce(sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), expr("pre div 256").as("pack_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got === expected)
    // the Verify writer coalesces to one file: a single-task pipeline
    // must not collapse the per-partition offsets (TaskContext ids do)
    val coalesced = SequencePacking.packDocuments(spark, sf(), budget = 256L, partitions = 7)
      .coalesce(1).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(coalesced === expected)
    // packs are contiguous in doc order and start at 0
    assert(got.head._3 === 0L)
    assert(got.sliding(2).forall {
      case Array(a, b) => b._3 >= a._3
      case _ => true
    })
  }

  test("chunk packing: generic prefix sum equals the window formulation and survives coalesce") {
    import org.apache.spark.sql.expressions.Window
    val got = SequencePacking.packChunks(spark, sf(), budget = 256L, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val chunks = Chunking.chunks(spark, sf())
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
    val expected = chunks.withColumn("pre",
        coalesce(sum(col("n_tokens")).over(
          Window.orderBy("doc_id", "chunk_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        expr("pre div 256").as("pack_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(got === expected)
    val coalesced = SequencePacking.packChunks(spark, sf(), budget = 256L, partitions = 7)
      .coalesce(1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(coalesced === expected)
    // pack ids start at 0 and never decrease along the chunk order
    val inOrder = got.sortBy(t => (t._1, t._2))
    assert(inOrder.head._4 === 0L)
    assert(inOrder.sliding(2).forall {
      case Array(a, b) => b._4 >= a._4
      case _ => true
    })
    // packs overfill by at most one chunk (contiguous fill semantics):
    // every pack's pre-total starts inside its budget window
    val packTotals = inOrder.groupBy(_._4).view.mapValues(_.map(_._3).sum)
    packTotals.foreach { case (pid, total) =>
      assert(total >= 1, s"pack $pid empty")
    }
  }

  test("globalRank: distributed rank equals a single-partition window; pack shuffle is a permutation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arbitrary frame with a total order (v, id); compare vs row_number
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(100))).toDF("id", "v")
    val got = SequencePacking.globalRank(df, Seq(col("v"), col("id")), partitions = 9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = df.collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, v), i) => (id, v, i.toLong) }
    assert(got.sortBy(_._3).toSeq === expected.toSeq)
    // seeded pack shuffle: a permutation of all pack ids, seed-stable,
    // different seeds give different orders
    val a = SequencePacking.shuffledPackOrder(spark, sf(), seed = 42L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SequencePacking.shuffledPackOrder(spark, sf(), seed = 42L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = SequencePacking.shuffledPackOrder(spark, sf(), seed = 7L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "same seed must reproduce the same order")
    assert(a.values.toSeq.sorted === (0L until a.size).toSeq, "not a permutation")
    assert(a !== c, "different seeds should permute differently")
    val packIds = SequencePacking.packDocuments(spark, sf())
      .select("pack_id").distinct().collect().map(_.getLong(0)).toSet
    assert(a.keySet === packIds)
  }

  test("source drift: ppm report equals a driver fold; ranks dense per source") {
    val got = TextAnalysis.sourceDrift(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = rows.flatMap { case (s, t) =>
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(s -> _)
    }
    val bySrc = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nSrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cAll = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAll = toks.length.toLong
    val expected = bySrc.toSeq.map { case ((s, tok), c) =>
      val ppmSrc = c * 1000000L / nSrc(s)
      val rest = nAll - nSrc(s)
      val ppmRest = if (rest == 0L) 0L else (cAll(tok) - c) * 1000000L / rest
      (s, tok, ppmSrc, ppmRest, math.abs(ppmSrc - ppmRest),
        math.signum(ppmSrc - ppmRest))
    }.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(t => (-t._5, t._2)).take(3).zipWithIndex
        .map { case ((s, tok, ps, pr, d, dir), i) =>
          (s, i + 1L, tok, ps, pr, d, dir)
        }
    }.toSet
    assert(got === expected)
    // every source reports exactly k rows with dense ranks 1..k
    got.groupBy(_._1).foreach { case (s, g) =>
      assert(g.map(_._2) === Set(1L, 2L, 3L), s"ranks not dense for $s")
    }
  }

  test("curriculum order: quality-first within epochs, same membership and permutation") {
    import org.apache.spark.sql.functions._
    // the one-expression flag equals quality()'s arithmetic
    val flags = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), expr(TextAnalysis.QualityFlagSql).cast("long").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromQuality = TextAnalysis.quality(spark, sf())
      .select(col("doc_id"), col("is_quality").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flags === fromQuality)
    assert(flags.values.toSet === Set(0L, 1L),
      "corpus must exercise both flag values or the curriculum is vacuous")
    val got = TextAnalysis.mixOrderCurriculum(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // same membership as the uniform order
    val uniform = TextAnalysis.mixOrder(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet === uniform)
    // dense total order; within an epoch all quality docs precede all
    // non-quality docs; within a (epoch, flag) run the order is the
    // same md5 permutation mixOrder uses
    assert(got.map(_._5).sorted.toSeq === (0L until got.length).toSeq)
    def key(d: Long, e: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$e:42".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
    got.groupBy(_._3).foreach { case (e, g) =>
      val inOrder = g.sortBy(_._5)
      val qualitySeq = inOrder.map(_._4)
      assert(qualitySeq.toSeq === qualitySeq.sorted.reverse.toSeq,
        s"epoch $e: quality docs must all precede non-quality docs")
      inOrder.groupBy(_._4).foreach { case (_, run) =>
        val ks = run.sortBy(_._5).map(t => key(t._2, e)).toSeq
        assert(ks === ks.sorted, s"epoch $e: md5 permutation broken within flag run")
      }
      assert(g.forall(t => t._4 === flags(t._2)))
    }
  }

  test("bucketed curriculum: decile-graded descent, driver-recomputed deciles, same membership") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.mixOrderBucketed(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // same membership as the uniform order
    val uniform = TextAnalysis.mixOrder(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet === uniform)
    assert(got.map(_._5).sorted.toSeq === (0L until got.length).toSeq)
    // driver reference: score = stopword ppm; cutoffs at ceil(n*d/10)
    // over the sorted corpus multiset; decile = #cutoffs < score
    val scores = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
        val stops = r.getString(1).toLowerCase.split("[^a-z]+")
          .filter(_.nonEmpty)
          .count(Set("the", "a", "of", "and", "to", "is", "in"))
        val s = if (toks.isEmpty) 0L else stops.toLong * 1000000L / toks.length
        r.getLong(0) -> s
      }.toMap
    val sorted = scores.values.toSeq.sorted
    val n = sorted.length
    val cutoffs = (1 to 9).map(d =>
      sorted((math.ceil(n.toDouble * d / 10.0).toLong - 1).toInt))
    val decile = scores.map { case (id, s) =>
      id -> cutoffs.count(s > _).toLong }
    assert(decile.values.toSet.size > 2,
      "corpus must spread across >2 deciles or the bucketing is vacuous")
    got.groupBy(_._3).foreach { case (e, g) =>
      val seq = g.sortBy(_._5).map(_._4)
      assert(seq.toSeq === seq.sorted.reverse.toSeq,
        s"epoch $e: deciles must descend (cleanest first)")
      assert(g.forall(t => t._4 === decile(t._2)),
        s"epoch $e: engine deciles must equal the driver histogram selection")
    }
  }

  test("semantic drift: bucket report equals a driver fold over the embeddings") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.sourceDriftSemantic(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val srcOf = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val buckets = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val b = (0 until 8).map(i => if (v(i) > 0f) 1 << i else 0).sum
        (srcOf(r.getLong(0)), b.toString)
      }
    assert(buckets.map(_._2).distinct.length > 1,
      "fixture must populate several sign buckets or the report is vacuous")
    val bySrc = buckets.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nSrc = buckets.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cAll = buckets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAll = buckets.length.toLong
    val expected = bySrc.toSeq.map { case ((s, b), c) =>
      val ppmSrc = c * 1000000L / nSrc(s)
      val rest = nAll - nSrc(s)
      val ppmRest = if (rest == 0L) 0L else (cAll(b) - c) * 1000000L / rest
      (s, b, ppmSrc, ppmRest, math.abs(ppmSrc - ppmRest),
        math.signum(ppmSrc - ppmRest))
    }.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(t => (-t._5, t._2)).take(3).zipWithIndex
        .map { case ((s, b, ps, pr, d, dir), i) => (s, i + 1L, b, ps, pr, d, dir) }
    }.toSet
    assert(got === expected)
  }

  test("globalRankPack: the fused pass equals globalRank then packPrefixSum") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(4000)(i =>
      (i.toLong, rnd.nextInt(50), (rnd.nextInt(90) + 1).toLong))
      .toDF("id", "v", "w")
    val fused = SequencePacking
      .globalRankPack(df, Seq(col("v"), col("id")), "w", budget = 500L,
        partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val twoStep = SequencePacking.packPrefixSum(
        SequencePacking.globalRank(df, Seq(col("v"), col("id")), partitions = 7),
        Seq(col("rank")), "w", budget = 500L, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(fused === twoStep)
    // rank is a permutation; pack ids never decrease along the rank
    assert(fused.map(_._2).sorted.toSeq === (0L until 4000L).toSeq)
    val inOrder = fused.sortBy(_._2)
    assert(inOrder.head._3 === 0L)
    assert(inOrder.sliding(2).forall {
      case Array(a, b) => b._3 >= a._3
      case _ => true
    })
  }

  test("mix shards: contiguous budget cut over the training order; matches order+pack") {
    import org.apache.spark.sql.functions._
    val budget = 4096L
    val got = TextAnalysis.mixShards(spark, sf(), shardTokens = budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // membership and order match mixOrder exactly
    val order = TextAnalysis.mixOrder(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got.map(t => ((t._1, t._2, t._3), t._4)).toMap === order)
    // n_toks is the whitespace token count of the doc
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall(t => t._5 === toks(t._2)))
    // shard_id = exclusive token prefix sum along train_order div budget
    val inOrder = got.sortBy(_._4)
    var run = 0L
    inOrder.foreach { t =>
      assert(t._6 === run / budget,
        s"row at train_order ${t._4}: shard ${t._6} != ${run / budget}")
      run += t._5
    }
    assert(inOrder.head._6 === 0L)
    // every full shard holds >= budget tokens only by its LAST doc
    // overfill (contiguous fill): each shard's start offset is inside
    // its window, so shard token totals stay within budget + max doc
    val maxDoc = got.map(_._5).max
    val totals = got.groupBy(_._6).view.mapValues(_.map(_._5).sum).toMap
    val full = totals.keys.toSeq.sorted.dropRight(1)
    full.foreach { sid =>
      assert(totals(sid) <= budget + maxDoc && totals(sid) >= budget - maxDoc,
        s"shard $sid total ${totals(sid)} out of [budget±maxDoc]")
    }
  }

  test("writeShards: one directory per shard, in-shard read order is the training order") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val budget = 4096L
    val assigned = TextAnalysis
      .writeShards(spark, sf(), out, shardTokens = budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(dirs.toSet ===
      assigned.map(t => s"shard_id=${t._6}").toSet,
      "exactly one directory per shard id")
    // round-trip: the partitioned read equals the assignment frame
    val back = spark.read.parquet(out)
      .select(col("lang"), col("doc_id"), col("epoch"), col("train_order"),
        col("n_toks"), col("shard_id").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(back.sorted.toSeq === assigned.sorted.toSeq)
    // each shard directory holds one parquet file whose row order is
    // train_order (a sequential shard read IS the training order)
    dirs.foreach { d =>
      val ranks = spark.read.parquet(s"$out/$d")
        .select("train_order").collect().map(_.getLong(0))
      assert(ranks.toSeq === ranks.sorted.toSeq,
        s"$d rows not in train_order")
    }
  }

  test("classifier inference: weight-table join matches a driver-side fold") {
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def w(t: String): Long = (t.map(_.toInt).sum % 21 - 10).toLong
    // tokenless docs drop out of the inner join on the Spark side too
    val expected = texts
      .map { case (id, tx) => id -> tx.toLowerCase.split("[^a-z]+").filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
      .map { case (id, toks) =>
        val score = toks.map(w).sum
        id -> ((score, if (score > 0) 1 else 0))
      }.toMap
    val got = TextAnalysis.classify(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got === expected)
    // the model join must be broadcast (vocabulary-sized weight table)
    val plan = TextAnalysis.classify(spark, sf()).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("RollingHash: reference values, codegen path, order sensitivity") {
    import spark.implicits._
    // h("ab") = (('a'+1) + ('b'+1)*257) % 1e9+7
    val expectAb = ((('a' + 1) + ('b' + 1) * 257L) % RollingHash.Mod)
    assert(RollingHash.hash("ab".getBytes("UTF-8")) === expectAb)
    assert(RollingHash.hash("ba".getBytes("UTF-8")) !==
      RollingHash.hash("ab".getBytes("UTF-8")))
    assert(RollingHash.hash(Array.emptyByteArray) === 0L)
    val got = Seq("ab", "ba", "").toDF("s")
      .select(RollingHash.rolling_hash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(got(0) === expectAb)
    assert(got(2) === 0L)
  }

  test("token entropy: bounds, extremes, and a hand-computed value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = TextAnalysis.tokenEntropy(spark, sf()).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val n = r.getLong(1); val h = r.getLong(2)
      assert(h >= 0L, s"negative entropy for doc ${r.getLong(0)}")
      // H ≤ ln(n) (uniform over n distinct tokens), in micro-nats
      if (n > 0) assert(h <= math.round(math.log(n.toDouble) * 1e6) + 1)
    }
    // synthetic extremes through the same plan (swap the source table)
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // 4 distinct → H = ln 4
      (2L, "spam spam spam spam"),    // 1 distinct → H = 0
      (3L, "")                        // empty → (0, 0)
    ).toDF("doc_id", "text")
    val counts = docs
      .select(col("doc_id"),
        explode_outer(expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(col("tok")).as("cnt"))
    val h = counts.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * log(col("cnt"))).as("clogc"))
      .select(col("doc_id"),
        coalesce(
          round((log(col("n_tokens")) - col("clogc") / col("n_tokens")) * 1e6),
          lit(0.0)).cast("long").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === math.round(math.log(4.0) * 1e6))
    assert(h(2L) === 0L)
    assert(h(3L) === 0L)
  }

  test("filter funnel: every flag equals its standalone operator's bit") {
    val funnel = TextAnalysis.filterFunnel(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    assert(funnel.nonEmpty)
    // component bits re-derived from the standalone (gate-checked) operators
    val q = TextAnalysis.quality(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("is_quality")).toMap
    val l = TextAnalysis.langId(spark, sf()).collect()
      .map(r => r.getLong(0) -> (if (r.getString(1) == "en") 1 else 0)).toMap
    val rep = TextAnalysis.repetition(spark, sf()).collect()
      .map(r => r.getLong(0) -> (1 - r.getAs[Int]("is_repetitive"))).toMap
    val e = TextAnalysis.tokenEntropy(spark, sf()).collect()
      .map(r => r.getLong(0) -> (if (r.getLong(2) >= 2000000L) 1 else 0)).toMap
    // keeper bit re-derived (the corpus' planted dups are NEAR-dups,
    // so on this fixture every doc is its own keeper — the derivation
    // must agree either way)
    val keeper = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val minPerH = keeper.groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    val k = keeper.map { case (d, h) => d -> (if (minPerH(h) == d) 1 else 0) }.toMap
    funnel.foreach { case (d, (qf, lf, rf, ef, kf, keep)) =>
      assert(qf === q(d), s"doc $d quality bit")
      assert(lf === l(d), s"doc $d lang bit")
      assert(rf === rep(d), s"doc $d repetition bit")
      assert(ef === e(d), s"doc $d entropy bit")
      assert(kf === k(d), s"doc $d keeper bit")
      assert(keep === (qf min lf min rf min ef min kf), s"doc $d keep bit")
    }
    assert(funnel.values.exists(_._6 == 1), "nothing kept")
    // and a planted exact duplicate DOES lose keeper status
    import spark.implicits._
    Seq((1L, "same text here okay"), (2L, "same text here okay"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet("/tmp/graft_funnel_dup/documents.parquet")
    val dup = TextAnalysis.filterFunnel(spark, "/tmp/graft_funnel_dup")
      .collect().map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(dup === Map(1L -> 1, 2L -> 0))
  }

  test("corpus report: rollup equals a driver fold of the standalone operators") {
    val report = TextAnalysis.corpusReport(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(report.nonEmpty)
    // re-derive per-doc inputs from the gate-checked components
    val split = graft.dedup.Dedup.leakSafeSplit(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val lang = TextAnalysis.langId(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q = TextAnalysis.quality(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getAs[Int]("is_quality").toLong))).toMap
    val expected = split.keys.toSeq
      .groupBy(d => (split(d), lang(d)))
      .view.mapValues { ds =>
        (ds.size.toLong, ds.map(q(_)._1).sum, ds.map(q(_)._2).sum,
          ds.map(q(_)._3).sum)
      }.toMap
    assert(report === expected)
    // every split present at corpus scale; doc counts sum to the corpus
    assert(report.keySet.map(_._1) === Set("train", "val", "test"))
    assert(report.values.map(_._1).sum === split.size.toLong)
  }

  test("mix plan: budget arithmetic equals a driver fold of langid + token counts") {
    val plan = TextAnalysis.mixPlan(spark, sf()).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(plan.nonEmpty)
    val lang = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = TextAnalysis.tokenCount(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 550000L, "de" -> 150000L,
      "es" -> 150000L, "fr" -> 100000L, "zh" -> 50000L)
    val expected = lang.keys.toSeq.groupBy(lang(_)).map { case (l, ds) =>
      val avail = ds.map(toks(_)).sum
      val target = 2500000L * weights.getOrElse(l, 0L) / 1000000L
      val ppm = if (avail == 0) 0L else target * 1000000L / avail
      l -> ((ds.size.toLong, avail, target, ppm, ppm / 1000000L, ppm % 1000000L))
    }
    assert(plan === expected)
    // the fixture must exercise the interesting arithmetic: at least
    // one domain needs multiple full epochs AND a residual sampling
    // pass, or the decomposition is never tested
    assert(plan.values.exists(p => p._5 >= 1L && p._6 > 0L),
      "some domain should need full epochs plus a residual pass")
    assert(plan.values.map(_._1).sum === lang.size.toLong)
  }

  test("mix epochs: membership equals a driver replay of the plan's pass rules") {
    val plan = TextAnalysis.mixPlan(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def residKept(docId: Long, residPpm: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:137".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      hex < f"${residPpm * 1152921504606L}%015x"
    }
    val expected = (for {
      (d, l) <- docs
      (fe0, rp) = plan(l)
      fe = math.min(fe0, TextAnalysis.MaxEpochs)
      e <- 0L to fe
      if e < fe || residKept(d, rp)
    } yield (l, d, e)).toSet
    val got = TextAnalysis.mixEpochs(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // the residual pass must be a PROPER sample somewhere: some domain
    // keeps a strict, non-empty subset at its residual epoch
    val proper = plan.exists { case (l, (fe, _)) =>
      val domain = docs.filter(_._2 == l)
      val atResid = got.count(t => t._1 == l && t._3 == fe)
      atResid > 0 && atResid < domain.size
    }
    assert(proper, "some residual pass should keep a strict non-empty subset")
  }

  test("mix epochs: a degenerate domain hits the epoch cap instead of exploding") {
    // one 'en' doc with 2 tokens: target_en = 1,375,000 tokens over
    // avail 2 -> full_epochs ~687k, which MUST clamp to MaxEpochs
    // (the unbounded sequence would be the bug this cap exists for)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mixcap").toString
    Seq((1L, "tiny doc", "en"), (2L, "ein wort mehr hier", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.mixEpochs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val enEpochs = out.filter(_._1 == "en").map(_._2)
    // bounded AT the cap (residual pass present or not), never the
    // ~687k passes the uncapped plan would prescribe
    assert(enEpochs.max <= TextAnalysis.MaxEpochs &&
      enEpochs.max >= TextAnalysis.MaxEpochs - 1)
    assert(enEpochs.length.toLong <= TextAnalysis.MaxEpochs + 1)
    assert((0L until TextAnalysis.MaxEpochs).forall(enEpochs.contains),
      "full passes below the cap are all present")
  }

  test("mix order: epochs sequential, per-epoch md5 permutation, rank dense") {
    val rows = TextAnalysis.mixOrder(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // dense zero-based total order
    assert(rows.map(_._4).sorted.toSeq === (0L until rows.length).toSeq)
    val byOrder = rows.sortBy(_._4)
    // epochs never interleave
    assert(byOrder.map(_._3).toSeq === byOrder.map(_._3).sorted.toSeq)
    // within an epoch the order is exactly the md5-key sort
    def key(d: Long, e: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$e:42".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
    byOrder.groupBy(_._3).foreach { case (e, g) =>
      val inOrder = g.sortBy(_._4).map(t => (key(t._2, e), t._2)).toSeq
      assert(inOrder === inOrder.sorted,
        s"epoch $e must be ordered by the md5 shuffle key")
    }
    // the permutation is FRESH per epoch: two epochs sharing the same
    // doc set must order it differently somewhere
    val docSeqs = byOrder.groupBy(_._3).view
      .mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    val sameSet = docSeqs.values.toSeq.combinations(2)
      .filter { case Seq(a, b) => a.toSet == b.toSet && a.size > 1 }
    assert(sameSet.exists { case Seq(a, b) => a != b },
      "epochs over the same doc set should permute it differently")
    // membership matches mixEpochs exactly
    val member = TextAnalysis.mixEpochs(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet === member)
  }
}
