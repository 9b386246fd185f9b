package graft.sources

import graft.SparkSpec
import graft.queries.RelQueries
import org.apache.spark.sql.functions._

/** Date-column drift tripwire — the o_orderdate analogue of
  * [[EventTimeSpec]] (round-7 lesson: the driver regenerates fixtures
  * and physical types can change). The orders-only relational queries
  * must produce identical results whether `o_orderdate` arrives as
  * TIMESTAMP (today's fixture), DATE, or an ISO date STRING — the
  * three encodings a lakehouse writer plausibly emits. A future
  * fixture drift fails HERE with the encoding named, not across the
  * relational suite. */
class DateColsSpec extends SparkSpec {

  /** Twin orders fixtures: the real table with o_orderdate re-encoded. */
  private lazy val twins: Map[String, String] = {
    val real = spark.read.parquet(s"${sf()}/orders.parquet")
    Seq("date", "string").map { mode =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-odate-$mode").toString
      val enc = mode match {
        case "date"   => col("o_orderdate").cast("date")
        case "string" => date_format(col("o_orderdate"), "yyyy-MM-dd")
      }
      real.withColumn("o_orderdate", enc)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      mode -> dir
    }.toMap
  }

  private def run(q: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame, dir: String): Set[String] =
    q(spark, dir).collect().map(_.toString).toSet

  test("orders-only queries are o_orderdate-encoding-portable") {
    // every registered query that reads ONLY the orders table and
    // touches o_orderdate (filter literals, year(), window order, cube)
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "rel_except" -> ((s, d) => RelQueries.lapsedCustomers(s, d)),
      "rel_intersect" -> ((s, d) => RelQueries.retainedCustomers(s, d)),
      "rel_cube" -> ((s, d) => RelQueries.orderPriorityCube(s, d)),
      "rel_running" -> ((s, d) => RelQueries.runningCustomerTotals(s, d)),
      "rel_first_orders" -> ((s, d) => RelQueries.firstOrdersPerCustomer(s, d)))
    queries.foreach { case (name, q) =>
      val want = run(q, sf())
      assert(want.nonEmpty, s"$name produced no rows on the real fixture")
      twins.foreach { case (mode, dir) =>
        val got = run(q, dir)
        assert(got === want, s"$name drifted under $mode-encoded o_orderdate")
      }
    }
  }

  test("lineitem pricing summary is l_shipdate-encoding-portable") {
    val real = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val want = run((s, d) => RelQueries.pricingSummary(s, d), sf())
    assert(want.nonEmpty)
    Seq("date" -> col("l_shipdate").cast("date"),
        "string" -> date_format(col("l_shipdate"), "yyyy-MM-dd")).foreach {
      case (mode, enc) =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft-ldate-$mode").toString
        real.withColumn("l_shipdate", enc)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        val got = run((s, d) => RelQueries.pricingSummary(s, d), dir)
        assert(got === want, s"pricing summary drifted under $mode-encoded l_shipdate")
    }
  }
}
