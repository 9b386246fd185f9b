package graft.core

import graft.SparkSpec

class SqlSurfaceSpec extends SparkSpec {

  test("full SQL surface: tables + native functions via GraftCatalog") {
    GraftCatalog.registerAll(spark, sf())
    val wc = spark.sql(
      """SELECT word, count(*) AS cnt
        |FROM (SELECT explode(split(text, '[^\\p{L}]+')) AS word FROM documents)
        |WHERE length(word) > 0 GROUP BY word""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val api = graft.queries.MrQueries.wordCount(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === api)
    // native functions compose with SQL over the registered views
    val sharded = spark.sql(
      "SELECT fnv_hash31(p_name) % 10 AS b, count(*) AS n FROM part GROUP BY 1")
    assert(sharded.count() > 0)
    val fp = spark.sql("SELECT rolling_hash(text) AS h FROM documents LIMIT 5")
    assert(fp.collect().forall(_.getLong(0) >= 0L))
  }

  test("wrong arity raises a proper analysis error, not a resolver crash") {
    GraftCatalog.registerAll(spark, sf())
    for (bad <- Seq("SELECT hilbert_index(1)", "SELECT hilbert_index(1, 2, 3)",
        "SELECT fnv_hash31()", "SELECT rolling_hash('a', 'b')",
        "SELECT hilbert_index_n()")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).collect())
      assert(e.getMessage.contains("parameters"), s"$bad: ${e.getMessage}")
    }
    // correct arities still resolve
    assert(spark.sql("SELECT hilbert_index(3L, 5L) AS h").collect().nonEmpty)
    assert(spark.sql("SELECT hilbert_index_n(3L, 5L, 7L) AS h").collect().nonEmpty)
  }

  test("GraftExtensions installs the same functions at session build time") {
    // applying the extensions object must register both builders
    // (behavioral coverage of the injected functions themselves lives
    // in CoreExtrasSpec via GraftFunctions.register)
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
  }
}
