package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.MrQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in
  * `queries`; each SQL-expressible one has a matching DuckDB oracle in
  * `oracleSql` with IDENTICAL output column names (the driver's compare
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MrQueries.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 reference query library (MR apps over documents) ----
    "q_wc" -> ((s, dir) => MrQueries.wordCount(s, dir)),
    "q_indexer" -> ((s, dir) => MrQueries.invertedIndex(s, dir)),
    "q_profile" -> ((s, dir) => MrQueries.scalarProfile(s, dir)),
    "q_filecount" -> ((s, dir) => MrQueries.perFileCount(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_wc" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word FROM documents)
        |WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "q_indexer" ->
      """WITH t AS (
        |  SELECT DISTINCT printf('%09d', doc_id) AS doc,
        |         unnest(string_split_regex(text, '[^\p{L}]+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS n_docs, string_agg(doc, ',' ORDER BY doc) AS docs
        |FROM t WHERE length(word) > 0 GROUP BY word""".stripMargin,
    "q_profile" ->
      """WITH d AS (SELECT printf('%09d', doc_id) AS name, text FROM documents),
        |pairs AS (
        |  SELECT 'a' AS key, name AS value FROM d
        |  UNION ALL SELECT 'b', CAST(length(name) AS VARCHAR) FROM d
        |  UNION ALL SELECT 'c', CAST(length(text) AS VARCHAR) FROM d
        |  UNION ALL SELECT 'd', 'xyzzy' FROM d)
        |SELECT key, string_agg(value, ' ' ORDER BY value) AS profile
        |FROM pairs GROUP BY key""".stripMargin,
    "q_filecount" ->
      """SELECT doc_id, count(*) AS n_tokens
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE length(word) > 0 GROUP BY doc_id""".stripMargin,
  )
}
