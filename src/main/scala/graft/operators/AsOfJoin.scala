package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row of the same key
  * with rightTime <= leftTime — the temporal lookup Spark lacks as a
  * built-in (pandas merge_asof / DuckDB ASOF JOIN).
  *
  * Implementation is the compose-first strategy (preference (a) of the
  * custom-operator ladder): tag and UNION the two sides, then one
  * window pass per key ordered by (time, side) propagating the last
  * seen right payload onto left rows. Cost: ONE shuffle on the key —
  * the same exchange a plain join would pay — no range explosion, no
  * per-row probes, spill-safe sort. This beats a custom SparkPlan in
  * simplicity and matches it in shuffle count, so the ladder stops at
  * (a).
  *
  * Tie semantics: at equal (key, time) the MAX payload wins — enforced
  * by the window sort itself (t, side, payload) instead of a right-side
  * pre-aggregation, which would cost a second exchange. This makes
  * multiplicity explicit and engine-portable (DuckDB ASOF JOIN leaves
  * same-timestamp multiplicity unspecified, so oracles pre-dedup).
  */
object AsOfJoin {

  /** @param left      (key, t, ...) — preserved verbatim
    * @param right     (key, t, payload)
    * @param payload   single right payload column name
    * @return left columns + `payload` (null when no right row precedes)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, t: String,
      payload: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("_is_left", lit(1))
      .withColumn(payload, lit(null).cast(right.schema(payload).dataType))
      .select((leftCols.map(col) :+ col("_is_left") :+ col(payload)): _*)
      .unionByName(
        right
          .withColumn("_is_left", lit(0))
          .select((leftCols.map(c =>
            if (c == key || c == t) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
            :+ col("_is_left") :+ col(payload)): _*))
    // right (is_left=0) sorts before left at equal t → "<=" semantics;
    // payload last within equal (t, side) → max-payload tie-break
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col("_is_left"), col(payload))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("_asof", last(when(col("_is_left") === 0, col(payload)), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select((leftCols.map(col) :+ col("_asof").as(payload)): _*)
  }
}
