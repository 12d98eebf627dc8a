package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for each left row, the latest right row with
  * rightTime <= leftTime on the same key.
  *
  * Implementation: tag + union both sides, sort each key partition by
  * (time, side, tiebreak) and carry the last-seen right payload forward
  * with `last(..., ignoreNulls)` over a running frame, then keep the left
  * rows. One shuffle per side on the key, one sorted pass — no
  * range-join pair explosion (the naive form joins every left row to ALL
  * earlier right rows before the argmax collapses them; with r rights
  * per key that is O(l*r) intermediate rows vs O(l + r) here). This is
  * the 100 TB path; `Joins.q_join_asof` keeps the join+argmax form as
  * the DuckDB-oracled baseline, and AsOfJoinSuite proves the two agree.
  *
  * Ties: a right row at exactly leftTime is visible (<=), and among
  * right rows with equal time the one with the greatest tiebreak wins —
  * matching `max_by(struct(time, tiebreak))`.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       build side
    * @param leftKey     join key column name on left
    * @param rightKey    join key column name on right
    * @param leftTime    event-time column on left
    * @param rightTime   event-time column on right
    * @param payload     right columns to carry (must include rightTime's
    *                    values if wanted in the output)
    * @param rightTiebreak column breaking equal-time ties (max wins)
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    // side 0 = build (right), side 1 = probe (left): at equal times the
    // build row sorts first, so it is visible to the probe row (<=).
    // Null-keyed build rows are excluded (join semantics: NULL keys
    // never match); null-keyed probe rows then see only probe rows in
    // their partition and correctly get a null payload.
    val r = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__key"), col(rightTime).as("__t"),
      lit(0).as("__side"), col(rightTiebreak).as("__tb"),
      struct(payload.map(col): _*).as("__payload"))
    val l = left.select(
      col(leftKey).as("__key"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(r.schema("__tb").dataType).as("__tb"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(leftCols.map(col): _*).as("__row"))
    val unioned = r.withColumn("__row", lit(null).cast(l.schema("__row").dataType))
      .unionByName(l)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc_nulls_first, col("__side").asc_nulls_first,
        col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col("__row").getField(c).as(c)) ++
      payload.map(c => col("__match").getField(c).as(c))
    carried.select(out: _*)
  }
}
