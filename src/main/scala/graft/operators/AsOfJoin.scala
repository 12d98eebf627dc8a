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

  /** The tag+union frame every as-of variant sorts: build rows carry
    * (time, tiebreak, payload-with-matched-time), probe rows their
    * whole original row. Build rows with a null KEY are excluded (join
    * semantics: NULL keys never match) and so are null TIMES — a null
    * time satisfies neither `<=` nor `>=` any probe time, but
    * nulls-first sorting would otherwise park them at the partition
    * head where every backward frame sees them. Null-keyed/timed probe
    * rows are kept and resolve to a null payload downstream.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTiebreak: String,
      buildSide: Int, leftCols: Seq[String]): DataFrame = {
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__key"), col(rightTime).as("__t"),
        lit(buildSide).as("__side"), col(rightTiebreak).as("__tb"),
        struct(col(rightTime).as("__bt"),
          struct(payload.map(col): _*).as("__p")).as("__payload"))
    val l = left.select(
      col(leftKey).as("__key"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(r.schema("__tb").dataType).as("__tb"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(leftCols.map(col): _*).as("__row"))
    r.withColumn("__row", lit(null).cast(l.schema("__row").dataType))
      .unionByName(l)
  }

  /** @param left        probe side
    * @param right       build side
    * @param leftKey     join key column name on left
    * @param rightKey    join key column name on right
    * @param leftTime    event-time column on left
    * @param rightTime   event-time column on right
    * @param payload     right columns to carry (must include rightTime's
    *                    values if wanted in the output)
    * @param rightTiebreak column breaking equal-time ties (max wins)
    * @param direction   "backward" (latest right <= leftTime, default)
    *                    or "forward" (earliest right >= leftTime) —
    *                    pandas merge_asof's direction, same sorted-pass
    *                    plan with the frame and tie order mirrored
    * @param tolerance   optional bound predicate (probeTime, matchedTime)
    *                    => boolean; a match failing it nulls the payload
    *                    (the probe row is kept) — type-agnostic, so
    *                    timestamp callers write e.g.
    *                    (l, r) => l <= r + expr("INTERVAL 1 HOUR")
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTiebreak: String,
      direction: String = "backward",
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"

    val leftCols = left.columns.toSeq
    // Backward: build side 0 sorts BEFORE the probe (side 1) at equal
    // times, so a right row at exactly leftTime is visible to the
    // running `last` over (unboundedPreceding, currentRow). Forward
    // mirrors everything: build side 2 sorts AFTER the probe at equal
    // times, visible to `first` over (currentRow, unboundedFollowing),
    // and the tiebreak sort flips so max-tiebreak still wins among
    // equal-time rights. The matched right TIME rides inside the
    // carried struct (`__bt`) so the tolerance bound can test it
    // without a second pass.
    val unioned = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, payload, rightTiebreak,
      buildSide = if (fwd) 2 else 0, leftCols)

    val tbOrder = if (fwd) col("__tb").desc_nulls_last
      else col("__tb").asc_nulls_first
    val w0 = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc_nulls_first, col("__side").asc_nulls_first,
        tbOrder)
    val w = if (fwd) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = if (fwd) first(col("__payload"), ignoreNulls = true)
      else last(col("__payload"), ignoreNulls = true)

    val carried = unioned
      .withColumn("__match", pick.over(w))
      .filter(col("__side") === 1)
    // a null probe time matches nothing in either direction — backward
    // gets that from nulls_first sorting (no build precedes a null),
    // but forward would otherwise see every build following it
    val bounded0 = when(col("__t").isNotNull, col("__match"))
    val bounded = tolerance.fold(bounded0) { p =>
      when(bounded0.isNotNull &&
        p(col("__t"), bounded0.getField("__bt")), bounded0)
    }

    val out = leftCols.map(c => col("__row").getField(c).as(c)) ++
      payload.map(c => bounded.getField("__p").getField(c).as(c))
    carried.select(out: _*)
  }

  /** Nearest-match as-of (pandas merge_asof direction="nearest"): for
    * each left row, the right row minimizing |rightTime − leftTime| on
    * the same key; equal distances prefer the backward (≤) match, and
    * equal times within a side the max tiebreak — consistent with the
    * directional forms. ONE shuffle on the key: both directional
    * carries run as two window frames over the same hash partitioning
    * (the second differs only in sort order — an in-partition re-sort,
    * no exchange). Works for numeric and timestamp times alike: the
    * distance comparison subtracts columns, so timestamps compare as
    * day-time intervals. `tolerance` bounds each side before the
    * comparison; a left row with no in-bound match keeps a null
    * payload.
    */
  def asOfNearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTiebreak: String,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // build side 0 sorts before the probe at equal times: an equal-time
    // right lands in the BACKWARD frame with distance zero and wins the
    // comparison, so the forward frame's exclusion of it is harmless
    val unioned = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, payload, rightTiebreak,
      buildSide = 0, leftCols)

    val wB = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc_nulls_first, col("__side").asc_nulls_first,
        col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc_nulls_first, col("__side").asc_nulls_first,
        col("__tb").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__mf", first(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)

    // null probe times match nothing (see asOf's forward guard)
    def ok(m: Column): Column = col("__t").isNotNull && m.isNotNull &&
      tolerance.fold(lit(true))(p => p(col("__t"), m.getField("__bt")))
    val (bm, fm) = (col("__mb"), col("__mf"))
    val pick = when(ok(bm) && ok(fm),
        when(col("__t") - bm.getField("__bt") <=
          fm.getField("__bt") - col("__t"), bm).otherwise(fm))
      .when(ok(bm), bm)
      .when(ok(fm), fm)

    val out = leftCols.map(c => col("__row").getField(c).as(c)) ++
      payload.map(c => pick.getField("__p").getField(c).as(c))
    carried.select(out: _*)
  }
}
