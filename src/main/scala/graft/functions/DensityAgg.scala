package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate for non-null density (reference R7/R17: table density
  * gate at tables.py:244-249 — fraction of non-empty cells — and the
  * row-validity density >= 0.5 rule at tables.py:252-263).
  *
  * Input: the per-row count of non-null cells over a known row width.
  * Buffer: (nonNull, rows). Output: nonNull / (rows * width).
  *
  * An `Aggregator` keeps the merge associative, so Spark runs it as a
  * partial (map-side) aggregation + merge — the same two-phase shape as
  * built-in aggregates, safe at any scale.
  */
case class DensityBuf(var nonNull: Long, var rows: Long)

class RowDensityAgg(width: Int) extends Aggregator[Int, DensityBuf, Double] {
  override def zero: DensityBuf = DensityBuf(0L, 0L)
  override def reduce(b: DensityBuf, rowNonNull: Int): DensityBuf = {
    b.nonNull += rowNonNull; b.rows += 1; b
  }
  override def merge(a: DensityBuf, b: DensityBuf): DensityBuf = {
    a.nonNull += b.nonNull; a.rows += b.rows; a
  }
  override def finish(b: DensityBuf): Double =
    if (b.rows == 0) 0.0 else b.nonNull.toDouble / (b.rows * width)
  override def bufferEncoder: Encoder[DensityBuf] = Encoders.product[DensityBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
