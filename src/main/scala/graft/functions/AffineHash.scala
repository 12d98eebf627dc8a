package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Affine permutation `a*h + b` over Z_2^64 (wrapping long arithmetic).
  *
  * The MinHash permutation family: with `a` odd the map is a bijection
  * mod 2^64, so `min(a*h+b)` over a shingle-hash set is a valid min-wise
  * sample per (a, b). Exists as a native expression because Spark's ANSI
  * mode (on in this engine) makes SQL `*`/`+` throw on long overflow —
  * here the wraparound IS the semantics. Single codegen'd mul+add; no
  * per-permutation re-hash of the underlying bytes.
  */
case class AffineHashExpr(child: Expression, a: Long, b: Long)
    extends UnaryExpression {
  require(a % 2 != 0, "multiplier must be odd for a bijection mod 2^64")
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = a * v.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = ${a}L * $h + ${b}L;")

  override protected def withNewChildInternal(c: Expression): AffineHashExpr =
    copy(child = c)
  override def prettyName: String = "affine_hash"
}

object AffineHash {
  def affine_hash(h: Column, a: Long, b: Long): Column =
    GraftShim.column(AffineHashExpr(GraftShim.expression(h), a, b))
}
