package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 5-gram polynomial hashes for winnowing as ONE fused loop per
  * document (the higher-order `transform(sequence(..), p ->
  * aggregate(..))` formulation runs interpreted per position and
  * allocates a struct per k-gram — measured ~10 s at sf0.1 vs well
  * under a second here). Element i (0-based) is the hash of the 5
  * CODE POINTS starting at character i+1 — exactly
  * `aggregate(transform(sequence(0,4), j -> ascii(substr(text, p+j,
  * 1))), 0L, (acc,x) -> (acc*31+x) % 1000000007)`, which is also what
  * the DuckDB oracle computes, so oracle parity is untouched.
  */
object TextHashes {
  private final val M = 1000000007L

  def kgram5(s: UTF8String): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length - 4
    if (n <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = Array.ofDim[Long](n)
      var p = 0
      while (p < n) {
        var h = 0L
        var j = 0
        while (j < 5) { h = (h * 31 + cps(p + j)) % M; j += 1 }
        out(p) = h
        p += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `winnow_kgram5(text)` -> array<bigint> of 5-gram hashes. */
case class Kgram5HashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHashes.kgram5(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHashes.kgram5($v);")
  override protected def withNewChildInternal(c: Expression): Kgram5HashExpr =
    copy(child = c)
  override def prettyName: String = "winnow_kgram5"
}

object Kgram5HashExpr {
  def winnow_kgram5(text: Column): Column =
    GraftShim.column(Kgram5HashExpr(GraftShim.expression(text)))
}
