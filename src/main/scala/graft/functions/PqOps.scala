package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product-quantization primitives as native Catalyst expressions.
  *
  * PQ is the memory face of 100 TB ANN: a `dim`-float vector compresses
  * to `m` bytes (one codebook index per subspace), so the candidate scan
  * reads codes at 32x less IO than raw vectors, and the asymmetric
  * distance computation (ADC) scores a candidate with `m` table lookups
  * instead of `dim` multiplies. Exactness is restored downstream by
  * re-ranking the top ADC candidates against their true vectors —
  * approximate first, exact second, like the bloom-pre-filtered join.
  *
  * Layout of a serialized codebook: int m, int k, int subdim, then
  * m*k*subdim doubles (codebook[mi][ki] is the ki-th center of subspace
  * mi). The bytes ride in the expression once per task binary
  * (`addReferenceObj`), decoded once per JVM (identity-memoized).
  *
  * All three expressions are single fused loops inside whole-stage
  * codegen — no UDF serialization, no interpreted lambdas, no
  * per-row intermediate allocations beyond their return values.
  */
object Pq {

  def serialize(cb: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    // codes are one BYTE per subspace (encode stores the argmin index
    // via toByte): a codebook with k > 256 would silently wrap indices
    // into wrong-center ADC distances — fail at fit time instead
    require(k <= 256, s"PQ codebook k=$k exceeds the byte code range (256)")
    val buf = java.nio.ByteBuffer.allocate(12 + 8 * m * k * sub)
    buf.putInt(m).putInt(k).putInt(sub)
    cb.foreach(_.foreach(_.foreach(buf.putDouble)))
    buf.array()
  }

  /** Decoded form kept flat for the hot loops: (m, k, sub, doubles). */
  final class Codebook(val m: Int, val k: Int, val sub: Int,
      val flat: Array[Double])

  // weak keys: each task deserializes its own byte[] from the task
  // binary; a strong identity map would retain one decoded codebook per
  // task forever (see BloomFilters.cache)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], Codebook]())

  def fromBytes(bytes: Array[Byte]): Codebook = {
    val hit = cache.get(bytes)
    if (hit != null) hit
    else {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val m = buf.getInt; val k = buf.getInt; val sub = buf.getInt
      val flat = Array.ofDim[Double](m * k * sub)
      var i = 0
      while (i < flat.length) { flat(i) = buf.getDouble; i += 1 }
      val cbk = new Codebook(m, k, sub, flat)
      cache.put(bytes, cbk)
      cbk
    }
  }

  /** vector -> m codebook indices (one byte per subspace): per subspace
    * the argmin-L2 center, ties to the lowest index.
    */
  def encode(cbBytes: Array[Byte], v: ArrayData): Array[Byte] = {
    val cb = fromBytes(cbBytes)
    val out = Array.ofDim[Byte](cb.m)
    var mi = 0
    while (mi < cb.m) {
      var bestK = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < cb.k) {
        val base = (mi * cb.k + ki) * cb.sub
        var d = 0.0
        var j = 0
        while (j < cb.sub) {
          val diff = v.getFloat(mi * cb.sub + j).toDouble - cb.flat(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = ki }
        ki += 1
      }
      out(mi) = bestK.toByte
      mi += 1
    }
    out
  }

  /** query vector -> ADC lookup table (m*k doubles): entry mi*k+ki is
    * the squared L2 distance between the query's mi-th subvector and
    * center ki of subspace mi. Computed once per query row; every
    * candidate then scores in m lookups.
    */
  def lut(cbBytes: Array[Byte], v: ArrayData): ArrayData = {
    val cb = fromBytes(cbBytes)
    val out = Array.ofDim[Double](cb.m * cb.k)
    var mi = 0
    while (mi < cb.m) {
      var ki = 0
      while (ki < cb.k) {
        val base = (mi * cb.k + ki) * cb.sub
        var d = 0.0
        var j = 0
        while (j < cb.sub) {
          val diff = v.getFloat(mi * cb.sub + j).toDouble - cb.flat(base + j)
          d += diff * diff
          j += 1
        }
        out(mi * cb.k + ki) = d
        ki += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Flat codebook back to the nested [m][k][sub] shape (for handing a
    * LOADED codebook to the Column entry points, which serialize it).
    */
  def toNested(cb: Codebook): Array[Array[Array[Double]]] =
    Array.tabulate(cb.m, cb.k, cb.sub) { (mi, ki, j) =>
      cb.flat((mi * cb.k + ki) * cb.sub + j)
    }

  /** codes + lut -> approximate squared L2 distance (sum of m lookups).
    * k is recovered from the shapes so the expression carries no extra
    * state.
    */
  def adc(codes: Array[Byte], lutArr: ArrayData): Double = {
    val m = codes.length
    val k = lutArr.numElements() / m
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += lutArr.getDouble(mi * k + (codes(mi) & 0xFF))
      mi += 1
    }
    acc
  }
}

/** `pq_encode(vec)` -> m-byte code under a fixed codebook. The codebook
  * rides as a [[Blob]] so logically identical expressions canonicalize
  * equal (see BloomMightContainExpr).
  */
case class PqEncodeExpr(child: Expression, cb: Blob)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    Pq.encode(cb.bytes, v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb.bytes, "byte[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Pq.encode($ref, $v);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `pq_lut(queryVec)` -> m*k ADC table under a fixed codebook. */
case class PqLutExpr(child: Expression, cb: Blob)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Pq.lut(cb.bytes, v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb.bytes, "byte[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Pq.lut($ref, $v);")
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc(codes, lut)` -> approximate squared L2 (m lookups). */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, lutArr: Any): Any =
    Pq.adc(codes.asInstanceOf[Array[Byte]], lutArr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.Pq.adc($c, $l);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

object PqOps {
  def pq_encode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftShim.column(
      PqEncodeExpr(GraftShim.expression(vec), Blob(Pq.serialize(cb))))
  def pq_lut(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftShim.column(
      PqLutExpr(GraftShim.expression(vec), Blob(Pq.serialize(cb))))
  def pq_adc(codes: Column, lut: Column): Column =
    GraftShim.column(PqAdcExpr(
      GraftShim.expression(codes), GraftShim.expression(lut)))
}
