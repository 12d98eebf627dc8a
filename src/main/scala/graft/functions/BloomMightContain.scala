package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native Catalyst expression.
  *
  * The 100 TB use: a selective dimension that is too large to broadcast
  * *as rows* still compresses to a few MB *as a bloom filter*. Building
  * the filter on the dim keys and pre-filtering the fact side before the
  * shuffle join cuts the shuffled fact volume to (selectivity + fpp) of
  * the input — the classic "runtime filter" (Spark's own
  * spark.sql.optimizer.runtime.bloomFilter does this for some shapes;
  * this expression is the explicit, plannable form, usable in any
  * pipeline stage). False positives are harmless: the join that follows
  * restores exact semantics, so oracle results are unchanged.
  *
  * The serialized filter rides in the expression (one copy per task
  * binary via `addReferenceObj`, NOT per row); deserialization is
  * memoized per byte-array identity so eval and codegen paths share one
  * decoded `BloomFilter` per JVM.
  *
  * Reference analog: R3/R21's existence probes (main.py:90,
  * database.py:43-61) are exact per-row SELECTs; at scale the same
  * "does this key exist over there" question is answered approximately
  * first, exactly second.
  */
object BloomFilters {

  /** bytes -> decoded filter, memoized per array instance with WEAK
    * keys: each Spark task deserializes its own byte[] from the task
    * binary, so a strong identity map would retain one decoded filter
    * per task forever on a long-lived executor. Weak keys let entries
    * die with their task binary; byte[] equality is identity, so
    * WeakHashMap hashes exactly like the IdentityHashMap did.
    */
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  def fromBytes(bytes: Array[Byte]): BloomFilter = {
    val hit = cache.get(bytes)
    if (hit != null) hit
    else {
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      cache.put(bytes, bf)
      bf
    }
  }

  def mightContainLong(bytes: Array[Byte], v: Long): Boolean =
    fromBytes(bytes).mightContainLong(v)

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}

/** `might_contain(keyCol)` over a pre-built filter; LongType child.
  * Participates in whole-stage codegen (direct static call, no UDF
  * serialization per batch, no fallback row materialization). The filter
  * rides as a [[Blob]] (content-based equality) so two expressions built
  * from the same serialized filter canonicalize equal — keeping
  * subexpression elimination and plan caching effective.
  */
case class BloomMightContainExpr(child: Expression, bloom: Blob)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    BloomFilters.mightContainLong(bloom.bytes, v.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBytes", bloom.bytes, "byte[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomFilters.mightContainLong($ref, $v);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainExpr = copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainExpr {
  import org.apache.spark.sql.GraftShim

  /** Column entry point: true iff `key` (cast to long) may be in `bf`. */
  def might_contain(key: Column, bf: BloomFilter): Column =
    GraftShim.column(BloomMightContainExpr(
      GraftShim.expression(key.cast("long")),
      Blob(BloomFilters.serialize(bf))))
}
