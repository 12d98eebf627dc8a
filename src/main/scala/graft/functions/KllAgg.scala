package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A serializable wrapper around a mutable KLL quantile sketch: the
  * sketch itself is not `java.io.Serializable`, so the shuffle
  * round-trips its compact byte image through custom (de)serialization
  * hooks. KLL (Karnin-Lang-Liberty, the standard streaming-quantiles
  * sketch) is fully MERGEABLE — per-file sketches recorded at staging
  * time union into an exact-shape table quantile ladder with zero
  * re-scan, the same design the HLL-NDV stats ride.
  */
final class KllBuf(k: Int) extends Serializable {
  @transient var sk: KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val bytes = sk.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    val n = in.readInt()
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
  }
}

/** Typed KLL quantile aggregation over doubles: one accumulator in the
  * staged-batch stats pass (`groupBy(input_file_name).agg(...)`), so
  * every data file carries a ~1 KB quantile sketch the CBO histogram
  * builder merges driver-side. NaN marks a NULL input (the caller
  * coalesces) and is skipped — NULLs have no quantile position.
  *
  * Runs only at stage/commit time on batch-sized data (never on the
  * read path), so the non-codegen Aggregator boundary is irrelevant to
  * query latency.
  */
class KllDoubleAgg(k: Int = 128)
    extends Aggregator[Double, KllBuf, Array[Byte]] {
  override def zero: KllBuf = new KllBuf(k)
  override def reduce(b: KllBuf, v: Double): KllBuf = {
    if (!java.lang.Double.isNaN(v)) b.sk.update(v)
    b
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    a.sk.merge(b.sk)
    a
  }
  override def finish(b: KllBuf): Array[Byte] = b.sk.toByteArray
  override def bufferEncoder: Encoder[KllBuf] =
    Encoders.javaSerialization[KllBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
