package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Typed bloom-filter aggregation over LONG keys: the snapshot layer's
  * per-file bloom sidecars are built in ONE aggregation pass over a
  * staged batch — `groupBy(input_file_name).agg(bloom of key)` — instead
  * of one filtered job per file. The buffer is Spark's own mergeable
  * `util.sketch.BloomFilter` (the same structure `df.stat.bloomFilter`
  * and the `q_join_bloom` runtime filter use), so map-side partials
  * merge exactly and the finished bytes round-trip through
  * `BloomFilter.readFrom` on the probe side.
  *
  * Runs only at stage/commit time on batch-sized data (never on the
  * read path), so the non-codegen Aggregator boundary is irrelevant to
  * query latency.
  */
class BloomLongAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, v: Long): BloomFilter = {
    b.putLong(v); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
