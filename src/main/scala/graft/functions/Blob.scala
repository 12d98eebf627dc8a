package graft.functions

/** Immutable byte payload for Catalyst expressions with CONTENT-based
  * equality. A raw `Array[Byte]` field in a case-class expression makes
  * `equals`/`hashCode` reference-based, so two logically identical
  * expressions never compare `semanticEquals` — defeating subexpression
  * elimination and plan/canonicalization caching for every node carrying
  * a serialized model (bloom filter, PQ codebook). Wrapping the bytes
  * restores structural equality; the hash is computed once (payloads are
  * model-sized — a bloom filter is MBs — so per-comparison hashing would
  * tax analysis).
  */
final class Blob(val bytes: Array[Byte]) extends Serializable {
  // lazy val: computed at most once per JVM instance; Arrays.hashCode is
  // content-based, matching the content-based equals below
  @transient private lazy val hc = java.util.Arrays.hashCode(bytes)
  override def hashCode(): Int = hc
  override def equals(o: Any): Boolean = o match {
    case b: Blob => (b eq this) || java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def toString: String = s"Blob(${bytes.length} bytes)"
}

object Blob {
  def apply(bytes: Array[Byte]): Blob = new Blob(bytes)
}
