package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pluggable streaming-source seam: every unbounded pipeline over
  * events consumes the canonical schema `(ts TIMESTAMP, user_id BIGINT,
  * event_type STRING, value DOUBLE)`, so WHERE the stream comes from is
  * a constructor choice, never a query concern. Queries are written
  * once against [[EventSource]] (see [[StreamOps.tumblingOf]]) and run
  * unchanged over any implementation — StreamingSuite swaps all three
  * in-container sources through the same query.
  *
  * The Kafka shape is exactly one more implementation — `readStream
  * .format("kafka")` + value parsing into the canonical columns — with
  * zero changes to any query. [CAP streaming: no broker exists in this
  * container, so that case is stated, not run; the seam it plugs into
  * is what this file proves.]
  */
trait EventSource {
  /** The unbounded canonical-schema frame. Implementations must return
    * a STREAMING DataFrame (isStreaming = true).
    */
  def load(s: SparkSession): DataFrame
}

object EventSource {

  private[streaming] val canonicalCols =
    Seq("ts", "user_id", "event_type", "value")

  /** Directory-tail source: the events table as an unbounded file
    * stream — new files landing in `dir` flow through the same plan
    * (the classic landing-zone ingestion shape).
    */
  final case class FileTail(dir: String) extends EventSource {
    def load(s: SparkSession): DataFrame =
      StreamOps.eventsStream(s, dir).select(canonicalCols.map(col): _*)
  }

  /** Wraps an already-constructed streaming frame (MemoryStream.toDF in
    * tests, or any programmatic feed) carrying the canonical columns.
    */
  final case class Frame(frame: DataFrame) extends EventSource {
    def load(s: SparkSession): DataFrame = {
      require(frame.isStreaming, "Frame source needs a streaming frame")
      frame.select(canonicalCols.map(col): _*)
    }
  }

  /** Synthetic generator on Spark's rate source — the server-class feed
    * (rows keep arriving on wall-clock time, like a socket/Kafka
    * stream; availability is bounded by NOW, so processAllAvailable
    * terminates — rate-micro-batch's offset advances on every poll and
    * would spin it forever). Events derive DETERMINISTICALLY from the
    * contiguous rate counter v: ts = epoch + v minutes, user_id =
    * v mod 3, event_type alternates view/purchase, value = v — so a
    * consumer that has seen N rows can compute every expected window
    * count from N alone, however the micro-batches sliced them.
    */
  final case class Rate(rowsPerSecond: Int) extends EventSource {
    def load(s: SparkSession): DataFrame =
      s.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toLong)
        .load()
        .select(
          expr("timestamp_seconds(value * 60)").as("ts"),
          (col("value") % 3).as("user_id"),
          when(col("value") % 2 === 0, "view").otherwise("purchase")
            .as("event_type"),
          col("value").cast("double").as("value"))
  }
}
