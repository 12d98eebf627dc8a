package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table.
  *
  * Each operator has two forms:
  *   - the batch form registered in `SparkEntry.queries` (DuckDB-oracled:
  *     identical aggregation expressed over the static table);
  *   - the streaming form (`readStream`/MemoryStream) exercised in
  *     `StreamingSuite` — same `window`/`session_window`/`withWatermark`
  *     expressions over an unbounded source.
  *
  * Spark's time windows are epoch-aligned, so a 1-hour tumbling window
  * start equals `date_trunc('hour', ts)` and a 15-minute slide enumerates
  * the 4 surrounding starts — that equivalence is what the oracle SQL
  * replays. At scale, windowed aggregation shuffles once on (window, key)
  * with map-side partial aggregation; session windows shuffle on the key
  * then merge sorted runs per key.
  */
object StreamOps {

  /** Tumbling 1-hour window aggregate (streaming form: same expr after
    * `readStream`). */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Det.r4(sum(col("value"))).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .orderBy(col("ws").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Sliding 1-hour window, 15-minute slide. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), graft.Det.r4(sum(col("value"))).as("total"))
      .select(col("w.start").as("ws"), col("n"), col("total"))
      .orderBy(col("ws").asc_nulls_first)

  /** Session window with a 10-minute gap, per user. A new session starts
    * when the gap to the previous event is >= the gap duration (Spark's
    * window is [start, last+gap), so an event landing exactly at the
    * closed end opens a new session — the batch oracle uses `>=` to
    * match).
    */
  def session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), graft.Det.r4(sum(col("value"))).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n"), col("total"))
      .orderBy(col("user_id").asc_nulls_first,
        col("session_start").asc_nulls_first)

  /** Batch replay of watermark late-data dropping: events arrive in
    * event_id order; the watermark before each row is the running max
    * event time minus 10 minutes; rows older than that are dropped, then
    * a tumbling hourly count aggregates survivors. (This per-record
    * watermark is deliberately stricter than Spark's per-micro-batch
    * watermark; the true streaming semantics are covered by
    * StreamingSuite with a MemoryStream.)
    *
    * The running max is computed shard-and-offset (like the sharded
    * sequence pack): a global prefix max equals greatest(within-shard
    * prefix max, max over all PREVIOUS shards), `greatest` skipping
    * nulls. Shards are event_id ranges (order-preserving), so no
    * single-task window touches event-scale data — only the per-shard
    * maxima frame, which is id-range/shardWidth rows. That frame is
    * model-state ONLY if shardWidth scales with the corpus (pick
    * ~rows/cluster-cores; the decomposition nests another level if even
    * that frame grows too large). The default is sized to exercise
    * multiple shards at test scale, not for production id ranges.
    */
  def watermarkLate(s: SparkSession, d: String,
      shardWidth: Long = 4096L): DataFrame = {
    val base = Tables.events(s, d)
      .withColumn("__shard", floor(col("event_id") / shardWidth))
    val wIn = Window.partitionBy(col("__shard"))
      .orderBy(col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wShard = Window.orderBy(col("__shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__shard"))
      .agg(max(col("ts")).as("__sh_max"))
      .withColumn("__off", max(col("__sh_max")).over(wShard))
      .select(col("__shard"), col("__off"))
    // null-safe shard key: an inner join would drop a null event_id row
    // that the windowed form keeps
    val withPrev = base.withColumn("__in_prev", max(col("ts")).over(wIn))
    withPrev
      .join(broadcast(offsets),
        withPrev("__shard") <=> offsets("__shard"))
      .withColumn("wm_base", greatest(col("__in_prev"), col("__off")))
      .filter(col("wm_base").isNull ||
        col("ts") >= col("wm_base") - expr("INTERVAL 10 MINUTES"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .orderBy(col("ws").asc_nulls_first)
  }

  /** Batch form of the stream-stream interval join: purchases matched to
    * the same user's views they follow within one hour, aggregated per
    * user. The streaming form is [[streamStreamJoin]]; this form states
    * the identical relational semantics for the DuckDB oracle. One
    * co-partitioned equi-join on user_id with a range residual — at
    * scale both sides shuffle once on the key.
    */
  def streamJoinBatch(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("min_lag_us"))
      .orderBy(col("user_id").asc_nulls_first)
  }

  /** Stream-stream inner join with event-time interval bounds: each
    * side carries a 1-hour watermark and the join condition bounds
    * purchase_ts to (view_ts, view_ts + 1h], so Spark can size BOTH
    * state buffers to the watermark horizon and evict matched/expired
    * rows — the property that makes a stream-stream join runnable
    * forever at corpus scale (unbounded-state joins are rejected by the
    * engine). Cross-micro-batch matching is pinned in StreamingSuite.
    *
    * `views` needs (user_id, view_ts); `purchases` (p_user, purchase_ts).
    */
  def streamStreamJoin(views: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame =
    views.withWatermark("view_ts", "1 hour")
      .join(purchases.withWatermark("purchase_ts", "1 hour"),
        expr("user_id = p_user AND purchase_ts > view_ts AND " +
          "purchase_ts <= view_ts + INTERVAL 1 HOUR"),
        joinType)
      .select(col("user_id"), col("view_ts"), col("purchase_ts"))

  /** File-source streaming form: the events table as an unbounded
    * stream (`readStream` + pathGlobFilter) — new files arriving in the
    * directory would flow through the same plan. Same nanos handling as
    * the batch loader.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin the session TZ so the NTZ cast below is wall-clock-preserving
    // regardless of host default — see Tables.events.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // readStream needs a declared schema; probe the file's physical ts
    // type from the batch footer (cheap, metadata-only) so the stream
    // matches whichever encoding the generator used — see Tables.events.
    val physical = s.read.parquet(s"$d/events.parquet").schema
    val stream = s.readStream
      .schema(physical)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    physical("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => stream
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other; expected " +
          "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** The source-agnostic streaming tumbling aggregation — the query is
    * written ONCE against the [[EventSource]] seam; which unbounded
    * source feeds it (file-tail, in-memory, rate generator, a future
    * Kafka case) is the caller's constructor choice. StreamingSuite runs
    * this identical function over all three in-container sources.
    */
  def tumblingOf(src: EventSource, s: SparkSession): DataFrame =
    src.load(s)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))

  /** Streaming tumbling aggregation over the file source — identical
    * expressions to the batch `tumbling`, exercised end-to-end in
    * StreamingSuite with an AvailableNow trigger. Defined through the
    * [[EventSource]] seam (the file path is just one implementation).
    */
  def tumblingStream(s: SparkSession, d: String): DataFrame =
    tumblingOf(EventSource.FileTail(d), s)

  /** Streaming MERGE sink: every micro-batch upserts into a parquet
    * table keyed by `key` (batch rows win column-wise) via foreachBatch —
    * the lakehouse streaming-sink pattern. The per-batch merge is the
    * same full-outer-join formulation as `QualityOps.q_merge_upsert`.
    *
    * Commit protocol: the merged state is fully written to a stage
    * directory, then published with delete+rename (one metadata swap —
    * not two full writes). Crash recovery enumerates the states: during
    * the stage write the target is untouched; between stage completion
    * and delete the target is still the old epoch (the replayed batch
    * re-merges into it idempotently); between delete and rename the
    * target is absent but the stage holds the complete merged state, so
    * the next epoch reads the stage as its merge source. True
    * exactly-once with concurrent readers needs a transactional table
    * format (Delta/Iceberg) — a format concern, not a planning one.
    */
  def upsertSink(stream: DataFrame, tablePath: String, key: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    CheckpointTuning.forLocalCheckpoint(stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(tablePath)
        val stage = new org.apache.hadoop.fs.Path(tablePath + "__stage")
        val fs = target.getFileSystem(s.sparkContext.hadoopConfiguration)
        val cols = batch.columns.filterNot(_ == key)
        val sourcePath =
          if (fs.exists(target)) Some(tablePath)
          else if (fs.exists(stage)) Some(stage.toString) // crashed mid-publish
          else None
        val merged = sourcePath match {
          case None => batch
          case Some(p) =>
            val t = s.read.parquet(p).alias("t")
            val b = batch.alias("b")
            t.join(b, col(s"t.$key") === col(s"b.$key"), "full_outer")
              .select((coalesce(col(s"b.$key"), col(s"t.$key")).as(key) +:
                cols.toIndexedSeq.map(c =>
                  coalesce(col(s"b.$c"), col(s"t.$c")).as(c))): _*)
              // eager materialization severs the plan from the files the
              // publish step is about to delete (incl. stage-as-source)
              .localCheckpoint()
        }
        merged.write.mode("overwrite").parquet(stage.toString)
        fs.delete(target, true)
        fs.rename(stage, target)
        ()
      }
      .start()
  }

  /** The snapshot change feed consumed as a FIRST-CLASS streaming
    * source (`readStream.format("graft")` — GraftChangeSource, whose
    * checkpointed offsets are snapshot versions): one aggregate over
    * the full event stream of a create + update + delete + append
    * lifecycle, each version its own micro-batch
    * (processAllAvailable between mutations pins the batch
    * boundaries, so the per-version CDC netting is deterministic and
    * the oracle can replay the event multiset exactly).
    */
  private def tableCdf(s: SparkSession, d: String): DataFrame = {
    import graft.sources.SnapshotTable
    val root = s"/tmp/graft_stream_cdf_${s.sparkContext.applicationId}_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(rp, true)
    val t = s"$root/t"
    val orders = graft.Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    SnapshotTable.create(s, t, orders, numFiles = 4)
    CheckpointTuning.forLocalCheckpoint(s, s"$root/ckpt")
    val agg = s.readStream.format("graft").option("path", t).load()
      .groupBy(col("change_type"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("graft_cdf_events")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable() // v1: the full snapshot as inserts
      SnapshotTable.updateWhere(s, t, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      q.processAllAvailable() // v2: netted delete+insert pairs
      SnapshotTable.deleteWhere(s, t, col("o_orderkey") % 17 === 3)
      q.processAllAvailable() // v3: deletes of the then-current rows
      SnapshotTable.append(s, t,
        orders.filter(col("o_orderkey") % 500 === 11)
          .select((col("o_orderkey") + 20000000).as("o_orderkey"),
            lit("I").as("o_orderstatus"), col("o_totalprice")))
      q.processAllAvailable() // v4: appended inserts
    } finally q.stop()
    s.table("graft_cdf_events")
      .orderBy(col("change_type").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** The streaming round trip over the snapshot layer: table A's
    * change feed streams IN (`readStream.format("graft")`, offsets =
    * versions) and the insert images stream OUT into table B through
    * the exactly-once SINK (`writeStream.format("graft")` —
    * GraftDataSource.GraftSink, one batch-id-carrying atomic commit
    * per micro-batch; replays skipped, StreamingSuite asserts the
    * redelivery and restart cases). B accumulates every insert event
    * across A's create → update → append lifecycle, so the oracle is
    * the exact event-multiset replay. processAllAvailable between
    * mutations pins batch boundaries; the result is
    * boundary-indifferent anyway (endpoint netting composes).
    */
  private def tableSink(s: SparkSession, d: String): DataFrame = {
    import graft.sources.SnapshotTable
    val root = s"/tmp/graft_stream_sink_${s.sparkContext.applicationId}_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(rp, true)
    val a = s"$root/a"
    val b = s"$root/b"
    val orders = graft.Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    SnapshotTable.create(s, a, orders, numFiles = 4)
    CheckpointTuning.forLocalCheckpoint(s, s"$root/ckpt")
    val q = s.readStream.format("graft").option("path", a).load()
      .filter(col("change_type") === "insert").drop("change_type")
      .writeStream.format("graft").option("path", b)
      .option("createIfMissing", "true").option("queryKey", "cdf")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable() // v1: the whole snapshot as inserts
      SnapshotTable.updateWhere(s, a, col("o_orderkey") % 100 === 0,
        Map("o_orderstatus" -> lit("X")))
      q.processAllAvailable() // v2: the updated rows' insert images
      SnapshotTable.append(s, a,
        orders.filter(col("o_orderkey") % 500 === 11)
          .select((col("o_orderkey") + 20000000).as("o_orderkey"),
            lit("I").as("o_orderstatus"), col("o_totalprice")))
      q.processAllAvailable() // v3: the appended inserts
    } finally q.stop()
    SnapshotTable.read(s, b)
      .orderBy(col("o_orderkey").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first,
        col("o_totalprice").asc_nulls_first)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (tumbling _),
    "q_stream_sliding" -> (sliding _),
    "q_stream_session" -> (session _),
    "q_stream_watermark_late" -> ((s, d) => watermarkLate(s, d)),
    "q_stream_join" -> (streamJoinBatch _),
    "q_stream_table_cdf" -> (tableCdf _),
    "q_stream_table_sink" -> (tableSink _)
  )

  val oracle: Map[String, String] = Map(
    // the insert-event multiset of the source lifecycle, accumulated
    // by the exactly-once sink: v1 = every row, v2 = the updated rows'
    // post-images ('X'), v3 = the appended 'I' rows. A sink that
    // double-commits a replayed batch (or drops one) breaks the hash.
    "q_stream_table_sink" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'X', o_totalprice FROM orders
        |WHERE o_orderkey % 100 = 0
        |UNION ALL
        |SELECT o_orderkey + 20000000, 'I', o_totalprice FROM orders
        |WHERE o_orderkey % 500 = 11
        |ORDER BY o_orderkey ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST,
        |  o_totalprice ASC NULLS FIRST""".stripMargin,
    // the change-event multiset replayed version by version: v1 = all
    // rows as inserts; v2 = a delete (old status) + insert ('X') pair
    // per %100 match; v3 = deletes of the post-update rows matching
    // %17; v4 = the appended 'I' inserts
    "q_stream_table_cdf" ->
      """WITH v1 AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders),
        |v2m AS (SELECT * FROM v1 WHERE o_orderkey % 100 = 0),
        |cur2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN 'X'
        |      ELSE o_orderstatus END AS o_orderstatus
        |  FROM v1),
        |events AS (
        |  SELECT 'insert' AS ct, o_orderstatus FROM v1
        |  UNION ALL SELECT 'delete', o_orderstatus FROM v2m
        |  UNION ALL SELECT 'insert', 'X' FROM v2m
        |  UNION ALL SELECT 'delete', o_orderstatus FROM cur2
        |    WHERE o_orderkey % 17 = 3
        |  UNION ALL SELECT 'insert', 'I' FROM orders
        |    WHERE o_orderkey % 500 = 11)
        |SELECT ct AS change_type, o_orderstatus, count(1) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY change_type ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  count(1) AS n, floor((sum(value)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2
        |ORDER BY ws ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "q_stream_sliding" ->
      """SELECT make_timestamp((CAST(floor(epoch(ts)/900) AS BIGINT) - s.i)
        |    * 900 * 1000000) AS ws,
        |  count(1) AS n, floor((sum(value)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) s
        |GROUP BY 1 ORDER BY ws ASC NULLS FIRST""".stripMargin,
    "q_stream_session" ->
      """WITH gaps AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END
        |      AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM gaps)
        |SELECT user_id, min(ts) AS session_start,
        |  count(1) AS n, floor((sum(value)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,
    "q_stream_watermark_late" ->
      """WITH arr AS (
        |  SELECT ts, max(ts) OVER (ORDER BY event_id ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base
        |  FROM events)
        |SELECT date_trunc('hour', ts) AS ws, count(1) AS n
        |FROM arr
        |WHERE wm_base IS NULL OR ts >= wm_base - INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY ws ASC NULLS FIRST""".stripMargin,
    "q_stream_join" ->
      """WITH v AS (
        |  SELECT user_id, ts AS view_ts FROM events
        |  WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id AS p_user, ts AS purchase_ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT user_id, count(1) AS n_pairs,
        |  min(epoch_us(purchase_ts) - epoch_us(view_ts)) AS min_lag_us
        |FROM v JOIN p ON user_id = p_user
        |  AND purchase_ts > view_ts
        |  AND purchase_ts <= view_ts + INTERVAL 1 HOUR
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin
  )
}
