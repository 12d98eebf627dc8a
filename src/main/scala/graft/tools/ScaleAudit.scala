package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-proof of the most expensive plans: replicate the
  * sf0.1 corpus `copies`× into a synthetic ~sf1 corpus with RE-SALTED
  * keys (so join/group cardinalities scale honestly rather than
  * collapsing onto 10 clones of every key), run the audit queries at
  * both scales, and assert wall-time stays within 1.5× of linear.
  *
  * Honest-scaling rules, per table:
  *   - region/nation stay fixed (dimension tables don't scale on a real
  *     cluster either; they are the broadcast sides).
  *   - fact keys shift by copy·(max+1): every copy joins to its own
  *     copy of the referenced rows, so join fanout and group counts
  *     scale ×copies while per-key group SIZE stays constant.
  *   - documents.text goes through a per-copy letter bijection (a
  *     rotated-alphabet `translate`): a bijection preserves every
  *     intra-copy similarity EXACTLY (duplicate docs stay duplicates,
  *     shingle/minhash/simhash structure is isomorphic) while
  *     cross-copy shingle sets share nothing — without this, every doc
  *     would acquire 9 near-identical clones and LSH candidate pairs
  *     would grow quadratically in copies, a workload artifact the
  *     engine would be falsely blamed for.
  *   - embeddings get a per-copy nudge on dimension 0 — cells and
  *     neighbor structure scale linearly instead of stacking 10
  *     coincident points on every vector.
  *
  * For a query linear in rows with fixed overhead a (t = a + b·n),
  * t_big/t_small = (a + c·b)/(a + b) ≤ c for any a ≥ 0 — so the
  * assertion ratio ≤ 1.5·c catches genuinely super-linear behavior
  * (an in-bucket quadratic blowup, a collapsed-partition shuffle, a
  * driver-side accumulation) with headroom for noise, never a merely
  * constant-heavy query. Shuffle partitions scale with the data
  * (32 → 64) like they would on a real cluster.
  *
  * Emits SCALE_AUDIT.json (committed; ScaleAuditSuite regression-locks
  * it) and exits nonzero on any violation.
  */
object ScaleAudit {

  val Copies = 10
  val MaxLinearHeadroom = 1.5

  /** The top-cost plans from the round-8 bench tail — index lifecycles,
    * graph, clustering, LSH, manifest, recursion, self-join — plus the
    * round-10 PQ-ADC search (code scan + per-query top-k + broadcast
    * re-rank fetch: must stay linear in the corpus).
    */
  val auditQueries: Seq[String] = Seq(
    "q_dedup_index_takedown", "q_ivf_index_search", "q_ivf_index_append",
    "q_ivf_index_takedown", "q_graph_triangles", "q_dedup_clusters",
    "q_dedup_minhash", "q_training_manifest", "q_sql_recursive",
    "q_basket_pairs", "q_dedup_embedding", "q_pq_search", "q_ivfpq_search",
    "q_dedup_winnow",
    // round 11: the PassJoin tier (candidate growth is data-dependent —
    // measured here, not argued), the forced-distributed BPE trainer,
    // and the snapshot-table mutation lifecycle (create + file-granular
    // update + delete + read — dominated by the create write, so the
    // bound proves the metadata layer adds no super-linear cost)
    "q_join_edit_distance", "q_entity_resolution",
    "q_bpe_train_distributed", "q_table_snapshot",
    // round 11b: the change-data-feed lifecycle (create + update +
    // delete + manifest-diff changes read) — locks the "IO proportional
    // to churn" claim under measurement; churn here scales linearly
    // with the table (modulus predicates), so the bound is the
    // standard linear one
    "q_table_changes",
    // round 11c: the deletion-vector mutations (vector delete + CoW
    // update compose; merge-on-read update) — the matched sets scale
    // linearly with the table, so both lifecycles must too
    "q_table_delete_vector", "q_table_update_vector",
    // round 12: the SQL DML surface end-to-end (create + parsed
    // UPDATE/DELETE/MERGE/INSERT lowered through GraftDml onto the
    // file-granular verbs) — the parse/lowering layer must add no
    // super-linear cost over the q_table_snapshot lifecycle it wraps
    "q_table_sql_dml",
    // round 14: the named-catalog lifecycle (provider write + catalog
    // DDL + DML by name), the full-clause MERGE (conditional clauses +
    // NMBS probe + cardinality semi-join must all stay ∝ matches), the
    // column-mapping evolution (metadata-only commits + coalesce-read
    // over mixed generations), multi-column partitioning (nested
    // staging + composite-label pruning), and the streaming change
    // feed (per-version micro-batches, IO ∝ churn)
    "q_table_catalog", "q_table_merge_full", "q_table_schema_evolution",
    "q_table_multipart", "q_stream_table_cdf",
    // round 15: the streaming sink (per-micro-batch atomic commits —
    // the commit protocol must stay O(batch), not O(table)), timestamp
    // time travel (resolution is metadata-tier — the lifecycle is the
    // same three commits plus one lookup), write-time schema evolution
    // (evolved-alignment append + evolving MERGE), identity assignment
    // (global-rank prefix sums must scale with the BATCH), and
    // clustered compaction (one range re-sort — n log n, inside the
    // linear-with-headroom bound)
    "q_stream_table_sink", "q_table_timetravel_ts",
    "q_table_merge_schema", "q_table_identity", "q_table_recluster",
    // the multi-dimension z-order rewrite: stats pass + interleave +
    // range sort — n log n, inside the linear-with-headroom bound
    "q_table_zorder",
    // round 16: the bucketed fact-fact join lifecycle (two bucketed
    // creates + a mutation rewrite + the exchange-free join) — the
    // bucket shuffles at create are ∝ data, the join is ∝ data with
    // NO exchange, so the whole lifecycle must stay linear
    "q_table_bucket_join",
    // round 17: hidden partitioning (transform-label staging + pruned
    // mutations must stay ∝ data; the label derivation is one codegen
    // projection inside the staging shuffle) and the composed
    // partition × bucket layout (one shuffle stages both, mutations
    // relabel AND re-bucket, the final agg is exchange-free)
    "q_table_partition_transform", "q_table_bucket_compose",
    // round 18: the refs lifecycle (branch fork + two branch appends +
    // TVF audit + fast-forward publish + tag read) — branch commits
    // stage ∝ their batch and publish is metadata-only, so the whole
    // lifecycle must stay ∝ data like any other table lifecycle —
    // and SQL DML on a branch (UPDATE/DELETE/INSERT through
    // graft_branch_dml + both publish modes incl. cherry-pick): the
    // branch verbs are the SAME file-granular verbs, so the lifecycle
    // must scale like q_table_sql_dml
    // the column-stats lifecycle (clustered create + stats publish +
    // DESCRIBE reads): the stats pass rides the staging write and the
    // publish is metadata-tier, so the lifecycle is create-bound
    "q_table_refs", "q_table_branch_dml", "q_table_colstats",
    // round 19: the materialized-view lifecycle (create MV + mutation
    // gauntlet + incremental refresh) — the refresh reads ONLY the
    // netted change-feed delta, but the gauntlet's churn is modulus-
    // scoped (∝ data), so the lifecycle bound is the standard linear
    // one; the INCREMENTAL property itself is suite-asserted (the
    // refresh mode is required to be "incremental") — and the
    // TWO-TIER manifest lifecycle (18 commits crossing the grouping
    // threshold at the re-anchor + a group-pruned one-partition read
    // whose metadata cost the lambda REQUIRES to be one group / zero
    // listings): the commits stage ∝ data, so linear overall
    "q_table_mv", "q_table_metadata_tier",
    // round 20: the avg/min/max MV lifecycle (the delete-touched-group
    // recompute is churn-scoped on the group dimension; the gauntlet
    // churn is modulus-scoped ∝ data — standard linear bound) — and
    // the CLUSTER-RANGE two-tier lifecycle (clustered compact ∝ data,
    // chunk-pruned narrow read; the lambda REQUIRES the metadata cost:
    // a fraction of the chunk groups, zero listings)
    "q_table_mv_avg", "q_table_cluster_tier")

  /** Audit-only runners for scale paths that have no driver query entry:
    * the distributed BPE merge rounds are forced via localDictLimit = 0
    * (the production q_bpe_train correctly picks the driver loop at this
    * vocabulary size; BpeSuite asserts both paths identical — this
    * audits the distributed path's SCALING, per VERDICT r10 item 4).
    */
  val extraAudits: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_train_distributed" -> ((s, d) => {
      import s.implicits._
      graft.operators.BpeOps
        .train(graft.Tables.documents(s, d), localDictLimit = 0)
        .merges.toDF("merge_idx", "left_sym", "right_sym", "pair_freq")
    }))

  /** Queries whose OUTPUT is inherently super-linear in the corpus
    * (all-pairs similarity at a low threshold emits ~p·n² pairs for a
    * data-constant p — measured 0.2% of ALL pairs ≥ 0.35 on this
    * corpus, the same rate across re-salted copies, so a 10× corpus
    * has ~100× true result pairs no engine can avoid materializing).
    * The honest standard for these is OUTPUT-SENSITIVE complexity:
    * time within the headroom of max(input growth, output growth).
    */
  val outputSensitive: Set[String] = Set("q_dedup_embedding")

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  private def keyOffset(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head.getLong(0) + 1L

  /** One copy of a table with its fact keys shifted into the copy's own
    * key space.
    */
  private def shiftKeys(df: DataFrame, copy: Int,
      offsets: Map[String, Long]): DataFrame =
    offsets.foldLeft(df) { case (d, (k, o)) =>
      d.withColumn(k, col(k) + lit(copy * o))
    }

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    Seq("region", "nation").foreach(t => write(t, src(t)))

    val kc = keyOffset(src("customer"), "c_custkey")
    val ks = keyOffset(src("supplier"), "s_suppkey")
    val kp = keyOffset(src("part"), "p_partkey")
    val ko = keyOffset(src("orders"), "o_orderkey")
    val ke = keyOffset(src("events"), "event_id")
    val ku = keyOffset(src("events"), "user_id")
    val kd = keyOffset(src("documents"), "doc_id")
    val kv = keyOffset(src("embeddings"), "vec_id")

    def replicate(t: String, perCopy: (DataFrame, Int) => DataFrame): Unit =
      write(t, (0 until Copies).map(i => perCopy(src(t), i))
        .reduce(_.union(_)))

    replicate("customer", (d, i) => shiftKeys(d, i, Map("c_custkey" -> kc)))
    replicate("supplier", (d, i) => shiftKeys(d, i, Map("s_suppkey" -> ks)))
    // p_name goes through the same per-copy letter bijection as
    // documents.text: a symbol renaming preserves every intra-copy
    // Levenshtein distance EXACTLY (the PassJoin pair structure is
    // isomorphic per copy) while the name vocabulary honestly grows
    // ×copies — without it, distinct(p_name) collapses the 10 copies
    // back to 1× and the edit-distance audits measure nothing
    replicate("part", (d, i) => {
      val rot = lower.drop(i) + lower.take(i)
      shiftKeys(d, i, Map("p_partkey" -> kp))
        .withColumn("p_name",
          translate(col("p_name"), lower + upper, rot + rot.toUpperCase))
    })
    replicate("orders", (d, i) =>
      shiftKeys(d, i, Map("o_orderkey" -> ko, "o_custkey" -> kc)))
    replicate("lineitem", (d, i) =>
      shiftKeys(d, i, Map("l_orderkey" -> ko, "l_partkey" -> kp,
        "l_suppkey" -> ks)))
    replicate("events", (d, i) =>
      shiftKeys(d, i, Map("event_id" -> ke, "user_id" -> ku)))
    replicate("documents", (d, i) => {
      val rot = lower.drop(i) + lower.take(i)
      shiftKeys(d, i, Map("doc_id" -> kd))
        .withColumn("text",
          translate(col("text"), lower + upper, rot + rot.toUpperCase))
    })
    replicate("embeddings", (d, i) =>
      // per-copy SIGNED PERMUTATION (cyclic coordinate shift + sign
      // flips) — an orthogonal map, so every intra-copy cosine (and
      // thus the pair/cell/neighbor structure) is preserved EXACTLY,
      // while cross-copy geometry decorrelates: the embedding analog
      // of the documents letter bijection. Copy 0 stays identity.
      if (i == 0) shiftKeys(d, i, Map("vec_id" -> kv))
      else shiftKeys(d, i, Map("vec_id" -> kv))
        .withColumn("embedding", expr(
          s"transform(embedding, (v, ix) -> CAST(" +
            s"(CASE WHEN pmod(ix * 13 + $i * 7, 2) = 0 THEN 1.0 ELSE -1.0 END)" +
            s" * element_at(embedding, " +
            s"CAST(pmod(ix + $i, size(embedding)) AS INT) + 1) AS FLOAT))")))
  }

  private def timeQuery(spark: SparkSession, dir: String, name: String,
      reps: Int): (Double, Long) = {
    val fn = graft.SparkEntry.queries.getOrElse(name, extraAudits(name))
    var best = Double.MaxValue
    var rows = 0L
    var r = 0
    while (r < reps) {
      // cache-cold reps: queries that persist() intermediates register
      // them in the CacheManager keyed by analyzed plan, so a repeated
      // identical query rides the previous rep's cache. At the SMALL
      // scale everything fits and rep 2 reads ~0 bytes; at 10x the
      // cache partially evicts and rep 2 recomputes — min-of-reps then
      // compares cached-vs-uncached and the "ratio" measures single-
      // host MEMORY CAPACITY, not the plan's scaling (profiled r16:
      // q_dedup_minhash stage-level cold ratio is ~1.5x for 10x data,
      // linear; the cached-small artifact alone produced 14.8).
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      rows = fn(spark, dir).count()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      r += 1
    }
    (best, rows)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bigDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"[scale-audit] building ${Copies}x corpus at $bigDir ...")
    val tb0 = System.nanoTime()
    buildScaled(spark, srcDir, bigDir)
    println(f"[scale-audit] built in ${(System.nanoTime() - tb0) / 1e9}%.1f s")
    val nSmall = spark.read.parquet(s"$srcDir/lineitem.parquet").count()
    val nBig = spark.read.parquet(s"$bigDir/lineitem.parquet").count()
    require(nBig == Copies * nSmall, s"replication broken: $nBig vs $nSmall")

    // small scale first at the standard 32 shuffle partitions
    val small = auditQueries.map { q =>
      val (t, n) = timeQuery(spark, srcDir, q, reps)
      println(f"[scale-audit] small $q: $t%.2f s ($n rows)")
      q -> ((t, n))
    }.toMap
    // big scale: partitions scaled with the data, caches dropped so the
    // big runs can't ride small-scale persisted frames
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    val big = auditQueries.map { q =>
      val (t, n) = timeQuery(spark, bigDir, q, reps)
      println(f"[scale-audit] big   $q: $t%.2f s ($n rows)")
      q -> ((t, n))
    }.toMap

    val maxRatio = MaxLinearHeadroom * Copies
    val rows = auditQueries.map { q =>
      val (ts, ns) = small(q); val (tb, nb) = big(q)
      val r = tb / ts
      // output-sensitive queries are bounded by the LARGER of input and
      // output growth — a result set that is itself 100x has no
      // sub-100x materialization
      val bound =
        if (outputSensitive(q) && ns > 0)
          MaxLinearHeadroom * math.max(Copies.toDouble, nb.toDouble / ns)
        else maxRatio
      (q, ts, tb, r, ns, nb, bound)
    }
    def sec(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qjson = rows.map { case (q, ts, tb, r, ns, nb, bound) =>
      s""""$q":{"t_small":${sec(ts)},"t_big":${sec(tb)},"ratio":${sec(r)},""" +
        s""""out_small":$ns,"out_big":$nb,"bound":${sec(bound)}}"""
    }.mkString("{", ",", "}")
    val pass = rows.forall(t => t._4 <= t._7)
    val line =
      s"""{"copies":$Copies,"small_dir":"$srcDir","big_dir":"$bigDir",""" +
      s""""lineitem_rows_small":$nSmall,"lineitem_rows_big":$nBig,""" +
      s""""shuffle_partitions":{"small":32,"big":64},"reps":$reps,""" +
      s""""max_linear_ratio":${sec(maxRatio)},"queries":$qjson,"pass":$pass}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/SCALE_AUDIT.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    rows.filter(t => t._4 > t._7).foreach { case (q, ts, tb, r, _, _, b) =>
      System.err.println(
        f"[scale-audit] SUPER-LINEAR $q: $ts%.2f s -> $tb%.2f s " +
          f"(ratio $r%.1f > $b%.1f)")
    }
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
