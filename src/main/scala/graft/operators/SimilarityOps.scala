package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (dim-64 float vectors).
  *
  * Two tiers (SURVEY.md §7.6):
  *   - `q_sim_topk_cosine`: brute-force cosine top-k — the exact baseline
  *     and DuckDB-oracled correctness anchor. Quadratic: fine for the
  *     verification corpus, not the 100 TB path.
  *   - `q_sim_ann_lsh`: random-hyperplane LSH — vectors hash to sign-bit
  *     buckets, candidates are same-bucket only, so comparisons drop from
  *     |Q|x|N| to the bucket load. This is the scale path: bucketing is an
  *     equi-join on the signature, shuffle-partitioned by bucket; recall
  *     is tunable by planes/probes (asserted against brute force in
  *     SimilaritySuite).
  *
  * The dot product is a codegen'd `zip_with`/`aggregate` fold in doubles —
  * deterministic left-to-right, matching the oracle's list fold.
  */
object SimilarityOps {

  /** Deterministic pseudo-random unit-ish hyperplanes (LCG, fixed seed)
    * — driver-side constants, broadcast into the plan as literals.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var state = 0x2545F4914F6CDD1DL
    def nextGaussianish(): Double = {
      // xorshift64* -> uniform in [-1, 1); adequate for LSH directions.
      state ^= state >>> 12; state ^= state << 25; state ^= state >>> 27
      val u = (state * 0x2545F4914F6CDD1DL) >>> 11 // 53 random bits
      u.toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes)(Array.fill(dim)(nextGaussianish()))
  }

  import graft.functions.VectorOps.{vec_dot, vec_norm}

  // fused-loop Catalyst expressions (same fold order as the HOF form
  // and the DuckDB oracle's list fold -> bit-equal results)
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", vec_norm(col("embedding")))

  private val dot = (a: String, b: String) => vec_dot(col(a), col(b))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 neighbors for the first 10 query vectors.
    "q_sim_topk_cosine" -> ((s, d) => {
      val e = withNorm(Tables.embeddings(s, d))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val n = e.select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("nrm").as("nn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc_nulls_last, col("nid").asc_nulls_first)
      q.join(broadcast(n), col("qid") =!= col("nid"))
        .withColumn("cos", graft.Det.r4(dot("qe", "ne") / (col("qn") * col("nn"))))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"), col("cos"))
        .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
    }),

    // Matryoshka retrieval (Kusupati et al., NeurIPS'22 MRL): rank
    // candidates on the first 16 of 64 dimensions (4x less arithmetic
    // and memory bandwidth — the coarse tier a truncation-trained
    // embedding buys you), keep the top 20, then re-rank those with the
    // full-dimension cosine to the final top 5. Both tiers are exact
    // deterministic algebra, so the WHOLE two-tier pipeline hash-matches
    // the DuckDB oracle — unlike PQ/LSH/IVF, approximation here costs
    // candidate RECALL only, nothing in the emitted arithmetic.
    "q_sim_matryoshka" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("head", slice(col("embedding"), 1, 16))
        .withColumn("hn", vec_norm(col("head")))
        .withColumn("fn", vec_norm(col("embedding")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("head").as("qh"),
          col("hn").as("qhn"), col("embedding").as("qe"), col("fn").as("qfn"))
      val n = e.select(col("vec_id").as("nid"), col("head").as("nh"),
        col("hn").as("nhn"), col("embedding").as("ne"), col("fn").as("nfn"))
      val w1 = Window.partitionBy(col("qid"))
        .orderBy(col("cos_head").desc_nulls_last, col("nid").asc_nulls_first)
      val w2 = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc_nulls_last, col("nid").asc_nulls_first)
      q.join(broadcast(n), col("qid") =!= col("nid"))
        .withColumn("cos_head",
          graft.Det.r4(dot("qh", "nh") / (col("qhn") * col("nhn"))))
        .withColumn("rnk0", row_number().over(w1))
        .filter(col("rnk0") <= 20)
        .withColumn("cos",
          graft.Det.r4(dot("qe", "ne") / (col("qfn") * col("nfn"))))
        .withColumn("rnk", row_number().over(w2))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"), col("cos"),
          col("cos_head"))
        .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
    }),

    // Binary (sign-bit) quantization ANN: 64 floats -> 64 bits packed
    // into two BIGINT halves (32 bits each keeps the arithmetic inside
    // non-negative longs on BOTH engines — DuckDB errors on BIGINT
    // overflow where Spark wraps), Hamming distance via xor+bit_count as
    // the coarse tier (top 20), exact cosine re-rank to top 5. The third
    // memory tier next to PQ (8 bytes/vector here too, but zero
    // codebooks — the quantizer is data-independent, so signatures never
    // retrain) and, like Matryoshka, every emitted number is exact
    // deterministic algebra: the whole pipeline hash-matches the oracle.
    // The signature fold runs once per ROW (not per pair); the per-pair
    // work is two xor+bit_count ops on longs — all codegen builtins.
    "q_sim_hamming" -> ((s, d) => {
      def sig(half: Int): org.apache.spark.sql.Column = expr(
        s"aggregate(transform(sequence(1, 32), i -> " +
          s"IF(element_at(embedding, CAST(${half * 32} + i AS INT)) >= 0F, " +
          s"shiftleft(1L, 32 - i), 0L)), 0L, (a, x) -> a + x)")
      val e = Tables.embeddings(s, d)
        .withColumn("s0", sig(0)).withColumn("s1", sig(1))
        .withColumn("fn", vec_norm(col("embedding")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("s0").as("q0"),
          col("s1").as("q1"), col("embedding").as("qe"), col("fn").as("qfn"))
      val n = e.select(col("vec_id").as("nid"), col("s0").as("n0"),
        col("s1").as("n1"), col("embedding").as("ne"), col("fn").as("nfn"))
      val w1 = Window.partitionBy(col("qid"))
        .orderBy(col("ham").asc_nulls_last, col("nid").asc_nulls_first)
      val w2 = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc_nulls_last, col("nid").asc_nulls_first)
      q.join(broadcast(n), col("qid") =!= col("nid"))
        .withColumn("ham",
          expr("bit_count(q0 ^ n0) + bit_count(q1 ^ n1)").cast("int"))
        .withColumn("rnk0", row_number().over(w1))
        .filter(col("rnk0") <= 20)
        .withColumn("cos",
          graft.Det.r4(dot("qe", "ne") / (col("qfn") * col("nfn"))))
        .withColumn("rnk", row_number().over(w2))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"), col("cos"), col("ham"))
        .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
    }),

    // LSH-bucketed approximate neighbors: 6 sign-bit planes -> 64
    // buckets; top-3 per query within its bucket. HARD ORACLE since
    // round 11: the plane constants are interpolated into the SQL and
    // the bucket dot is an explicit left-associated multiply-add chain
    // — the identical IEEE operation sequence as the engine's fold, so
    // the sign (and hence every bucket) matches bit-exactly. Recall vs
    // brute force additionally asserted in SimilaritySuite.
    "q_sim_ann_lsh" -> ((s, d) => {
      val planes = hyperplanes(6, 64)
      val planesCol = array(planes.toIndexedSeq.map(p =>
        array(p.toIndexedSeq.map(v => lit(v)): _*)): _*)
      val e = withNorm(Tables.embeddings(s, d))
        .withColumn("planes", planesCol)
        .withColumn("bucket", expr(
          """aggregate(sequence(0, 5), 0, (acc, p) ->
            |  acc * 2 + IF(aggregate(zip_with(embedding, planes[p],
            |    (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),
            |    (s, v) -> s + v) >= 0, 1, 0))""".stripMargin))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      val q = e.select(col("bucket"), col("vec_id").as("qid"),
        col("embedding").as("qe"), col("nrm").as("qn"))
      val n = e.select(col("bucket"), col("vec_id").as("nid"),
        col("embedding").as("ne"), col("nrm").as("nn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc_nulls_last, col("nid").asc_nulls_first)
      q.join(n, Seq("bucket")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", graft.Det.r4(dot("qe", "ne") / (col("qn") * col("nn"))))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("nid"), col("cos"), col("bucket"))
        .orderBy(col("qid").asc_nulls_first, col("rnk").asc_nulls_first)
    })
  )

  /** DuckDB derivation of the exact q_sim_ann_lsh result — see the
    * query comment. Bucket bit p weights 2^(5-p) (the engine's
    * acc*2+bit fold); the cosine tail reuses the proven list_sum form.
    */
  private def lshOracle: String = {
    val planes = hyperplanes(6, 64)
    val dots = planes.map { p =>
      p.zipWithIndex.map { case (c, i) =>
        s"CAST(embedding[${i + 1}] AS DOUBLE) * ($c)"
      }.mkString(" + ")
    }
    val bucket = dots.zipWithIndex.map { case (d, pi) =>
      s"(CASE WHEN ($d) >= 0 THEN ${1 << (5 - pi)} ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
       |    ($bucket) AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS qid, n.vec_id AS nid, q.bucket AS bucket,
       |    floor((list_sum(list_transform(list_zip(q.embedding, n.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |      / (q.nrm * n.nrm)) * 10000 + CAST(0.5 AS DOUBLE))
       |      / CAST(10000 AS DOUBLE) AS cos
       |  FROM e q JOIN e n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id),
       |ranked AS (
       |  SELECT qid, nid, bucket, cos, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC NULLS LAST,
       |      nid ASC NULLS FIRST) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, nid, cos, bucket FROM ranked WHERE rnk <= 3
       |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_sim_ann_lsh" -> lshOracle,
    "q_sim_topk_cosine" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS qid, t.vec_id AS nid,
        |    floor((list_sum(list_transform(list_zip(q.embedding, t.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.nrm * t.nrm)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS cos
        |  FROM n q JOIN n t ON q.vec_id < 10 AND q.vec_id <> t.vec_id),
        |ranked AS (
        |  SELECT qid, nid, cos,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC NULLS LAST, nid ASC NULLS FIRST) AS INT) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, nid, cos FROM ranked WHERE rnk <= 5
        |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    // identical two-tier algebra: truncated-dim rank -> top 20 -> full
    // re-rank -> top 5; embedding[1:16] is DuckDB's inclusive list slice
    "q_sim_matryoshka" ->
      """WITH n AS (
        |  SELECT vec_id, embedding, embedding[1:16] AS head,
        |    sqrt(list_sum(list_transform(embedding[1:16],
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS hn,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS fn
        |  FROM embeddings),
        |coarse AS (
        |  SELECT q.vec_id AS qid, t.vec_id AS nid,
        |    floor((list_sum(list_transform(list_zip(q.head, t.head),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.hn * t.hn)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS cos_head,
        |    floor((list_sum(list_transform(list_zip(q.embedding, t.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.fn * t.fn)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS cos
        |  FROM n q JOIN n t ON q.vec_id < 10 AND q.vec_id <> t.vec_id),
        |tier1 AS (
        |  SELECT qid, nid, cos_head, cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cos_head DESC NULLS LAST, nid ASC NULLS FIRST) AS rnk0
        |  FROM coarse),
        |tier2 AS (
        |  SELECT qid, nid, cos, cos_head,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC NULLS LAST, nid ASC NULLS FIRST) AS INT) AS rnk
        |  FROM tier1 WHERE rnk0 <= 20)
        |SELECT qid, rnk, nid, cos, cos_head FROM tier2 WHERE rnk <= 5
        |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    // identical bit-packing (two non-negative 32-bit halves), Hamming
    // coarse tier, exact cosine re-rank
    "q_sim_hamming" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(generate_series(1, 32), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] >= 0 THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE CAST(0 AS BIGINT) END)) AS s0,
        |    list_sum(list_transform(generate_series(1, 32), i ->
        |      CASE WHEN embedding[CAST(32 + i AS INT)] >= 0 THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE CAST(0 AS BIGINT) END)) AS s1,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS fn
        |  FROM embeddings),
        |coarse AS (
        |  SELECT q.vec_id AS qid, t.vec_id AS nid,
        |    CAST(bit_count(xor(q.s0, t.s0)) + bit_count(xor(q.s1, t.s1)) AS INT) AS ham,
        |    floor((list_sum(list_transform(list_zip(q.embedding, t.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.fn * t.fn)) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS cos
        |  FROM n q JOIN n t ON q.vec_id < 10 AND q.vec_id <> t.vec_id),
        |tier1 AS (
        |  SELECT qid, nid, ham, cos,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ham ASC NULLS LAST, nid ASC NULLS FIRST) AS rnk0
        |  FROM coarse),
        |tier2 AS (
        |  SELECT qid, nid, cos, ham,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC NULLS LAST, nid ASC NULLS FIRST) AS INT) AS rnk
        |  FROM tier1 WHERE rnk0 <= 20)
        |SELECT qid, rnk, nid, cos, ham FROM tier2 WHERE rnk <= 5
        |ORDER BY qid ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin
  )
}
