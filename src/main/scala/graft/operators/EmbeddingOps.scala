package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-column utilities beyond similarity search: int8
  * quantization (the storage/serving format for large ANN indexes) and
  * per-label centroids (the k-means/IVF building block, exposed as a
  * first-class aggregation).
  *
  * Quantization is a map-only scan (codegen'd HOF arithmetic, no UDF);
  * the centroid is a posexplode + (label, pos) hash aggregation whose
  * partial aggregation reduces each partition to |labels|x|dims| cells
  * before the shuffle — at 100 TB the shuffle volume is the number of
  * groups, not the number of vectors.
  */
object EmbeddingOps {

  /** floor(x+0.5) — the same half-up rule Det.r4 uses, for integers:
    * Spark round() and DuckDB round() disagree on representation
    * boundaries, this form is bit-identical.
    */
  private def halfUp(c: org.apache.spark.sql.Column) = floor(c + lit(0.5))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Int8 quantization: q_i = floor(127*x_i + 0.5) per component
    // (corpus vectors are unit-norm, so the domain is [-1, 1]); emit the
    // squared norm and component mean as audit stats plus the first four
    // quantized components as scalars.
    "q_embed_quantize" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val sq = expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
      val mean = expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE))") / size(col("embedding"))
      def q(i: Int) =
        halfUp(col("embedding").getItem(i).cast("double") * 127.0)
          .cast("int").as(s"q$i")
      e.select(col("vec_id"), col("label"),
        Det.r4(sq).as("sq_norm"), Det.r4(mean).as("mean_c"),
        q(0), q(1), q(2), q(3))
        .orderBy(col("vec_id").asc_nulls_first)
    }),

    // Johnson-Lindenstrauss random projection 64 -> 8: a fixed seeded
    // Rademacher (+-1) matrix, constant-folded into eight fused codegen
    // dot products per row (vec_dot_fd — no interpreted lambdas, no
    // per-row matrix object). Map-only at any corpus size; the classic
    // cheap pre-step before ANN indexing or dedup sketching. The SAME
    // seeded matrix is interpolated into the DuckDB oracle, so the
    // projection is hash-checked end to end.
    "q_embed_project" -> ((s, d) => {
      import graft.functions.VectorOps.vec_dot_fd
      val scale = 1.0 / math.sqrt(EmbeddingOps.jlMatrix.length)
      val comps = EmbeddingOps.jlMatrix.toIndexedSeq.zipWithIndex.map {
        case (row, i) =>
          Det.r4(vec_dot_fd(col("embedding"),
            array(row.map(v => lit(v)).toSeq: _*)) * lit(scale)).as(s"p$i")
      }
      Tables.embeddings(s, d)
        .select(col("vec_id") +: comps: _*)
        .orderBy(col("vec_id").asc_nulls_first)
    }),

    // Per-label centroid: element-wise mean over all vectors of a label.
    // Output is (label, pos, centroid) long form — bounded by
    // |labels| x dim, never by row count.
    "q_embed_centroid" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(Det.r4(avg(col("v").cast("double"))).as("centroid"),
          count(lit(1)).as("n_vecs"))
        .orderBy(col("label").asc_nulls_first, col("pos").asc_nulls_first)
    })
  )

  /** Fixed seeded Rademacher projection matrix (8 x 64, +-1): the same
    * literals feed the Spark plan and the DuckDB oracle, so the
    * projection is fully hash-checked despite being "random".
    */
  private[operators] val jlMatrix: Array[Array[Double]] = {
    val rnd = new scala.util.Random(0x91f7)
    Array.fill(8, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  private def r4sql(inner: String, alias: String) =
    s"floor(($inner) * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS $alias"

  private val jlOracle: String = {
    val scale = 1.0 / math.sqrt(jlMatrix.length)
    val comps = jlMatrix.zipWithIndex.map { case (row, i) =>
      val arr = row.mkString("[", ", ", "]")
      r4sql("list_sum(list_transform(list_zip(embedding, " + arr + "), " +
        s"p -> CAST(p[1] AS DOUBLE) * p[2])) * $scale", s"p$i")
    }
    s"""SELECT vec_id,
       |  ${comps.mkString(",\n  ")}
       |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_embed_project" -> jlOracle,
    "q_embed_quantize" ->
      s"""SELECT vec_id, label,
         |  ${r4sql("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))", "sq_norm")},
         |  ${r4sql("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding)", "mean_c")},
         |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 127.0 + 0.5) AS INT) AS q0,
         |  CAST(floor(CAST(embedding[2] AS DOUBLE) * 127.0 + 0.5) AS INT) AS q1,
         |  CAST(floor(CAST(embedding[3] AS DOUBLE) * 127.0 + 0.5) AS INT) AS q2,
         |  CAST(floor(CAST(embedding[4] AS DOUBLE) * 127.0 + 0.5) AS INT) AS q3
         |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "q_embed_centroid" ->
      s"""WITH e AS (
         |  SELECT label,
         |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         |    unnest(embedding) AS v
         |  FROM embeddings)
         |SELECT label, pos,
         |  ${r4sql("avg(CAST(v AS DOUBLE))", "centroid")},
         |  count(1) AS n_vecs
         |FROM e GROUP BY label, pos
         |ORDER BY label ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin
  )
}
