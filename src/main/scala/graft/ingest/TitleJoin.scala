package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R6: spatial nearest-neighbor title join (reference tables.py:28-49) —
  * attach to each extracted table the closest horizontal text object
  * ABOVE it, by euclidean distance from the text's bottom-midpoint to the
  * table's top-midpoint, within the reference's initial threshold of 100
  * (`min_distance` start, tables.py:34); when the winning title contains
  * the word "table", the next text object (reading order) is concatenated
  * — the reference's two-line-title merge (tables.py:40-44).
  *
  * Expressed as a range join (distance predicate) + `min_by` argmin per
  * table — the generalized as-of/nearest pattern (same shape as
  * q_join_asof). Tie-breaking: the reference keeps the first-iterated
  * text on equal distance; here ties break on the lower obj_id, which is
  * reading order — documented quirk, not bit-parity (SURVEY.md §4.3).
  *
  * Inputs: texts(obj_id long, text string, x_mid double, y_bottom
  * double); tables(table_id long, x_mid double, y_top double). Output:
  * (table_id, title, distance).
  */
object TitleJoin {

  def nearestAbove(texts: DataFrame, tables: DataFrame,
      maxDistance: Double = 100.0): DataFrame = {
    val t = texts.select(col("obj_id"), col("text"),
      col("x_mid").as("tx"), col("y_bottom").as("ty"))
    val tab = tables.select(col("table_id"), col("x_mid").as("bx"),
      col("y_top").as("by"))
    val dist = sqrt(pow(col("tx") - col("bx"), 2) + pow(col("ty") - col("by"), 2))
    // the distance bound is part of the JOIN condition, not a post-
    // filter: a table whose candidates are all too far must still emit
    // one (null-titled) row, exactly like a table with no text above it
    val joined = tab.join(t,
        col("ty") >= col("by") && dist < maxDistance, "left_outer")
      .withColumn("dist", dist)
    val best = joined.groupBy(col("table_id"))
      .agg(
        min_by(struct(col("obj_id"), col("text"), col("dist")),
          struct(col("dist"), col("obj_id"))).as("best"))
      .select(col("table_id"), col("best.obj_id").as("obj_id"),
        col("best.text").as("title"), col("best.dist").as("distance"))
    // two-line merge: title containing the word "table" pulls in the next
    // text object in reading order
    val next = texts.select((col("obj_id") - 1).as("obj_id"),
      col("text").as("next_text"))
    best.join(next, Seq("obj_id"), "left_outer")
      .withColumn("title",
        when(Ingest.containsWord(col("title"), "table") &&
          col("next_text").isNotNull,
          concat(col("title"), lit(" "), col("next_text")))
        .otherwise(col("title")))
      .select(col("table_id"), col("title"), col("distance"))
  }
}
