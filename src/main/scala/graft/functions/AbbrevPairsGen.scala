package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The abbreviation-pair UDTF (reference R19) as a true Catalyst
  * `Generator`: one input cell generates zero-or-more (abbrev,
  * expansion) rows directly inside `GenerateExec` — no intermediate
  * `ArrayType` value is materialized and no UDF serialization boundary
  * is crossed, unlike the `udf(...parse) + explode` formulation (kept as
  * the SQL-registered array form for `abbrev_pairs`).
  *
  * Generators run in `GenerateExec`'s fallback path (Spark codegens only
  * its built-in explode family), so `CodegenFallback` is the idiomatic
  * mixin here; the surrounding operators stay codegen'd.
  */
case class AbbrevPairsGen(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"abbrev_pairs_gen requires STRING input, got ${child.dataType.sql}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("abbrev", StringType, nullable = false),
    StructField("expansion", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else AbbrevPairs.parse(v.toString).map { case (a, e) =>
      InternalRow(UTF8String.fromString(a), UTF8String.fromString(e))
    }
  }

  override def prettyName: String = "abbrev_pairs_gen"

  override protected def withNewChildInternal(newChild: Expression): AbbrevPairsGen =
    copy(child = newChild)
}

object AbbrevPairsGen {
  /** DataFrame-facing form: select alongside other columns and alias the
    * two generated fields, e.g.
    * `df.select(col("k"), abbrev_pairs_gen(col("cell")).as(Seq("abbrev", "expansion")))`.
    */
  def abbrev_pairs_gen(c: Column): Column =
    GraftShim.column(AbbrevPairsGen(GraftShim.expression(c)))
}
