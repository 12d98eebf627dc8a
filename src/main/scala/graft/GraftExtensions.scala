package graft

import graft.functions.{AbbrevPairs, FuzzyMatch, PartialRatioExpr, RowDensityAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.udf

/** SQL surface for the custom operators: after registration, plain
  * `spark.sql` users can call
  *
  *   - `partial_ratio(a, b)`         -> int 0..100 (Catalyst expression)
  *   - `abbrev_pairs(text)`          -> array<struct<abbrev,expansion>>
  *     (explode for the UDTF shape)
  *   - `abbrev_pairs_gen(text)`      -> native Generator (LATERAL VIEW
  *     position; no intermediate array)
  *   - `graft_row_density(nonNull)`  -> double (typed Aggregator, width 4)
  *
  * Two registration paths, both public API:
  *   - `GraftExtensions.register(spark)` at runtime, or
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (injects partial_ratio as a native function via
  *     `SparkSessionExtensions.injectFunction`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GraftExtensions.SelfSimilarityFold)
    val builder: Seq[Expression] => Expression = { children =>
      require(children.size == 2,
        s"partial_ratio requires exactly 2 arguments, got ${children.size}")
      PartialRatioExpr(children(0), children(1))
    }
    e.injectFunction((
      FunctionIdentifier("partial_ratio"),
      new ExpressionInfo(classOf[PartialRatioExpr].getName, "partial_ratio"),
      builder))
    val genBuilder: Seq[Expression] => Expression = { children =>
      require(children.size == 1,
        s"abbrev_pairs_gen requires exactly 1 argument, got ${children.size}")
      graft.functions.AbbrevPairsGen(children.head)
    }
    e.injectFunction((
      FunctionIdentifier("abbrev_pairs_gen"),
      new ExpressionInfo(classOf[graft.functions.AbbrevPairsGen].getName,
        "abbrev_pairs_gen"),
      genBuilder))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{
    If, IsNull, Literal, RLike}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.rules.Rule
  import org.apache.spark.sql.types.IntegerType

  /** Optimizer rule: fold `partial_ratio(x, x)` — the diagonal of a
    * fuzzy self-join — into its closed form, replacing the O(|x|²)
    * sliding-window scan with one trim:
    *
    *   null input          -> null  (the expression is null-intolerant)
    *   control/space-only x -> 0    (norm(x) is empty; partialRatio
    *                                 defines empty -> 0)
    *   anything else       -> 100   (equal normalized strings score 100)
    *
    * norm(x) is empty iff Java String.trim empties x, i.e. every char
    * is <= U+0020 — NOT what Spark's `trim` tests (it strips only
    * 0x20), and wider than `\s`, so the emptiness test is the explicit
    * char-class regex with \A..\z anchors ($ would tolerate a trailing
    * newline). Guarded on deterministic children (a rand()-bearing
    * argument is not "the same x" twice). Exactness is asserted in
    * ExtensionsSuite against the unfolded expression, including tab and
    * control-char inputs.
    */
  object SelfSimilarityFold extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case graft.functions.PartialRatioExpr(l, r)
            if l.deterministic && l.semanticEquals(r) =>
          If(IsNull(l), Literal.create(null, IntegerType),
            If(RLike(l, Literal("\\A[\\x00-\\x20]*\\z")),
              Literal(0), Literal(100)))
      }
  }

  /** Runtime registration of the full custom-function surface. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("partial_ratio",
      udf((a: String, b: String) => FuzzyMatch.normalizedPartialRatio(a, b)))
    spark.udf.register("abbrev_pairs",
      udf((text: String) => AbbrevPairs.parse(text)))
    spark.udf.register("graft_row_density",
      org.apache.spark.sql.functions.udaf(new RowDensityAgg(4)))
  }
}
