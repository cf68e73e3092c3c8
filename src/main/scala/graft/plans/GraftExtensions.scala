package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, ExpressionInfo, Length, LessThanOrEqual, Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{ArraySumLong, DotProduct, NormalizeNFC, ValueHistogram}

/** The library's `SparkSessionExtensions` entry point — how a cluster
  * wires graft into every session without code changes:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Injects the custom codegen expressions into the SQL function
  * registry (so pure-SQL users reach them: `SELECT graft_dot(a, b)`)
  * and the [[LevenshteinGuard]] optimizer rule. For an already-running
  * session (notebooks, tests) [[GraftFunctions.register]] installs the
  * same functions imperatively and
  * `spark.experimental.extraOptimizations` the same rule — both paths
  * share these definitions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => LevenshteinGuard)
  }
}

/** SQL-registry bindings for the engine's custom expressions. Only
  * expressions whose constructors take plain child expressions are
  * exposed (the parameterized ones — rescale ranges, QA bit rules —
  * stay Column-API, where their typed parameters belong).
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_dot",
      info("graft_dot",
        "graft_dot(a, b) - codegen'd float-array dot product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    ("graft_pixel_sum",
      info("graft_pixel_sum",
        "graft_pixel_sum(px) - sum of an int pixel array as bigint"),
      (args: Seq[Expression]) => ArraySumLong(args.head)),
    ("graft_value_histogram",
      info("graft_value_histogram",
        "graft_value_histogram(px, nodata) - (value, count) rows of an " +
          "int array, nodata excluded"),
      (args: Seq[Expression]) => ValueHistogram(args.head, args(1))),
    ("graft_nfc",
      info("graft_nfc",
        "graft_nfc(s) - Unicode NFC canonical normalization"),
      (args: Seq[Expression]) => NormalizeNFC(args.head)))

  /** Imperative registration into a live session (the
    * Sedona/Iceberg-style `registerAll` path).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }

  /** Full live-session install: SQL functions + the optimizer rules —
    * what [[GraftExtensions]] does at session build, retrofitted. The
    * engine's own entry points (Verify / Bench / Smoke) call this, so
    * every gated query runs with the rules active. Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    register(spark)
    if (!spark.experimental.extraOptimizations.contains(LevenshteinGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinGuard
  }
}

/** Plants a cheap length-difference guard in front of bounded edit-
  * distance filters: `levenshtein(a, b) <= k` implies
  * `abs(length(a) - length(b)) <= k`, and the guard costs two length
  * reads where the DP costs O(|a|·|b|) — on a blocked fuzzy-match scan
  * most candidate pairs short-circuit before the DP runs. The guard is
  * added once per conjunct (`semanticEquals` dedup), so the rule is a
  * fixpoint after one application.
  *
  * Guard-safety: the implication only holds for the two-argument form.
  * Spark 4's `levenshtein(a, b, threshold)` returns -1 when the distance
  * exceeds the threshold, so `levenshtein(a, b, 3) <= 4` can be TRUE
  * (via -1) for a pair whose length gap is > 4 — injecting the length
  * guard there would drop rows. The rule therefore requires
  * `threshold.isEmpty`, and only fires for a non-negative integer bound
  * (a negative bound is always-false anyway; a non-integral literal
  * would change the comparison's type coercion).
  */
object LevenshteinGuard extends Rule[LogicalPlan] with PredicateHelper {
  private def nonNegativeInt(k: Literal): Boolean = k match {
    case Literal(v: Int, IntegerType)  => v >= 0
    case Literal(v: Long, LongType)    => v >= 0L
    case Literal(v: Short, ShortType)  => v >= 0
    case Literal(v: Byte, ByteType)    => v >= 0
    case _                             => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.collect {
        case LessThanOrEqual(lev: Levenshtein, k: Literal)
            if lev.threshold.isEmpty && nonNegativeInt(k) =>
          LessThanOrEqual(
            Abs(Subtract(Length(lev.left), Length(lev.right))), k)
      }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduce(And), child)
  }
}
