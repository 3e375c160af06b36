package graft.engine.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two array<double>
  * columns — the one operator in this engine hot enough to justify
  * dropping below `functions._` (SURVEY.md §4: custom work only where
  * built-ins can't express it efficiently; higher-order functions
  * (`aggregate`/`zip_with`) evaluate interpreted per element, this
  * compiles to a fused primitive loop inside whole-stage codegen).
  *
  * Siddhi analog: an `@Extension` scalar FunctionExecutor (e.g. the
  * siddhi-execution-math family) — same SPI role, but compiled by
  * Catalyst instead of dispatched per event.
  *
  * Semantics match the engine's fold-based cosine exactly: one pass in
  * index order per accumulator, so results are bit-identical to the
  * DuckDB oracle's sequential list_reduce formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // ExpectsInputTypes is sql-package-private in Spark 4.1, so type
  // validation lives here: analysis fails with a readable message instead
  // of a ClassCastException/codegen error at execution time.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val u = x.getDouble(i); val v = y.getDouble(i)
      dot += u * v; na += u * u; nb += v * v
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom // zero vector ⇒ 0.0, not NaN
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $u = $x.getDouble($i);
         |  double $v = $y.getDouble($i);
         |  $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
         |}
         |double ${dot}_denom =
         |  java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} =
         |  ${dot}_denom == 0.0 ? 0.0 : $dot / ${dot}_denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Arity-checked builder shared by both registration paths. */
  def build(children: Seq[Expression]): CosineSimilarity = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"cosine_sim expects exactly 2 arguments, got ${children.length}")
    CosineSimilarity(children(0), children(1))
  }

  /** Idempotently register `cosine_sim` in a session's function registry
    * (the runtime path; library deployments use [[GraftExtensions]] via
    * `spark.sql.extensions`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", build _, "built-in")
}

/** `spark.sql.extensions` entry point: makes `cosine_sim` (and any future
  * native functions) available in plain SQL on session construction —
  * the SparkSessionExtensions integration path of SURVEY.md §4. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      CosineSimilarity.build _))
    // the CEP pattern operator's logical→physical mapping (SURVEY §4):
    // sessions built with spark.sql.extensions=graft.engine.GraftExtensions
    // plan PatternMatchPlan without any runtime registration
    ext.injectPlannerStrategy(_ => graft.engine.plans.PatternMatchStrategy)
    // key-predicate pushdown through the pattern operator (see
    // plans.PatternKeyPushdown): runs with the operator-optimization batch
    ext.injectOptimizerRule(_ => graft.engine.plans.PatternKeyPushdown)
  }
}
