package graft.plans

import graft.functions.ArrayDotProduct
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-surface registration for graft's native expressions.
  *
  * Two entry points with identical effect:
  *  - `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  *    `.withExtensions(new GraftExtensions)`) at session build, the
  *    library-deployment path;
  *  - [[GraftExtensions.register]] on a live session, for hosts that
  *    build their sessions elsewhere (Verify/Bench do this).
  *
  * Either way, `graft_dot(a, b)` becomes callable from `spark.sql`,
  * compiled by whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectPlannerStrategy(_ => TopKPerGroup.TopKStrategy)
    ext.injectOptimizerRule(_ => TopKPerGroup.TopKRewrite)
  }
}

object GraftExtensions {
  private def builder(exprs: Seq[Expression]): Expression =
    ArrayDotProduct(
      Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
     new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
     builder _)

  /** Install the FULL extension surface (SQL function + top-k strategy +
    * rewrite rule) on a live session — same effect as the extensions
    * conf. A no-op when that conf already applied (probed via the
    * injected function), so the two paths compose without
    * double-installing the strategy or shadowing the function.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
          .functionExists(FunctionIdentifier("graft_dot"))) {
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction("graft_dot", builder, "built-in")
      TopKPerGroup.ensureStrategy(spark)
      if (!spark.experimental.extraOptimizations.contains(TopKPerGroup.TopKRewrite))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ TopKPerGroup.TopKRewrite
    }
}
