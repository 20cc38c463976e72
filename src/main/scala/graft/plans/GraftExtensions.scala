package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` entry point — usable as
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or via
  * `SparkSession.builder().withExtensions(new GraftExtensions)`):
  * registers the custom expression surface for SQL callers and installs
  * the opt-in [[AnnTopKRewrite]] optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("cosine_sim", es => CosineSim(es(0), es(1))))
    e.injectFunction(fn("try_cosine_sim", es => TryCosineSim(es(0), es(1))))
    e.injectFunction(fn("vector_dot", es => VectorDot(es(0), es(1))))
    e.injectFunction(fn("l2_distance", es => L2Distance(es(0), es(1))))
    e.injectFunction(fn("vector_norm", es => VectorNorm(es(0))))
    e.injectFunction(fn("quantize_i8", es => QuantizeI8(es(0))))
    e.injectFunction(fn("cosine_sim_i8", es => CosineSimI8(es(0), es(1))))
    e.injectFunction(fn("zorder_key", es => ZOrderKey(es(0), es(1))))
    e.injectOptimizerRule(_ => AnnTopKRewrite)
  }
}
