package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AnnBuckets, DotLong, IvfProbes, TokenCount}

/** Session-extensions installer: makes the library's native expressions
  * AND its optimizer rule available to ANY session (including pure-SQL
  * users) via `--conf spark.sql.extensions=graft.GraftExtensions` — the
  * standard deployment path for custom Catalyst surface on a cluster.
  * The programmatic twins are `DotLong.register(spark)` /
  * `AnnBuckets.register(spark)` / `NoCartesianGuard.install(spark)` for
  * sessions built in code. The injected rule
  * ([[graft.plans.NoCartesianGuard]]) is opt-in by conf and trivially
  * result-invariant: it fails runaway cartesian plans at optimization
  * time, it never rewrites them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(graft.plans.NoCartesianGuard(_))
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (exprs: Seq[Expression]) => DotLong(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("ann_buckets"),
      new ExpressionInfo(classOf[AnnBuckets].getName, "ann_buckets"),
      (exprs: Seq[Expression]) => AnnBuckets(exprs.head, exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("ivf_probes"),
      new ExpressionInfo(classOf[IvfProbes].getName, "ivf_probes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4, "ivf_probes takes (cents, q, n2, p)")
        IvfProbes(exprs.head, exprs(1), exprs(2), exprs(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"ivf_probes probe count must be an integer literal, got $other")
        })
      }))
    ext.injectFunction((
      FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (exprs: Seq[Expression]) => TokenCount(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("quantize_long"),
      new ExpressionInfo(classOf[graft.functions.QuantizeLong].getName, "quantize_long"),
      (exprs: Seq[Expression]) => graft.functions.QuantizeLong(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("int8_codes"),
      new ExpressionInfo(classOf[graft.functions.Int8Codes].getName, "int8_codes"),
      (exprs: Seq[Expression]) => graft.functions.Int8Codes(exprs.head)))
  }
}
