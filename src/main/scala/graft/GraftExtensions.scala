package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotProductExpr, GraftDist3Expr, LongDotProductExpr, PolyHashExpr, ZOrder2Expr}

/** SparkSessionExtensions hook: registers the graft native expressions in
  * the SQL function registry, so `spark.sql("SELECT graft_dot(a, b)")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — GraftSession does the former.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_dot_long"),
        new ExpressionInfo(classOf[LongDotProductExpr].getName, "graft_dot_long"),
        (children: Seq[Expression]) => LongDotProductExpr(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_polyhash"),
        new ExpressionInfo(classOf[PolyHashExpr].getName, "graft_polyhash"),
        (children: Seq[Expression]) => PolyHashExpr(children(0))))
    ext.injectFunction(
      (FunctionIdentifier("graft_zorder2"),
        new ExpressionInfo(classOf[ZOrder2Expr].getName, "graft_zorder2"),
        (children: Seq[Expression]) => ZOrder2Expr(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_dist3"),
        new ExpressionInfo(classOf[GraftDist3Expr].getName, "graft_dist3"),
        (children: Seq[Expression]) => GraftDist3Expr(children)))
    // ε-join recognition: `graft_dist3(...) < eps` join conditions plan
    // as grid-cell equi-joins instead of nested loops (rule instance
    // bound to its owning session — plan surgery must analyze under it)
    ext.injectOptimizerRule(s => new graft.plans.EpsJoinRewrite(s))
    // edit-distance-join recognition: `levenshtein(a, b) <= k` (k ∈ {0,1})
    // join conditions plan as FastSS deletion-neighborhood equi-joins
    ext.injectOptimizerRule(s => new graft.plans.EditDistJoinRewrite(s))
    // 1-D range-join recognition: point-in-interval (`lo <= p AND
    // p <= hi`) and interval-overlap (`aLo <= bHi AND bLo <= aHi`)
    // cross-side join conditions plan as bucketed equi-joins (with a
    // fan-out-guarded fallback branch); active only when the bin size
    // conf spark.graft.rangeJoinRewrite.bucket is set — scoped
    // per-query via Registry.withRangeBucket, never session-wide
    ext.injectOptimizerRule(s => new graft.plans.RangeJoinRewrite(s))
  }
}
