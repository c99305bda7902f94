package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, explode, floor, lit, sequence}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.NumericType

/** Automatic point-in-interval join recognition — the 1-D sibling of
  * [[EpsJoinRewrite]]: an inner join whose condition contains BOTH
  * `p >= lo` (or `>`) AND `p <= hi` (or `<`) for the SAME point
  * expression `p` from one side and interval bounds `lo`, `hi` from the
  * other is rewritten from the nested-loop theta-join Spark would plan
  * into [[graft.operators.RangeJoin]]'s bucketed equi-join: the point
  * keeps its home bucket, the interval explodes to every bucket it
  * overlaps, the join keys on the bucket, and the ORIGINAL condition is
  * re-applied above as the exact residual — so the rewrite is bit-exact.
  *
  * Exactly-once: `lo <= p <= hi` implies
  * `floor(lo/w) <= floor(p/w) <= floor(hi/w)` (division by a positive
  * constant is monotone even in IEEE arithmetic, floor preserves it), so
  * the point's single home bucket appears exactly once among the
  * interval's buckets — no duplicates, no misses. Degenerate `hi < lo`
  * intervals are dropped pre-fan-out (they contain nothing, and Spark's
  * descending auto-step sequence would otherwise explode them).
  *
  * The bucket width cannot be inferred from a literal (it is a data
  * property — the typical interval length), so it comes from the session
  * conf `spark.graft.rangeJoinRewrite.bucket` — the same contract as the
  * bin-size hint production range-join optimizers require. Unset or
  * non-positive ⇒ the rule stays inactive.
  *
  * Self-termination: filter-pushdown can fold the residual back into the
  * rewritten join's condition on a later optimizer pass; the rule skips
  * any join whose condition already references a `__graft_rb` bucket
  * attribute, so the rewrite never stacks.
  */
class RangeJoinRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import RangeJoinRewrite._

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Lower/upper bounds keyed by the canonicalized point expression:
    * `p >= lo` forms, oriented so the point is on the left.
    */
  private def asLower(c: Expression): Option[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case GreaterThan(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p) => Some((p, lo))
    case LessThan(lo, p) => Some((p, lo))
    case _ => None
  }

  private def asUpper(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(p, hi) => Some((p, hi))
    case LessThan(p, hi) => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case GreaterThan(hi, p) => Some((p, hi))
    case _ => None
  }

  /** Find (point, lo, hi) with point refs in one child and BOTH bound
    * expressions' refs nonempty and in the other child, orientation
    * returned as pointIsLeft.
    */
  private def matchRange(cs: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val lowers = cs.flatMap(asLower)
    val uppers = cs.flatMap(asUpper)
    val pairs = for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.canonicalized == p2.canonicalized
    } yield (p1, lo, hi)
    pairs.iterator.flatMap { case (p, lo, hi) =>
      if (!p.dataType.isInstanceOf[NumericType] ||
        !lo.dataType.isInstanceOf[NumericType] ||
        !hi.dataType.isInstanceOf[NumericType]) None
      else {
        val pR = p.references
        val bR = AttributeSet(lo.references ++ hi.references)
        if (pR.isEmpty || lo.references.isEmpty || hi.references.isEmpty) None
        else if (pR.subsetOf(left.outputSet) && bR.subsetOf(right.outputSet))
          Some((p, lo, hi, true))
        else if (pR.subsetOf(right.outputSet) && bR.subsetOf(left.outputSet))
          Some((p, lo, hi, false))
        else None
      }
    }.nextOption()
  }

  private def rewrite(
      join: Join,
      p: Expression,
      lo: Expression,
      hi: Expression,
      pointIsLeft: Boolean,
      width: Double,
      allConjuncts: Seq[Expression]): LogicalPlan = {
    def bkt(e: Expression) =
      floor(ColumnBridge.column(e).cast("double") / width).cast("long")
    val pDf = ColumnBridge.ofRows(session,
      if (pointIsLeft) join.left else join.right)
    val iDf = ColumnBridge.ofRows(session,
      if (pointIsLeft) join.right else join.left)
    val pC = pDf.withColumn(PointBucket, bkt(p))
    val iC = iDf
      .filter(ColumnBridge.column(lo) <= ColumnBridge.column(hi))
      .withColumn(IntervalBucket, explode(sequence(bkt(lo), bkt(hi))))
    val (lC, rC) = if (pointIsLeft) (pC, iC) else (iC, pC)
    // cross-side equality conjuncts (the join's real keys — user_id,
    // tenant, …) must STAY in the join condition next to the bucket, or
    // the equi-join degrades to bucket-only and every key shares every
    // time bucket; the ofRows surgery preserves attribute ids, so the
    // original expressions resolve against the rebuilt children
    val equi = allConjuncts.filter {
      case EqualTo(a, b) =>
        (a.references.subsetOf(join.left.outputSet) &&
          b.references.subsetOf(join.right.outputSet)) ||
          (a.references.subsetOf(join.right.outputSet) &&
            b.references.subsetOf(join.left.outputSet))
      case _ => false
    }
    val joinCond = equi.foldLeft(col(PointBucket) === col(IntervalBucket)) {
      (c, e) => c && ColumnBridge.column(e)
    }
    val residual = allConjuncts.reduce[Expression](And)
    val out = lC.join(rC, joinCond, "inner")
      .filter(ColumnBridge.column(residual))
      .select(join.output.map(ColumnBridge.column): _*)
    reapplyHint(out.queryExecution.analyzed, join.hint)
  }

  private def reapplyHint(plan: LogicalPlan, hint: JoinHint): LogicalPlan =
    if (hint == JoinHint.NONE) plan
    else plan match {
      case j: Join => j.copy(hint = hint)
      case u if u.children.size == 1 =>
        u.withNewChildren(Seq(reapplyHint(u.children.head, hint)))
      case other => other
    }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.enabled", "true") == "true"

  /** The bin size, from conf; None ⇒ inactive. */
  private def bucketWidth: Option[Double] =
    scala.util.Try(org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.bucket", "")
      .toDouble).toOption.filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else bucketWidth match {
      case None => plan
      case Some(w) =>
        plan.transformUp {
          case j @ Join(left, right, jt, Some(cond), _)
              if (jt == Inner || jt == Cross) &&
                !cond.references.exists(_.name.startsWith(PointBucket)) &&
                !cond.references.exists(_.name.startsWith(IntervalBucket)) =>
            val cs = conjuncts(cond)
            matchRange(cs, left, right) match {
              case Some((p, lo, hi, pointIsLeft)) =>
                try rewrite(j, p, lo, hi, pointIsLeft, w, cs)
                catch {
                  case NonFatal(e) =>
                    logWarning(
                      s"range-join rewrite failed, keeping nested-loop join: $e")
                    j
                }
              case None => j
            }
        }
    }
}

object RangeJoinRewrite {
  private[plans] val PointBucket = "__graft_rb_p"
  private[plans] val IntervalBucket = "__graft_rb_i"
}
