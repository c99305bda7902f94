package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, explode, floor, greatest, lit, sequence}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, NumericType}

/** Automatic 1-D range-join recognition — the time-axis sibling of
  * [[EpsJoinRewrite]]. Two patterns are recognized on inner joins:
  *
  *  - '''point-in-interval''': the condition contains BOTH `p >= lo`
  *    (or `>`) AND `p <= hi` (or `<`) for the SAME point expression `p`
  *    from one side and interval bounds `lo`, `hi` from the other.
  *  - '''interval overlap''': the condition contains `aLo <= bHi` AND
  *    `bLo <= aHi` (any `<`/`<=` mix) with `aLo`,`aHi` from one side and
  *    `bLo`,`bHi` from the other — the canonical "intervals intersect"
  *    conjunct pair.
  *
  * Either would plan as a nested-loop theta-join; both are rewritten to
  * [[graft.operators.RangeJoin]]'s bucketed equi-join: each side buckets
  * the value axis at the configured width (a point keeps its home
  * bucket; an interval explodes to every bucket it overlaps), the join
  * keys on the bucket (plus any cross-side equality conjuncts, which
  * stay real join keys), and the ORIGINAL condition is re-applied above
  * as the exact residual — so the rewrite is bit-exact.
  *
  * Exactly-once, point case: `lo <= p <= hi` implies
  * `floor(lo/w) <= floor(p/w) <= floor(hi/w)` (division by a positive
  * constant is monotone even in IEEE arithmetic, floor preserves it), so
  * the point's single home bucket appears exactly once among the
  * interval's buckets. Overlap case: two valid intersecting intervals
  * share every bucket of `[max(aLo,bLo), min(aHi,bHi)]`; keeping only
  * the FIRST shared bucket — the one containing `max(aLo,bLo)` — emits
  * each pair exactly once with no `distinct` (which would shuffle the
  * full candidate set).
  *
  * '''Fan-out guard''' (`spark.graft.rangeJoinRewrite.maxFanout`,
  * default 4096): an interval spanning `(hi-lo)/width` buckets explodes
  * to that many rows, and past 2^31 buckets `sequence()` throws at
  * runtime — a data property no rewrite-time check can see. Rows whose
  * fan-out would exceed the cap (and, in the overlap case, malformed
  * `lo > hi` intervals, which the theta join CAN match but the bucket
  * argument assumes away) are split into a union'd fallback branch that
  * joins them with the ORIGINAL condition — normally empty, so its
  * nested-loop is a no-op scan, but pathological data degrades to the
  * pre-rewrite plan for exactly the offending rows instead of OOM-ing.
  * Each qualifying pair lands in exactly one branch (the split is a
  * partition of the input rows), so the union stays bit-exact. Rows
  * with a NULL bound are dropped outright: every recognized conjunct
  * null-rejects, so they can match nothing. The fallback costs one
  * extra scan of each input when it IS empty (map-side only; the
  * shuffle exchanges feeding both branches are reused) — the price of
  * not failing at 100 TB on data the optimizer never saw.
  *
  * The bucket width cannot be inferred from a literal (it is a data
  * property — the typical interval length), so it comes from the session
  * conf `spark.graft.rangeJoinRewrite.bucket` — the same contract as the
  * bin-size hint production range-join optimizers require. Unset or
  * non-positive ⇒ the rule stays inactive (the default: a session-wide
  * bin is only meaningful on a known axis, so queries opt in by scoping
  * the conf around plan construction — see `join_range_auto`).
  *
  * Self-termination: filter-pushdown can fold the residual back into the
  * rewritten join's condition on a later optimizer pass; the rule skips
  * any join whose condition references a `__graft_rb`-prefixed attribute
  * — the bucket keys of the equi branch and the [[GuardMarker]] columns
  * of the fallback branches (non-foldable by construction, so constant
  * propagation cannot erase them). Joins carrying an explicit user hint
  * are left untouched — a hint is the user picking the strategy.
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

  /** `x <= y` / `x < y` oriented as (smaller, larger, isStrict). */
  private def asLE(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
    case LessThanOrEqual(x, y) => Some((x, y, false))
    case LessThan(x, y) => Some((x, y, true))
    case GreaterThanOrEqual(y, x) => Some((x, y, false))
    case GreaterThan(y, x) => Some((x, y, true))
    case _ => None
  }

  private def numeric(es: Expression*): Boolean =
    es.forall(_.dataType.isInstanceOf[NumericType])

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
      if (!numeric(p, lo, hi)) None
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

  /** Find the overlap conjunct pair: `aLo <= bHi` and `bLo <= aHi` with
    * the `a` bounds' refs in the left child and the `b` bounds' in the
    * right. Returns (aLo, aHi, bLo, bHi). When several cross-side `<`/
    * `<=` conjuncts exist (e.g. a `a.id < b.id` self-join dedup next to
    * the real bound pair), prefer the pairing with the most NON-STRICT
    * comparisons: canonical interval-overlap predicates are `<=` on
    * both sides, while key-ordering tricks are canonically strict. A
    * wrong pick stays bit-exact (the residual re-applies everything) —
    * the fan-out guard just routes the mismatched axis to the fallback
    * — but the right pick is what makes the rewrite pay.
    */
  private def matchOverlap(cs: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val les = cs.flatMap(asLE).filter { case (x, y, _) =>
      x.references.nonEmpty && y.references.nonEmpty && numeric(x, y)
    }
    val fromL = les.filter { case (x, y, _) =>
      x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)
    }
    val fromR = les.filter { case (x, y, _) =>
      x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet)
    }
    val candidates = for {
      (aLo, bHi, s1) <- fromL
      (bLo, aHi, s2) <- fromR
    } yield ((aLo, aHi, bLo, bHi), Seq(s1, s2).count(!_))
    candidates.sortBy(-_._2).headOption.map(_._1)
  }

  private def bkt(e: Expression, w: Double) =
    floor(ColumnBridge.column(e).cast("double") / w).cast("long")

  /** NaN bound detection on float/double axes (`lit(false)` elsewhere —
    * no per-row cost on the common integer epoch axes). Under Spark's
    * NaN-largest ordering `lo <= hi` is TRUE when `hi` is NaN, and
    * `cast(floor(NaN / w) as long)` buckets to 0 — so a theta-matchable
    * row (b = [5, NaN] overlaps a = [1e9, 1e9+10]) would land in the
    * bucketed branch with a WRONG bucket and silently lose its matches.
    * NaN-bounded rows are routed to the fallback theta branch instead,
    * which evaluates the original condition bit-exactly. `isnan(NULL)`
    * is false, so NULL bounds keep their drop-outright treatment.
    */
  private def nanBound(e: Expression): org.apache.spark.sql.Column =
    e.dataType match {
      case org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.functions.isnan(ColumnBridge.column(e))
      case _ => lit(false)
    }

  /** Marker columns + always-true cross-side conjunct that (a) tags the
    * fallback join so later optimizer passes skip it and (b) cannot be
    * constant-folded away (GuardMarker is non-foldable). The Or
    * references both sides, so predicate pushdown keeps it in the join
    * condition rather than pushing it below one child.
    */
  /** `badIsLeft` names the side holding the guard-rejected rows; that
    * side gets an explicit BROADCAST hint (set on the Join node — see
    * applyMergeHint's ResolvedHint caveat in EditDistJoinRewrite). Why
    * (r12, sf10 probe): without it Spark broadcast the FULL other side
    * — for join_overlap_auto that meant sorting and broadcasting the
    * whole sessionize result once per fallback branch (sf10: 120 s vs
    * 27 s for the explicit operator). With the (normally EMPTY) bad
    * side as the build, the branch costs its build only, and AQE's
    * empty-relation propagation prunes the full side's subtree
    * entirely once the 0-row broadcast materializes. Pathological data
    * now broadcasts its outlier rows — bounded by how many ≥maxFanout-
    * bucket intervals exist, the regime the fallback was built for.
    */
  private def fallbackJoin(
      l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      residual: Expression,
      badIsLeft: Boolean): org.apache.spark.sql.DataFrame = {
    val joined = l.withColumn(MarkerL, ColumnBridge.column(GuardMarker()))
      .join(r.withColumn(MarkerR, ColumnBridge.column(GuardMarker())),
        ColumnBridge.column(residual) && (col(MarkerL) || col(MarkerR)),
        "inner")
    val analyzed = joined.queryExecution.analyzed
    val hi = Some(org.apache.spark.sql.catalyst.plans.logical.HintInfo(
      strategy = Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))
    // recurse through unary wrappers to the Join (applyMergeHint's
    // pattern); a silent fall-through here would leave the full-side
    // broadcast invisible until an sf10 replay hits the 8 GB cap, so
    // hint loss logs loudly (r12 advice) — and PlanShapeSpec's
    // build-side test pins the planned outcome
    def addHint(p: LogicalPlan): LogicalPlan = p match {
      case j: Join if j.hint == JoinHint.NONE =>
        j.copy(hint =
          if (badIsLeft) JoinHint(hi, None) else JoinHint(None, hi))
      case u if u.children.size == 1 =>
        u.withNewChildren(Seq(addHint(u.children.head)))
      case other =>
        logWarning("range-rewrite fallbackJoin: no bare Join found under " +
          s"the analyzed top (${other.nodeName}) — broadcast-bad-side " +
          "hint NOT applied; the fallback may broadcast the full side")
        other
    }
    ColumnBridge.ofRows(session, addHint(analyzed))
  }

  private def rewrite(
      join: Join,
      p: Expression,
      lo: Expression,
      hi: Expression,
      pointIsLeft: Boolean,
      width: Double,
      maxFanout: Long,
      allConjuncts: Seq[Expression]): LogicalPlan = {
    val pDf = ColumnBridge.ofRows(session,
      if (pointIsLeft) join.left else join.right)
    val iDf = ColumnBridge.ofRows(session,
      if (pointIsLeft) join.right else join.left)
    // a malformed hi < lo interval can never contain a point (the bound
    // pair implies lo <= p <= hi), and Spark's descending auto-step
    // sequence would otherwise explode it — drop pre-fan-out. NULL
    // bounds null-reject the original conjuncts, so they match nothing
    // and the valid/wide filters dropping them is exact.
    val span = bkt(hi, width) - bkt(lo, width)
    val valid = ColumnBridge.column(lo) <= ColumnBridge.column(hi)
    val nan = nanBound(lo) || nanBound(hi)
    // the branch-split guards go through PushdownBarrier: they must
    // stay ABOVE the interval child so (a) both branches share the
    // child's exchange (ReuseExchange — unpinned, join_range_auto
    // computed its sessionize twice) and (b) the good/wide partition is
    // decided on the child's OUTPUT rows, not pushed through a merging
    // aggregation onto pre-merge values
    def pin(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(PushdownBarrier(ColumnBridge.expression(c)))
    val pC = pDf.withColumn(PointBucket, bkt(p, width))
    val iC = iDf.filter(pin(!nan && valid && span < lit(maxFanout)))
      .withColumn(IntervalBucket, explode(sequence(bkt(lo, width), bkt(hi, width))))
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
    val outCols = join.output.map(ColumnBridge.column)
    val main = lC.join(rC, joinCond, "inner")
      .filter(ColumnBridge.column(residual))
      .select(outCols: _*)
    // fan-out guard: intervals wider than the cap — or carrying a NaN
    // bound, whose bucket would be wrong — take the original theta join
    // (marker-tagged); normally zero rows
    val wide = iDf.filter(pin(nan || (valid && span >= lit(maxFanout))))
    val (fL, fR) = if (pointIsLeft) (pDf, wide) else (wide, pDf)
    val fb = fallbackJoin(fL, fR, residual, badIsLeft = !pointIsLeft)
      .select(outCols: _*)
    main.union(fb).queryExecution.analyzed
  }

  private def rewriteOverlap(
      join: Join,
      aLo: Expression,
      aHi: Expression,
      bLo: Expression,
      bHi: Expression,
      width: Double,
      maxFanout: Long,
      allConjuncts: Seq[Expression]): LogicalPlan = {
    val aDf = ColumnBridge.ofRows(session, join.left)
    val bDf = ColumnBridge.ofRows(session, join.right)
    // same pushdown pin as the point case: branch-split guards stay
    // above the children so the union branches share each child's
    // exchange and split on output rows, not pre-aggregation values
    def pin(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(PushdownBarrier(ColumnBridge.expression(c)))
    def lohi(lo: Expression, hi: Expression) = {
      val span = bkt(hi, width) - bkt(lo, width)
      val valid = ColumnBridge.column(lo) <= ColumnBridge.column(hi)
      val nan = nanBound(lo) || nanBound(hi)
      (!nan && valid && span < lit(maxFanout), // good: bucketable
        // bad: malformed (the theta join CAN match hi < lo "intervals",
        // e.g. a=[10,5] against b=[0,20]), too wide to explode, or
        // NaN-bounded (wrong bucket under NaN-largest ordering). NULL
        // bounds fall in neither branch — they null-reject the original
        // conjuncts, so they can match nothing.
        nan || (ColumnBridge.column(lo) > ColumnBridge.column(hi)) ||
          (valid && span >= lit(maxFanout)))
    }
    val (goodA, badA) = lohi(aLo, aHi)
    val (goodB, badB) = lohi(bLo, bHi)
    val aC = aDf.filter(pin(goodA)).withColumn(PointBucket,
      explode(sequence(bkt(aLo, width), bkt(aHi, width))))
    val bC = bDf.filter(pin(goodB)).withColumn(IntervalBucket,
      explode(sequence(bkt(bLo, width), bkt(bHi, width))))
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
    val outCols = join.output.map(ColumnBridge.column)
    // exactly-once: keep only the first shared bucket — the one holding
    // the intersection start max(aLo, bLo)
    val firstShared = col(PointBucket) ===
      floor(greatest(ColumnBridge.column(aLo).cast("double"),
        ColumnBridge.column(bLo).cast("double")) / width).cast("long")
    val main = aC.join(bC, joinCond, "inner")
      .filter(ColumnBridge.column(residual) && firstShared)
      .select(outCols: _*)
    // partition of pairs: (good,good) → main; (bad,*) → fb1;
    // (good,bad) → fb2 — each qualifying pair in exactly one branch
    val fb1 = fallbackJoin(aDf.filter(pin(badA)), bDf, residual, badIsLeft = true)
      .select(outCols: _*)
    val fb2 = fallbackJoin(aDf.filter(pin(goodA)), bDf.filter(pin(badB)), residual,
        badIsLeft = false)
      .select(outCols: _*)
    main.union(fb1).union(fb2).queryExecution.analyzed
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.enabled", "true") == "true"

  /** The bin size, from conf; None ⇒ inactive. */
  private def bucketWidth: Option[Double] =
    scala.util.Try(org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.bucket", "")
      .toDouble).toOption.filter(_ > 0)

  /** Max exploded rows per interval before the fallback branch takes
    * over (guards both OOM fan-out and sequence()'s 2^31 limit).
    */
  private def maxFanout: Long =
    scala.util.Try(org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.maxFanout", "4096")
      .toLong).toOption.filter(_ > 0).getOrElse(4096L)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else bucketWidth match {
      case None => plan
      case Some(w) =>
        val cap = maxFanout
        plan.transformUp {
          case j @ Join(left, right, jt, Some(cond), hint)
              if (jt == Inner || jt == Cross) && hint == JoinHint.NONE &&
                !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
            val cs = conjuncts(cond)
            try matchRange(cs, left, right) match {
              case Some((p, lo, hi, pointIsLeft)) =>
                rewrite(j, p, lo, hi, pointIsLeft, w, cap, cs)
              case None =>
                matchOverlap(cs, left, right) match {
                  case Some((aLo, aHi, bLo, bHi)) =>
                    rewriteOverlap(j, aLo, aHi, bLo, bHi, w, cap, cs)
                  case None => j
                }
            } catch {
              case NonFatal(e) =>
                logWarning(
                  s"range-join rewrite failed, keeping nested-loop join: $e")
                j
            }
        }
    }
}

object RangeJoinRewrite {
  /** Shared prefix of every attribute the rewrite introduces — the
    * self-termination skip checks it.
    */
  private[plans] val BucketPrefix = "__graft_rb"
  private[plans] val PointBucket = "__graft_rb_p"
  private[plans] val IntervalBucket = "__graft_rb_i"
  private[plans] val MarkerL = "__graft_rb_ml"
  private[plans] val MarkerR = "__graft_rb_mr"
}

/** Always-true boolean that the optimizer cannot constant-fold
  * (`foldable = false` by construction): tags [[RangeJoinRewrite]]'s
  * fallback joins so the rule's skip check survives FoldablePropagation
  * / BooleanSimplification. Evaluated only on the (normally empty)
  * outlier branches, so CodegenFallback costs nothing.
  */
case class GuardMarker() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override def prettyName: String = "graft_guard_marker"
}

/** Identity wrapper declared NON-deterministic so PushDownPredicates
  * pins the branch-split guard filters exactly where [[RangeJoinRewrite]]
  * put them — directly above the interval child (r12). Unpinned, the
  * deterministic guard predicates were pushed through the child: the two
  * union branches' subtrees then differ below the child's exchange, so
  * ReuseExchange cannot share it and the (often expensive) interval
  * child — `join_range_auto`'s full sessionize window — computes once
  * per branch. Worse, when the child is a MERGING aggregation
  * (session_window), pushing a predicate on the merged bounds below the
  * merge re-evaluates it against PRE-merge per-row windows, so the
  * good/wide row partition the union's exactness proof relies on would
  * be decided on the wrong values. Evaluation cost is one interpreted
  * boolean per interval row (CodegenFallback), far below the duplicated
  * subtree it prevents.
  */
case class PushdownBarrier(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
  override def prettyName: String = "graft_pushdown_pin"
}
