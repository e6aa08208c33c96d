package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Expression, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, BROADCAST, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator band/range join — graft's deepest Catalyst extension
  * tier: a custom `LogicalPlan` node, a `Rule[LogicalPlan]` that
  * recognizes the shape in ordinary joins, a `SparkStrategy`, and a
  * physical `SparkPlan`, wired through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) or `spark.experimental` on a live session.
  *
  * Semantics: inner join of a large `probe` side against a small `bands`
  * side on `lo ⟨op⟩ value ⟨op⟩ hi` (each bound independently strict or
  * inclusive) — the shape of histogram banding, interval tagging,
  * sigma-window filters. Built-in Spark has no equi key to hash on, so
  * it plans BroadcastNestedLoopJoin: every probe row scans all m bands,
  * O(n·m) comparisons. [[RangeJoinExec]] broadcasts the band side
  * (Identity mode — the same `BroadcastExchange` the BNL would build),
  * sorts it by `lo` once per task, and answers each probe row with a
  * binary search plus a prefix-max-`hi` early-stop walk: O(log m + hits)
  * per row, O(n log m) total. At 100 TB probe scale the band table is
  * the (tiny) broadcast dim and the probe side streams partition-local —
  * no shuffle of the big side at all, same as the BNL shape, just
  * without the per-row O(m) scan.
  *
  * Reference anchor: the reference's price-banding and 4σ-window passes
  * (gold_etl_script.py price bands; silver outlier filter) are this
  * operator's shape; SURVEY.md §2.4 records the capability class.
  */
object RangeJoin {

  /** Install the rewrite rule + planner strategy on a LIVE session
    * (idempotent). Sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` get both at build
    * time and don't need this. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
  }

  /** Explicit-API band join: `probe.value ∈ [bands.lo, bands.hi)` (bound
    * inclusivity configurable). Columns are named, resolved here against
    * each side's analyzed plan; band-side attributes are re-aliased if
    * their expr-ids collide with the probe side (self-join safety). */
  def bandJoin(probe: DataFrame, bands: DataFrame, value: String,
               lo: String, hi: String, loInclusive: Boolean = true,
               hiInclusive: Boolean = false): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val pPlan = probe.queryExecution.analyzed
    var bPlan = bands.queryExecution.analyzed
    if (pPlan.outputSet.intersect(bPlan.outputSet).nonEmpty)
      bPlan = Project(bPlan.output.map(a => Alias(a, a.name)()), bPlan)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val node = RangeJoinPlan(pPlan, bPlan, attr(pPlan, value),
      attr(bPlan, lo), attr(bPlan, hi), loInclusive, hiInclusive)
    GraftDatasetShim.ofRows(spark, node)
  }
}

/** Logical band join: output = probe ++ bands, inner semantics. */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
                         value: Expression, lo: Expression, hi: Expression,
                         loInclusive: Boolean, hiInclusive: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Rewrites an ordinary inner join whose condition is EXACTLY a
  * lower+upper bound pair on one value expression into
  * [[RangeJoinPlan]]. Fires only when the band side is broadcast-worthy
  * (stats under the autoBroadcastJoinThreshold, or an explicit broadcast
  * hint): past that size the banded build no longer beats a shuffle
  * strategy and the built-in planner should decide. Joins with equi
  * conjuncts (rj2's equi+band residual shape) have a hash key and are
  * deliberately left to Catalyst's equi-join planning. */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  // one conjunct classified against (probe, band) sides:
  // Lower(bandExpr, inclusive) means bandExpr ⟨≤|<⟩ value,
  // Upper(bandExpr, inclusive) means value ⟨≤|<⟩ bandExpr.
  private sealed trait Bound { def band: Expression; def inclusive: Boolean }
  private case class Lower(band: Expression, inclusive: Boolean) extends Bound
  private case class Upper(band: Expression, inclusive: Boolean) extends Bound

  private def classify(e: Expression, probe: LogicalPlan, bands: LogicalPlan)
      : Option[(Expression, Bound)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
      if (a.references.subsetOf(probe.outputSet) && a.references.nonEmpty &&
          b.references.subsetOf(bands.outputSet))
        Some((a, b, true)) // value on the left of the operator
      else if (b.references.subsetOf(probe.outputSet) && b.references.nonEmpty &&
          a.references.subsetOf(bands.outputSet))
        Some((b, a, false))
      else None
    e match {
      case GreaterThanOrEqual(a, b) => sides(a, b).map {
        case (v, band, true)  => (v, Lower(band, inclusive = true))  // v >= lo
        case (v, band, false) => (v, Upper(band, inclusive = true))  // hi >= v
      }
      case GreaterThan(a, b) => sides(a, b).map {
        case (v, band, true)  => (v, Lower(band, inclusive = false))
        case (v, band, false) => (v, Upper(band, inclusive = false))
      }
      case LessThanOrEqual(a, b) => sides(a, b).map {
        case (v, band, true)  => (v, Upper(band, inclusive = true))  // v <= hi
        case (v, band, false) => (v, Lower(band, inclusive = true))  // lo <= v
      }
      case LessThan(a, b) => sides(a, b).map {
        case (v, band, true)  => (v, Upper(band, inclusive = false))
        case (v, band, false) => (v, Lower(band, inclusive = false))
      }
      case _ => None
    }
  }

  private def broadcastable(side: LogicalPlan, hinted: Boolean): Boolean =
    hinted || (conf.autoBroadcastJoinThreshold > 0 &&
      side.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold)

  private def asBandJoin(probe: LogicalPlan, bands: LogicalPlan,
                         conjuncts: Seq[Expression]): Option[RangeJoinPlan] = {
    val Seq(c1, c2) = conjuncts
    for {
      (v1, b1) <- classify(c1, probe, bands)
      (v2, b2) <- classify(c2, probe, bands)
      if v1.semanticEquals(v2)
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(v1.dataType)
      plan <- (b1, b2) match {
        case (Lower(lo, li), Upper(hi, hiI)) =>
          Some(RangeJoinPlan(probe, bands, v1, lo, hi, li, hiI))
        case (Upper(hi, hiI), Lower(lo, li)) =>
          Some(RangeJoinPlan(probe, bands, v1, lo, hi, li, hiI))
        case _ => None // two lowers / two uppers: not a band
      }
    } yield plan
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val split = splitAnd(cond)
      if (split.length != 2) j
      else {
        val rightHinted = hint.rightHint.exists(_.strategy.contains(BROADCAST))
        val leftHinted = hint.leftHint.exists(_.strategy.contains(BROADCAST))
        val bandsOnRight =
          if (broadcastable(right, rightHinted)) asBandJoin(left, right, split)
          else None
        bandsOnRight match {
          case Some(p) => p
          case None =>
            // probe on the right, bands on the left: join, then restore
            // the original left++right attribute order
            val swapped =
              if (broadcastable(left, leftHinted)) asBandJoin(right, left, split)
              else None
            swapped match {
              case Some(p) => Project(j.output, p)
              case None => j
            }
        }
      }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }
}

/** Plans [[RangeJoinPlan]] to [[RangeJoinExec]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, v, lo, hi, li, hiI) =>
      RangeJoinExec(v, lo, hi, li, hiI, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical band join. The band side arrives through a standard
  * `BroadcastExchange` (Identity mode — whole rows, reused across
  * probe-side partitions and across plan reuse like any broadcast);
  * each task sorts the m bands by `lo` once (O(m log m), m is
  * broadcast-small by the rewrite's own guard) and serves each probe
  * row in O(log m + hits): binary search for the last band with
  * `lo ⟨≤|<⟩ v`, then walk left emitting matches until the running
  * prefix-max of `hi` proves no earlier band can still cover v. Probe
  * side streams with its partitioning intact (`outputPartitioning =
  * left's`) — no shuffle, no per-row O(m) scan, no codegen-breaking
  * driver collect.
  *
  * Interpreted (non-codegen) eval of three bound expressions per row is
  * the cost of generality here; the arithmetic is three comparisons per
  * probe row against the BNL's m, so the trade wins for any m > ~4.
  */
case class RangeJoinExec(value: Expression, lo: Expression, hi: Expression,
                         loInclusive: Boolean, hiInclusive: Boolean,
                         left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val vBound = BindReferences.bindReference(value, left.output)
    val loBound = BindReferences.bindReference(lo, right.output)
    val hiBound = BindReferences.bindReference(hi, right.output)
    val ordering = TypeUtils.getInterpretedOrdering(value.dataType)
    val (loInc, hiInc) = (loInclusive, hiInclusive)
    val (outAttrs, leftAttrs, rightAttrs) = (output, left.output, right.output)

    left.execute().mapPartitions({ iter =>
      // build the per-task index from the broadcast band rows
      val bands = bcast.value.iterator.flatMap { r =>
        val l = loBound.eval(r)
        val h = hiBound.eval(r)
        if (l == null || h == null) Iterator.empty
        else Iterator.single((l, h, r))
      }.toArray
      val sorted = bands.sortBy(_._1)(ordering)
      val n = sorted.length
      val los = sorted.map(_._1)
      val his = sorted.map(_._2)
      val rows = sorted.map(_._3)
      val prefixMaxHi = new Array[Any](n)
      var i = 0
      while (i < n) {
        prefixMaxHi(i) =
          if (i == 0 || ordering.gteq(his(i), prefixMaxHi(i - 1))) his(i)
          else prefixMaxHi(i - 1)
        i += 1
      }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)

      iter.flatMap { probeRow =>
        val v = vBound.eval(probeRow)
        if (v == null || n == 0) Iterator.empty
        else {
          // first index whose lo fails the lower bound: candidates are < firstBad
          var a = 0
          var b = n
          while (a < b) {
            val m = (a + b) >>> 1
            val ok = if (loInc) ordering.lteq(los(m), v) else ordering.lt(los(m), v)
            if (ok) a = m + 1 else b = m
          }
          val start = a - 1
          // The projection is materialized inside next() (never ahead of
          // it): proj reuses one row buffer, so building the next match
          // early would corrupt the row already handed downstream.
          new Iterator[InternalRow] {
            private var idx = start
            private var found = -1
            private def hiOk(h: Any): Boolean =
              if (hiInc) ordering.gteq(h, v) else ordering.gt(h, v)
            private def seek(): Unit = {
              found = -1
              while (idx >= 0 && found == -1) {
                if (!hiOk(prefixMaxHi(idx))) idx = -1 // nothing left can cover v
                else {
                  if (hiOk(his(idx))) found = idx
                  idx -= 1
                }
              }
            }
            seek()
            override def hasNext: Boolean = found >= 0
            override def next(): InternalRow = {
              val r = proj(joined(probeRow, rows(found)))
              seek()
              r
            }
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
