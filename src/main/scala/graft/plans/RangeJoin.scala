package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, BoundReference, Expression, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, BROADCAST, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

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
               hiInclusive: Boolean = false,
               joinType: String = "inner"): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val jt = JoinType(joinType)
    require(jt == Inner || jt == LeftOuter || jt == LeftSemi,
      s"bandJoin supports inner, left_outer and left_semi, not $joinType")
    val pPlan = probe.queryExecution.analyzed
    var bPlan = bands.queryExecution.analyzed
    if (pPlan.outputSet.intersect(bPlan.outputSet).nonEmpty)
      bPlan = Project(bPlan.output.map(a => Alias(a, a.name)()), bPlan)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val vAttr = attr(pPlan, value)
    val loAttr = attr(bPlan, lo)
    val hiAttr = attr(bPlan, hi)
    // The rewrite path gets analyzer-inserted casts; this direct-build
    // path does not, so a double value against decimal bounds would only
    // surface as a ClassCastException inside the per-task ordering.
    if (loAttr.dataType != vAttr.dataType || hiAttr.dataType != vAttr.dataType)
      throw new IllegalArgumentException(
        s"bandJoin bounds must share the value's type: value '$value' is " +
          s"${vAttr.dataType.simpleString}, lo '$lo' is ${loAttr.dataType.simpleString}, " +
          s"hi '$hi' is ${hiAttr.dataType.simpleString} — cast the columns to a common type first")
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(vAttr.dataType))
      throw new IllegalArgumentException(
        s"bandJoin value type ${vAttr.dataType.simpleString} is not orderable")
    val node = RangeJoinPlan(pPlan, bPlan, vAttr,
      loAttr, hiAttr, loInclusive, hiInclusive, jt)
    GraftDatasetShim.ofRows(spark, node)
  }
}

/** Logical band join. Output by join type: Inner → probe ++ bands,
  * LeftOuter → probe ++ bands-as-nullable (unmatched and null-valued
  * probe rows keep their band columns null), LeftSemi → probe only. */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
                         value: Expression, lo: Expression, hi: Expression,
                         loInclusive: Boolean, hiInclusive: Boolean,
                         joinType: JoinType = Inner)
    extends BinaryNode {
  override def output: Seq[Attribute] = joinType match {
    case LeftSemi => left.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
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
                         conjuncts: Seq[Expression],
                         joinType: JoinType): Option[RangeJoinPlan] = {
    val Seq(c1, c2) = conjuncts
    for {
      (v1, b1) <- classify(c1, probe, bands)
      (v2, b2) <- classify(c2, probe, bands)
      if v1.semanticEquals(v2)
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(v1.dataType)
      plan <- (b1, b2) match {
        case (Lower(lo, li), Upper(hi, hiI)) =>
          Some(RangeJoinPlan(probe, bands, v1, lo, hi, li, hiI, joinType))
        case (Upper(hi, hiI), Lower(lo, li)) =>
          Some(RangeJoinPlan(probe, bands, v1, lo, hi, li, hiI, joinType))
        case _ => None // two lowers / two uppers: not a band
      }
    } yield plan
  }

  // tree-pattern pruning: join-free plans (most of a mixed workload) are
  // skipped by a bitmask check instead of a full-tree traversal
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformWithPruning(
    _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.JOIN)) {
    case j @ Join(left, right, jt @ (Inner | LeftOuter | LeftSemi),
                  Some(cond), hint) =>
      val split = splitAnd(cond)
      if (split.length != 2) j
      else {
        val rightHinted = hint.rightHint.exists(_.strategy.contains(BROADCAST))
        val leftHinted = hint.leftHint.exists(_.strategy.contains(BROADCAST))
        val bandsOnRight =
          if (broadcastable(right, rightHinted)) asBandJoin(left, right, split, jt)
          else None
        bandsOnRight match {
          case Some(p) => p
          case None =>
            // probe on the right, bands on the left: swap, then restore
            // the original left++right attribute order. Only sound for
            // Inner — a LEFT outer/semi join preserves the LEFT side,
            // and with bands there the probe is on the preserved side's
            // opposite: not this operator's shape.
            val swapped =
              if (jt == Inner && broadcastable(left, leftHinted))
                asBandJoin(right, left, split, jt)
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

/** Plans [[RangeJoinPlan]]: broadcast form ([[RangeJoinExec]]) while the
  * band side fits, else the SHUFFLED form ([[RangeJoinPartitionedExec]])
  * — never a BroadcastNestedLoopJoin. 8× the autoBroadcastJoinThreshold
  * is the broadcast cutoff: band rows are narrow (bounds + payload) and
  * the index is O(m), so the operator tolerates more than a hash
  * relation would, but past that `executeBroadcast` would pull an
  * arbitrarily large relation onto the driver; the partitioned form
  * keeps both sides distributed (one shuffle each) and scales with the
  * band table. */
object RangeJoinStrategy extends SparkStrategy {
  private def bandSideFits(bands: LogicalPlan): Boolean = {
    val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    // threshold <= 0 is Spark's "broadcasting DISABLED" convention —
    // it must route to the partitioned exec, not force a broadcast
    // (the user disabled broadcasts precisely to protect the driver)
    threshold > 0 && bands.stats.sizeInBytes <= BigInt(threshold) * 8
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, v, lo, hi, li, hiI, jt) =>
      if (bandSideFits(r))
        RangeJoinExec(v, lo, hi, li, hiI, jt, planLater(l), planLater(r)) :: Nil
      else
        RangeJoinPartitionedExec(v, lo, hi, li, hiI, jt,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Interpreted-ordering wrapper that survives task serialization: the
  * ordering is rebuilt from the (serializable) DataType on each
  * deserialization instead of shipping Catalyst's interpreted ordering
  * object itself. */
private[plans] class SerializableInterpretedOrdering(
    dt: org.apache.spark.sql.types.DataType)
    extends Ordering[Any] with Serializable {
  @transient private lazy val ord = TypeUtils.getInterpretedOrdering(dt)
  override def compare(x: Any, y: Any): Int = ord.compare(x, y)
}

/** SHUFFLED band join — the over-broadcast-threshold form: the classic
  * interval-partitioned join. One `RangePartitioner` is built by
  * sampling the band side's `lo` keys (the same bounded driver
  * footprint any range exchange pays); PROBE rows shuffle to the single
  * range bucket their value falls in, while each BAND row replicates to
  * every bucket its [lo, hi] interval overlaps — a contiguous bucket
  * run by the partitioner's monotonicity, so a covering band is always
  * co-located with the probe rows it can match and no pair is ever
  * produced twice (each probe row lives in exactly one bucket). Each
  * bucket then builds the same sorted prefix-max index the broadcast
  * form uses and probes in O(log m_b + hits).
  *
  * Scale posture: shuffle volume is |probe| + Σ band replication
  * (bounded by |bands| × buckets only for domain-spanning bands); no
  * side is ever collected to the driver and nothing is O(n·m). Skew
  * from a hot value range is the range partitioner's sampling problem,
  * same as any global sort. No codegen — this is the big-band fallback
  * path; the broadcast form carries the hot probe-side pipelines. */
case class RangeJoinPartitionedExec(value: Expression, lo: Expression,
                                    hi: Expression, loInclusive: Boolean,
                                    hiInclusive: Boolean, joinType: JoinType,
                                    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi => left.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinPartitionedExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val vBound = BindReferences.bindReference(value, left.output)
    val factory = RangeJoinIndexFactory(loB, hiB, value.dataType,
      loInclusive, hiInclusive)
    val ord = new SerializableInterpretedOrdering(value.dataType)
    val (outAttrs, leftAttrs, rightAttrs) = (output, left.output, right.output)
    val jt = joinType
    val n = math.max(conf.numShufflePartitions, 1)

    // band rows keyed by lo. COPIES are mandatory on both shuffle
    // inputs: sort-based shuffle buffers deserialized records before
    // serializing, so the upstream iterators' row reuse would corrupt
    // the buffer. PERSISTED, because the RangePartitioner below runs a
    // sampling job over these keys before the real shuffle consumes
    // them — without the cache an expensive band subplan (join/agg
    // upstream) would execute twice per query. Spark's own range
    // exchange accepts that double-execution; a custom exec can do
    // better. The cache is released by the ContextCleaner when the plan
    // drops its reference (the standard cleanup path for exec-internal
    // RDDs — there is no post-materialization hook inside doExecute).
    val bandKeyed = right.execute().mapPartitions(_.flatMap { r =>
      val c = r.copy()
      val l = loB.eval(c)
      if (l == null || hiB.eval(c) == null) Iterator.empty
      else Iterator.single((l, c))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val part = new org.apache.spark.RangePartitioner[Any, InternalRow](
      n, bandKeyed)(ord, scala.reflect.ClassTag.Any)
    // probe rows: exactly one bucket each; null values can match
    // nothing and ride to bucket 0 (LeftOuter still pads them there)
    val keyPart = new org.apache.spark.Partitioner {
      override def numPartitions: Int = part.numPartitions
      override def getPartition(key: Any): Int =
        if (key == null) 0 else part.getPartition(key)
    }
    val probeParted = org.apache.spark.rdd.RDD.rddToPairRDDFunctions(
      left.execute().mapPartitions(_.map { r =>
        val c = r.copy(); (vBound.eval(c), c)
      }))(scala.reflect.ClassTag.Any,
        scala.reflect.classTag[InternalRow], null)
      .partitionBy(keyPart)
    // each band to the contiguous bucket run [p(lo), p(hi)]
    val idPart = new org.apache.spark.Partitioner {
      override def numPartitions: Int = part.numPartitions
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    val bandParted = org.apache.spark.rdd.RDD.rddToPairRDDFunctions(
      bandKeyed.mapPartitions(_.flatMap { case (l, row) =>
        val h = hiB.eval(row)
        (part.getPartition(l) to part.getPartition(h)).iterator
          .map(p => (p, row))
      }))(scala.reflect.classTag[Int],
        scala.reflect.classTag[InternalRow], null)
      .partitionBy(idPart)
    probeParted.zipPartitions(bandParted) { (pIter, bIter) =>
      val index = factory.build(bIter.map(_._2.copy()).toArray)
      RangeJoinProbe.probePartition(jt, index, pIter.map(_._2), vBound,
        outAttrs, leftAttrs, rightAttrs)
    }
  }
}

/** Per-task search index over the broadcast band rows: bands with
  * non-null bounds sorted by `lo`, plus a prefix-max over `hi` that
  * lets the backward candidate walk stop as soon as no earlier band
  * can still cover the probe value. Built once per task (O(m log m),
  * m broadcast-small), served per probe row in O(log m + hits).
  * Methods take boxed values so the generated code can call them
  * directly ([[RangeJoinExec.doConsume]]). */
final class RangeJoinIndex(los: Array[Any], his: Array[Any],
                           prefixMaxHi: Array[Any], rows: Array[InternalRow],
                           ordering: Ordering[Any],
                           loInc: Boolean, hiInc: Boolean) {
  def row(i: Int): InternalRow = rows(i)

  /** Last index whose `lo` passes the lower bound for v; -1 if none. */
  def searchStart(v: Any): Int = {
    var a = 0
    var b = rows.length
    while (a < b) {
      val m = (a + b) >>> 1
      val ok = if (loInc) ordering.lteq(los(m), v) else ordering.lt(los(m), v)
      if (ok) a = m + 1 else b = m
    }
    a - 1
  }

  /** Can any band at index ≤ i still cover v? (prefix-max-hi cutoff) */
  def canCover(i: Int, v: Any): Boolean =
    if (hiInc) ordering.gteq(prefixMaxHi(i), v) else ordering.gt(prefixMaxHi(i), v)

  /** Does band i's own hi cover v? */
  def matches(i: Int, v: Any): Boolean =
    if (hiInc) ordering.gteq(his(i), v) else ordering.gt(his(i), v)
}

/** Driver-built, task-shipped builder: carries the BOUND lo/hi
  * expressions and rebuilds the sorted index from the broadcast rows on
  * each task (both execution paths share it, so interpreted and
  * generated plans cannot diverge). */
case class RangeJoinIndexFactory(loBound: Expression, hiBound: Expression,
                                 dataType: org.apache.spark.sql.types.DataType,
                                 loInc: Boolean, hiInc: Boolean) {
  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(dataType)

  def build(bandRows: Array[InternalRow]): RangeJoinIndex = {
    val bands = bandRows.iterator.flatMap { r =>
      val l = loBound.eval(r)
      val h = hiBound.eval(r)
      if (l == null || h == null) Iterator.empty
      else Iterator.single((l, h, r))
    }.toArray
    val sorted = bands.sortBy(_._1)(ordering)
    val n = sorted.length
    val his = sorted.map(_._2)
    val prefixMaxHi = new Array[Any](n)
    var i = 0
    while (i < n) {
      prefixMaxHi(i) =
        if (i == 0 || ordering.gteq(his(i), prefixMaxHi(i - 1))) his(i)
        else prefixMaxHi(i - 1)
      i += 1
    }
    new RangeJoinIndex(sorted.map(_._1), his, prefixMaxHi, sorted.map(_._3),
      ordering, loInc, hiInc)
  }
}

/** The per-partition probe loop both physical forms share: given the
  * partition's [[RangeJoinIndex]] (built from the broadcast relation or
  * from the partition's shuffled band subset), answer each probe row in
  * O(log m + hits) under the requested join semantics. Executor-side
  * code — everything it closes over is serializable (bound expressions
  * + attribute lists). */
private[plans] object RangeJoinProbe {
  def probePartition(jt: JoinType, index: RangeJoinIndex,
                     iter: Iterator[InternalRow], vBound: Expression,
                     outAttrs: Seq[Attribute], leftAttrs: Seq[Attribute],
                     rightAttrs: Seq[Attribute]): Iterator[InternalRow] = {
    val joined = new JoinedRow
    // under LeftOuter the band fields CAN be null (the all-null pad
    // row); binding against the original non-nullable attrs would let
    // the projection skip isNullAt and read type defaults instead
    val bindAttrs = leftAttrs ++ (
      if (jt == LeftOuter) rightAttrs.map(_.withNullability(true))
      else rightAttrs)
    val proj = UnsafeProjection.create(outAttrs, bindAttrs)
    val semiProj =
      if (jt == LeftSemi) UnsafeProjection.create(outAttrs, leftAttrs) else null
    val nullBand = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(rightAttrs.length)

    iter.flatMap { probeRow =>
      val v = vBound.eval(probeRow)
      val start = if (v == null) -1 else index.searchStart(v)
      jt match {
        case LeftSemi =>
          // emit the probe row once iff ANY band covers it
          var idx = start
          var hit = false
          while (idx >= 0 && !hit) {
            if (!index.canCover(idx, v)) idx = -1
            else { hit = index.matches(idx, v); idx -= 1 }
          }
          if (hit) Iterator.single(semiProj(probeRow)) else Iterator.empty
        case _ =>
          // The projection is materialized inside next() (never ahead of
          // it): proj reuses one row buffer, so building the next match
          // early would corrupt the row already handed downstream.
          val inner = new Iterator[InternalRow] {
            private var idx = start
            private var found = -1
            private def seek(): Unit = {
              found = -1
              while (idx >= 0 && found == -1) {
                if (!index.canCover(idx, v)) idx = -1 // nothing left can cover v
                else {
                  if (index.matches(idx, v)) found = idx
                  idx -= 1
                }
              }
            }
            seek()
            override def hasNext: Boolean = found >= 0
            override def next(): InternalRow = {
              val r = proj(joined(probeRow, index.row(found)))
              seek()
              r
            }
          }
          if (jt == LeftOuter && !inner.hasNext)
            Iterator.single(proj(joined(probeRow, nullBand)))
          else inner
      }
    }
  }
}

/** Physical band join. The band side arrives through a standard
  * `BroadcastExchange` (Identity mode — whole rows, reused across
  * probe-side partitions and across plan reuse like any broadcast);
  * each task builds a [[RangeJoinIndex]] once and serves each probe
  * row in O(log m + hits): binary search for the last band with
  * `lo ⟨≤|<⟩ v`, then walk left emitting matches until the running
  * prefix-max of `hi` proves no earlier band can still cover v. Probe
  * side streams with its partitioning intact (`outputPartitioning =
  * left's`) — no shuffle, no per-row O(m) scan, no codegen-breaking
  * driver collect.
  *
  * Implements [[CodegenSupport]] the way BroadcastHashJoinExec does:
  * the probe side's WholeStageCodegen span runs THROUGH the join — the
  * generated loop evaluates the probe value in-pipeline and calls the
  * index's search/match methods directly, so scan → band join →
  * aggregate is one codegen stage with no row materialization between.
  */
case class RangeJoinExec(value: Expression, lo: Expression, hi: Expression,
                         loInclusive: Boolean, hiInclusive: Boolean,
                         joinType: JoinType,
                         left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi => left.output
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  private def indexFactory: RangeJoinIndexFactory =
    RangeJoinIndexFactory(
      BindReferences.bindReference(lo, right.output),
      BindReferences.bindReference(hi, right.output),
      value.dataType, loInclusive, hiInclusive)

  /** Interpreted path (codegen off / fallback). */
  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val vBound = BindReferences.bindReference(value, left.output)
    val factory = indexFactory
    val (outAttrs, leftAttrs, rightAttrs) = (output, left.output, right.output)
    val jt = joinType

    left.execute().mapPartitions({ iter =>
      val index = factory.build(bcast.value)
      RangeJoinProbe.probePartition(jt, index, iter, vBound,
        outAttrs, leftAttrs, rightAttrs)
    }, preservesPartitioning = true)
  }

  // ---- codegen: the probe-side WholeStageCodegen span runs through ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  // one probe row can emit several joined rows: downstream buffers must copy
  override def needCopyResult: Boolean = true

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
                         row: ExprCode): String = {
    // broadcast handle + index builder live in the references array; the
    // sorted index itself is built once per task in mutable-state init
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val bcTerm = ctx.addReferenceObj("rangeJoinBroadcast", bcast,
      "org.apache.spark.broadcast.Broadcast")
    val factoryTerm = ctx.addReferenceObj("rangeJoinIndexFactory", indexFactory,
      classOf[RangeJoinIndexFactory].getName)
    val idxTerm = ctx.addMutableState(classOf[RangeJoinIndex].getName, "rangeJoinIndex",
      v => s"$v = $factoryTerm.build((InternalRow[]) $bcTerm.value());")

    ctx.currentVars = input
    val valueEv = BindReferences.bindReference(value, left.output).genCode(ctx)
    ctx.currentVars = null
    val bandRow = ctx.freshName("rangeJoinBandRow")
    val i = ctx.freshName("rangeJoinIdx")
    val vBoxed = ctx.freshName("rangeJoinProbe")
    val boxed = CodeGenerator.boxedType(value.dataType)

    joinType match {
      case LeftSemi =>
        // emit the probe row once on the FIRST covering band, then stop
        s"""
           |${valueEv.code}
           |if (!${valueEv.isNull}) {
           |  Object $vBoxed = ($boxed) ${valueEv.value};
           |  for (int $i = $idxTerm.searchStart($vBoxed);
           |       $i >= 0 && $idxTerm.canCover($i, $vBoxed); $i--) {
           |    if ($idxTerm.matches($i, $vBoxed)) {
           |      ${consume(ctx, input)}
           |      break;
           |    }
           |  }
           |}
         """.stripMargin

      case LeftOuter =>
        // BroadcastHashJoin's non-unique outer shape: ONE consume site
        // inside a loop that yields each match, or a single null band row
        // when there were none (or the probe value is null). Band vars
        // are hand-built null-guarded reads so a null bandRow reads as
        // all-null band columns.
        val bandVars = right.output.zipWithIndex.map { case (a, idx0) =>
          val isNull = ctx.freshName("rangeJoinBandIsNull")
          val v = ctx.freshName("rangeJoinBandValue")
          val jType = CodeGenerator.javaType(a.dataType)
          val getter = CodeGenerator.getValue(bandRow, a.dataType, idx0.toString)
          val c =
            code"""
               |boolean $isNull = $bandRow == null || $bandRow.isNullAt($idx0);
               |$jType $v = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getter);
             """.stripMargin
          ExprCode(c, JavaCode.isNullVariable(isNull),
            JavaCode.variable(v, a.dataType))
        }
        val found = ctx.freshName("rangeJoinFound")
        // freshName, not a literal local: two LeftOuter RangeJoinExec
        // nodes fused into one WholeStageCodegen stage nest their loops,
        // and a hardcoded name would be declared twice — janino rejects
        // the duplicate and Spark silently falls back to interpreted.
        val m = ctx.freshName("rangeJoinMatch")
        s"""
           |${valueEv.code}
           |Object $vBoxed = ${valueEv.isNull} ? null : (Object)($boxed) ${valueEv.value};
           |int $i = ($vBoxed == null) ? -1 : $idxTerm.searchStart($vBoxed);
           |boolean $found = false;
           |while (true) {
           |  InternalRow $bandRow = null;
           |  while ($i >= 0 && $idxTerm.canCover($i, $vBoxed)) {
           |    boolean $m = $idxTerm.matches($i, $vBoxed);
           |    if ($m) { $bandRow = $idxTerm.row($i); $i--; break; }
           |    $i--;
           |  }
           |  if ($bandRow == null && $found) break;
           |  $found = true;
           |  ${consume(ctx, input ++ bandVars)}
           |  if ($bandRow == null) break;
           |}
         """.stripMargin

      case _ =>
        ctx.INPUT_ROW = bandRow
        val bandVars = right.output.zipWithIndex.map { case (a, idx0) =>
          BoundReference(idx0, a.dataType, a.nullable).genCode(ctx)
        }
        ctx.INPUT_ROW = null
        s"""
           |${valueEv.code}
           |if (!${valueEv.isNull}) {
           |  Object $vBoxed = ($boxed) ${valueEv.value};
           |  for (int $i = $idxTerm.searchStart($vBoxed);
           |       $i >= 0 && $idxTerm.canCover($i, $vBoxed); $i--) {
           |    if ($idxTerm.matches($i, $vBoxed)) {
           |      InternalRow $bandRow = $idxTerm.row($i);
           |      ${consume(ctx, input ++ bandVars)}
           |    }
           |  }
           |}
         """.stripMargin
    }
  }
}
