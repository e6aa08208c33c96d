package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Fused product-quantization subspace assignment: for a
  * `(sub, svec)` pair — subspace index plus that subspace's slice of an
  * embedding — return `struct(cid, cn2)` for the LOWEST-L2 centroid of
  * subspace `sub`'s codebook (ties to the lowest centroid id) along
  * with that centroid's squared norm (the reconstruction-norm
  * contribution `rnorm² = Σ_sub cn2` needs).
  *
  * The kernel companion to [[NearestCentroid]] for the L2/per-subspace
  * case. The equi-join spelling it replaces — `subs.join(broadcast(cb),
  * "sub")` + `min_by` argmin — expands every (vec_id, sub) row across
  * the ≤256 candidate centroids of its subspace: N × PqSub × PqCids
  * physical rows per PQ Lloyd iteration (2048× the corpus at the
  * default geometry) re-aggregated through a struct-buffer `min_by`,
  * which plans as SortAggregate (struct extremum buffers aren't
  * hash-aggregable). Here assignment is a pure projection over the
  * N × PqSub sub-vector rows: the whole per-subspace argmin runs in
  * one in-register loop against the broadcast flat-primitive codebook.
  *
  * Numeric contract: per-candidate distance accumulates
  * `(x-y)²` left-to-right — bit-identical to the
  * `aggregate(zip_with(svec, cvec, (x,y) -> (x-y)*(x-y)), 0D, acc+v)`
  * HOF it replaces — and the argmin tie-break (lowest cid) matches
  * `min_by(struct(d2, cid))`. A `sub` outside the codebook or an
  * `svec` whose length differs from that subspace's centroids yields
  * null (the join spelling produced no row / a null distance).
  */
case class PqSubAssign(left: Expression, right: Expression,
                       book: Broadcast[PqSubAssign.PqBook])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_sub_assign expects (int, array<double>), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cn2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_sub_assign"

  @transient private lazy val bk: PqSubAssign.PqBook = book.value

  override def nullSafeEval(s: Any, v: Any): Any =
    bestRow(s.asInstanceOf[Int], v.asInstanceOf[ArrayData])

  /** The fused argmin; called from both interpreted eval and codegen. */
  def bestRow(sub: Int, x: ArrayData): InternalRow = {
    if (sub < 0 || sub >= bk.subLen.length) return null
    val len = bk.subLen(sub)
    if (x.numElements() != len) return null
    val q = new Array[Double](len)
    var i = 0
    while (i < len) { q(i) = x.getDouble(i); i += 1 }
    val bestAt = PqSubAssign.argminEntry(bk, sub, q)
    if (bestAt < 0) null
    else new GenericInternalRow(Array[Any](bk.cids(bestAt), bk.cn2(bestAt)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPq", this,
      classOf[PqSubAssign].getName)
    nullSafeCodeGen(ctx, ev, (s, v) => {
      s"""
         |${ev.value} = $ref.bestRow($s, $v);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole-vector PQ encoding in one eval: slice the embedding into the
  * codebook's subspaces, argmin each against its broadcast subquantizer
  * (identical per-subspace semantics to [[PqSubAssign]]), and return
  * `struct(code: array<int>, rnorm: double)` — the per-sub centroid
  * ids in subspace order plus √(Σ chosen-centroid norms²), the
  * reconstruction norm ADC rescaling needs.
  *
  * This is the FULL-CORPUS coding pass of an IVF-PQ build: a pure
  * projection (the training loop only ever touches a bounded sample,
  * so this expression is the only thing that reads every row) — no
  * sub-vector explode, no corpus-sized shuffle, no join back to the
  * codebook for norms. A vector whose length differs from the
  * codebook's Σ subLen — or a codebook with an emptied subspace —
  * yields null rather than a silently short code. */
case class PqEncode(child: Expression,
                    book: Broadcast[PqSubAssign.PqBook])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<double>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val bk: PqSubAssign.PqBook = book.value
  @transient private lazy val totalLen: Int = bk.subLen.sum

  override def nullSafeEval(v: Any): Any =
    encodeRow(v.asInstanceOf[ArrayData])

  def encodeRow(x: ArrayData): InternalRow = {
    if (x.numElements() != totalLen) return null
    val nSub = bk.subLen.length
    val code = new Array[Int](nSub)
    var rn2 = 0.0
    var base = 0
    var s = 0
    while (s < nSub) {
      val len = bk.subLen(s)
      val q = new Array[Double](len)
      var i = 0
      while (i < len) { q(i) = x.getDouble(base + i); i += 1 }
      val bestAt = PqSubAssign.argminEntry(bk, s, q)
      if (bestAt < 0) return null // emptied subspace: no silently short code
      code(s) = bk.cids(bestAt)
      rn2 += bk.cn2(bestAt)
      base += len
      s += 1
    }
    new GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(code),
      math.sqrt(rn2)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqEnc", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.encodeRow($v);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Column surface: broadcast the `(sub, cid, cvec)` codebook once on
    * `spark` and encode whole `emb` rows. Returns
    * `struct(code, rnorm)`. */
  def encodeColumn(spark: org.apache.spark.sql.SparkSession, emb: Column,
                   entries: Seq[(Int, Int, Seq[Double])]): Column = {
    val bc = spark.sparkContext.broadcast(PqSubAssign.buildBook(entries))
    org.apache.spark.sql.GraftDatasetShim.column(
      PqEncode(org.apache.spark.sql.GraftDatasetShim.expression(
        emb.cast("array<double>")), bc))
  }
}

object PqSubAssign {

  /** THE per-subspace L2 argmin kernel — the single definition both
    * [[PqSubAssign]] and [[PqEncode]] evaluate (their "identical
    * per-subspace semantics" contract is this shared code, not a
    * convention): left-to-right `(x-y)²` accumulation, strict-less
    * with lowest-cid tie-break. Returns the winning ENTRY index into
    * the book's flat arrays, or -1 for an emptied subspace. */
  private[functions] def argminEntry(bk: PqBook, sub: Int,
                                     q: Array[Double]): Int = {
    val len = bk.subLen(sub)
    val from = bk.entryStart(sub)
    val until = bk.entryStart(sub + 1)
    val flat = bk.flat
    var best = 0.0
    var bestAt = -1
    var e = from
    while (e < until) {
      val off = bk.flatOff(sub) + (e - from) * len
      var d2 = 0.0
      var j = 0
      while (j < len) {
        val d = q(j) - flat(off + j); d2 += d * d; j += 1
      }
      if (bestAt < 0 || d2 < best ||
        (d2 == best && bk.cids(e) < bk.cids(bestAt))) {
        best = d2; bestAt = e
      }
      e += 1
    }
    bestAt
  }

  /** Per-subspace flat codebooks: subspace `s` holds entries
    * `entryStart(s) until entryStart(s+1)` (cids ASCENDING — the
    * tie-break order), each a `subLen(s)`-dim vector at
    * `flatOff(s) + (e - entryStart(s)) * subLen(s)`; `cn2(e)` is the
    * entry's Σv² with left-to-right accumulation. */
  case class PqBook(subLen: Array[Int], entryStart: Array[Int],
                    flatOff: Array[Int], cids: Array[Int],
                    cn2: Array[Double], flat: Array[Double])

  /** Build from `(sub, cid, cvec)` triples (one collect, ≤
    * PqSub × PqCids rows). Subspaces may have different dims (the last
    * absorbs dim % PqSub) and different surviving-centroid counts. */
  def buildBook(entries: Seq[(Int, Int, Seq[Double])]): PqBook = {
    require(entries.nonEmpty, "pq_sub_assign: empty codebook")
    val nSub = entries.map(_._1).max + 1
    val bySub = entries.groupBy(_._1)
    val subLen = new Array[Int](nSub)
    val entryStart = new Array[Int](nSub + 1)
    val flatOff = new Array[Int](nSub)
    var totalEntries = 0
    var totalFlat = 0
    var s = 0
    while (s < nSub) {
      val es = bySub.getOrElse(s, Seq.empty)
      val len = if (es.isEmpty) 0 else es.head._3.length
      require(es.forall(_._3.length == len),
        s"pq_sub_assign: inconsistent dims in subspace $s")
      subLen(s) = len
      entryStart(s) = totalEntries
      flatOff(s) = totalFlat
      totalEntries += es.length
      totalFlat += es.length * len
      s += 1
    }
    entryStart(nSub) = totalEntries
    val cids = new Array[Int](totalEntries)
    val cn2 = new Array[Double](totalEntries)
    val flat = new Array[Double](totalFlat)
    s = 0
    while (s < nSub) {
      val es = bySub.getOrElse(s, Seq.empty).sortBy(_._2)
      var k = 0
      while (k < es.length) {
        val e = entryStart(s) + k
        cids(e) = es(k)._2
        val vec = es(k)._3
        var n2 = 0.0
        var j = 0
        while (j < vec.length) {
          val v = vec(j)
          flat(flatOff(s) + k * subLen(s) + j) = v
          n2 += v * v
          j += 1
        }
        cn2(e) = n2
        k += 1
      }
      s += 1
    }
    PqBook(subLen, entryStart, flatOff, cids, cn2, flat)
  }

  /** Column surface: broadcast the `(sub, cid, cvec)` codebook once on
    * `spark` and score `(sub, svec)` rows. Returns `struct(cid, cn2)`. */
  def assignColumn(spark: org.apache.spark.sql.SparkSession,
                   sub: Column, svec: Column,
                   entries: Seq[(Int, Int, Seq[Double])]): Column = {
    val bc = spark.sparkContext.broadcast(buildBook(entries))
    org.apache.spark.sql.GraftDatasetShim.column(
      PqSubAssign(
        org.apache.spark.sql.GraftDatasetShim.expression(sub.cast("int")),
        org.apache.spark.sql.GraftDatasetShim.expression(
          svec.cast("array<double>")),
        bc))
  }
}
