package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** "Does this bloom contain ANY of these hashes?" — the per-FILE form of
  * [[BloomBytesContain]] for SET probes, deserializing each row's bloom
  * exactly ONCE and testing the whole hash list against it.
  *
  * Why it exists (r14 profiling): `FileStats.antiJoinFresh` used to ask
  * the per-key question through a join of the sidecar against the
  * batch's broadcast keys, evaluating `graft_bloom_probe(bloom, h)` per
  * (file, key) PAIR — and every evaluation re-ran
  * `BloomFilter.readFrom` over the file's multi-KB bloom bytes. That
  * made the "O(sidecar)" probe actually O(files × batch × bloom-bytes)
  * of deserialization: ~7 s WARM for a 2k-key batch against a 2M-row
  * store (34 files × 2000 keys × ~50 KB each), growing with corpus
  * life. Selection only needs ANY-semantics per file (the maybe-file
  * sliver is settled exactly downstream), so this expression runs once
  * per sidecar ROW: one readFrom, then K in-memory `mightContainLong`
  * bit-probes with early exit — microseconds per file.
  *
  * The hash ARRAY is a constructor field, not a child expression: it
  * rides the serialized plan to executors once per task (≤ the probe's
  * chunk cap), never per row. Evaluated interpreted (CodegenFallback) —
  * it runs once per sidecar row, a frame of O(files) rows.
  */
case class BloomBytesContainAny(child: Expression, hashes: Array[Long])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe_any expects BINARY bloom bytes, got ${t.sql}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe_any"

  override def nullSafeEval(bytes: Any): Any = {
    val bloom = BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
    var i = 0
    while (i < hashes.length) {
      if (bloom.mightContainLong(hashes(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BloomBytesContainAny {
  def column(bloomBytes: Column, hashes: Array[Long]): Column =
    org.apache.spark.sql.GraftDatasetShim.column(BloomBytesContainAny(
      org.apache.spark.sql.GraftDatasetShim.expression(bloomBytes), hashes))
}
