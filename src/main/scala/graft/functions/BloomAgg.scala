package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Per-GROUP bloom filter aggregate over xxhash64 fingerprints.
  *
  * `DataFrameStatFunctions.bloomFilter` builds ONE filter for a whole
  * DataFrame (a driver-side treeAggregate); there is no public per-group
  * spelling — but per-group is exactly what file-level skipping needs
  * (one bloom per physical file, keyed by `input_file_name()`,
  * store.FileStats). This Aggregator is that spelling: partial filters
  * build map-side per group, merge by OR (`mergeInPlace` — blooms of
  * equal geometry are a commutative monoid), and finish to the
  * serialized bytes that `graft_bloom_contains` / `BloomFilter.readFrom`
  * probe.
  *
  * Inputs are xxhash64 values (BIGINT), not raw keys, so one aggregate
  * shape serves every key type and the probe side hashes the same way
  * (the BloomDedup convention). All groups must share
  * (`expectedItems`, `fpp`): merge geometry must match.
  */
class BloomAgg(expectedItems: Long, fpp: Double)
  extends Aggregator[Long, BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, h: Long): BloomFilter = {
    b.putLong(h); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }
  override def finish(b: BloomFilter): Array[Byte] =
    BloomContains.serialize(b)
  // the sketch's BloomFilterImpl is Serializable by design (it rides
  // broadcasts); java serialization only touches partial-merge boundaries
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** `bloom(xxhash64_col)` as an aggregate Column. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new BloomAgg(expectedItems, fpp)).apply(c)
}
