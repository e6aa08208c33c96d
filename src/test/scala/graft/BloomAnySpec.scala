package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomBytesContainAny

/** The set-probe expression contract behind antiJoinFresh's maybe-file
  * selection (r14): one bloom deserialize per ROW, the whole hash list
  * probed against it — semantics must equal the per-key OR it replaced
  * (no false negatives, early-exit ANY), and null blooms must stay
  * null for the caller's isNull policy. */
class BloomAnySpec extends SparkSuite {

  private def bloomOf(keys: Seq[Long]): Array[Byte] = {
    val b = BloomFilter.create(math.max(keys.size.toLong, 100L), 0.01)
    keys.foreach(b.putLong)
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  test("ANY-probe equals the per-key OR: hits when any hash is a " +
    "member, misses when none are, never a false negative") {
    import spark.implicits._
    val members = (0L until 500L).map(_ * 7919L)
    val rows = Seq(
      ("holds", bloomOf(members)),
      ("disjoint", bloomOf(Seq(1L, 2L, 3L))),
      ("nullbloom", null: Array[Byte]))
      .toDF("tag", "bloom")
    // probe list: 99 misses + ONE true member (ANY must find it)
    val probes = ((1L to 99L).map(_ * 1000003L) :+ members(250)).toArray
    val out = rows.select(col("tag"),
        BloomBytesContainAny.column(col("bloom"), probes).as("hit"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("holds") === Some(true),
      "a true member anywhere in the list must hit (no false negatives)")
    assert(out("nullbloom") === None,
      "null bloom bytes must stay null — callers decide the policy")
    // the disjoint bloom: every probe is a non-member; a bloom may
    // false-positive, so assert against the reference per-key OR
    // rather than demanding false
    val ref = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomOf(Seq(1L, 2L, 3L))))
    assert(out("disjoint") === Some(probes.exists(ref.mightContainLong)),
      "ANY-probe must equal the per-key OR on the same bloom")
  }

  test("empty hash list never selects (vacuous ANY is false)") {
    import spark.implicits._
    val rows = Seq(("b", bloomOf(Seq(42L)))).toDF("tag", "bloom")
    val out = rows.select(
        BloomBytesContainAny.column(col("bloom"), Array.empty[Long]))
      .head().getBoolean(0)
    assert(!out)
  }
}
