package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: the interleave matches a reference Morton model
  * bit-for-bit, and — the point of the exercise — the written layout
  * keeps per-file min/max ranges tight on EVERY clustered column, where
  * a linear composite sort serves only its leading column. */
class ZOrderSpec extends SparkSuite {

  private def morton(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the reference Morton model bit-for-bit") {
    val df = spark.range(2000).select(
      pmod(xxhash64(col("id")), lit(65536)).cast("int").as("a"),
      pmod(xxhash64(col("id"), lit(7)), lit(65536)).cast("int").as("b"))
    val rows = df.select(col("a"), col("b"),
      ZOrder.interleave(Seq(col("a"), col("b")), 16).as("z")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) === morton(r.getInt(0), r.getInt(1)),
        s"mismatch at (${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("z-order keeps per-file ranges tight on BOTH columns; linear sort does not") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val df = spark.range(40000).select(
      pmod(xxhash64(col("id")), lit(10000)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(13)), lit(10000)).cast("int").as("y"))
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.parquet(s"$base/linear")
    ZOrder.cluster(df, Seq(col("x"), col("y")), 16)
      .write.parquet(s"$base/zorder")

    def sumFileRange(dir: String, c: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("r"))
        .agg(sum(col("r"))).head().getLong(0)

    val (linX, linY) = (sumFileRange(s"$base/linear", "x"),
      sumFileRange(s"$base/linear", "y"))
    val (zX, zY) = (sumFileRange(s"$base/zorder", "x"),
      sumFileRange(s"$base/zorder", "y"))
    // linear: x is clustered (sum ~ full range), y is not (sum ~ 16x range)
    assert(linY > linX * 4, s"fixture degenerate: linX=$linX linY=$linY")
    // z-order: the TRAILING column tightens by 2x+ ...
    assert(zY * 2 < linY, s"z-order did not tighten y: zY=$zY linY=$linY")
    // ... and the worst-case column beats linear's worst case by 2x+
    // (the multi-column pruning claim in one number)
    assert(math.max(zX, zY) * 2 < math.max(linX, linY),
      s"worst-column ranges: zorder=${math.max(zX, zY)} linear=${math.max(linX, linY)}")
  }
}
