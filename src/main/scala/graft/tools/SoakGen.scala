package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Scaled synthetic bronze generator for pipeline soaks:
  *
  *   sbt "runMain graft.tools.SoakGen <outBase> [n1] [updates] [newDay2]"
  *
  * Writes chotot-shaped JSONL (the reference's bronze envelope,
  * real_estate_scrappers/.../pipelines.py:91-93 upload shape) under
  * outBase/bronze/chotot_api/year=2025/month=01/:
  *   - 2025-01-15: n1 records (default 100,000)
  *   - 2025-01-16: `updates` re-sends with changed names (SCD2 close-outs)
  *     + `newDay2` brand-new records (default 20,000 + 10,000)
  *
  * Pair with EtlRunner to soak either commit protocol:
  *   runMain graft.tools.EtlRunner <outBase>/bronze 2025-01-15 <outBase>/lake full pointer
  *   runMain graft.tools.EtlRunner <outBase>/bronze 2025-01-16 <outBase>/lake incremental pointer
  */
object SoakGen {

  private def record(i: Long, name: String, ts: String): String = {
    val lo = 1.0e9 + (i % 1000) * 1e6
    val hi = 2.0e9 + (i % 1000) * 1e6
    val district = s"Quận ${i % 12 + 1}"
    s"""{"timestamp":"$ts","spider_name":"chotot_api","process_run_id":"soak_$ts","project_oid":"soak_$i","project_name":"$name $i","alias":"sk$i","type_name":"apartment","process":"selling","introduction":"Căn hộ &amp; tiện nghi<br/>có bể bơi","address":"$i Lê Lợi","ward_name":"Phường ${i % 20 + 1}","area_name":"$district","region_name":"Hồ Chí Minh","area_total":${1000 + i % 5000}.0,"unit_total":"${50 + i % 400}","sell_price_lower":$lo,"sell_price_higher":$hi,"price_lowest_per_m2":${4.0e7 + (i % 300) * 1e5},"price_highest_per_m2":${6.0e7 + (i % 300) * 1e5},"investor_name":"Investor ${i % 500}","facilities":["pool","gym"],"project_images":["http://img/$i.jpg"],"web_url":"http://chotot.example/$i","geo":"10.7${i % 90 + 10},106.6${i % 90 + 10}"}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SoakGen <outBase> [n1] [updates] [newDay2]")
    val base = args(0)
    val n1 = args.lift(1).map(_.toLong).getOrElse(100000L)
    val updates = args.lift(2).map(_.toLong).getOrElse(20000L)
    val newDay2 = args.lift(3).map(_.toLong).getOrElse(10000L)
    val dir = Paths.get(base, "bronze", "chotot_api", "year=2025", "month=01")
    Files.createDirectories(dir)

    def writeLines(file: String, lines: Iterator[String]): Unit = {
      val w = Files.newBufferedWriter(dir.resolve(file), StandardCharsets.UTF_8)
      try lines.foreach { l => w.write(l); w.newLine() } finally w.close()
    }
    writeLines("20250115_080000.jsonl",
      (0L until n1).iterator.map(i => record(i, "Chung cư", "2025-01-15T08:00:00")))
    writeLines("20250116_080000.jsonl",
      (0L until updates).iterator
        .map(i => record(i, "Đổi tên", "2025-01-16T08:00:00")) ++
        (n1 until n1 + newDay2).iterator
          .map(i => record(i, "Chung cư", "2025-01-16T08:00:00")))
    println(s"[soakgen] day1=$n1 day2=${updates + newDay2} ($updates updates, $newDay2 new) under $dir")
  }
}
