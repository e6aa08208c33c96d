package graft.fixtures

import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Synthetic bronze JSONL reproducing the reference's three source shapes
  * (FIXTURES.md §B). Deterministic; covers: duplicate (spider, source_id)
  * with differing timestamps (keep-latest), missing critical fields
  * (quarantine), a 4σ price outlier (needs n≥21 peers — max single-outlier
  * z is (n-1)/√n), HTML entities, Vietnamese city spellings, zero coords
  * with a known centroid district, priced/unpriced records in one district
  * (median imputation), both handover_date_from formats, and all the
  * nested structures (GeoJSON, translation arrays, albums, insights).
  */
object BronzeFixtures {

  private def env(ts: String, spider: String): String =
    s""""timestamp":"$ts","spider_name":"$spider","process_run_id":"run_20250115""""

  def chototLines: Seq[String] = {
    // 24 regular records with ~1e9 prices, so the 1e15 outlier exceeds 4σ
    val regulars = (1 to 24).map { i =>
      val lo = 1.0e9 + i * 1e7
      val hi = 2.0e9 + i * 1e7
      s"""{${env("2025-01-15T08:00:00", "chotot_api")},"project_oid":"ch_$i","project_name":"Chung cư Sài Gòn $i","alias":"csg$i","type_name":"apartment","process":"selling","introduction":"Căn hộ cao cấp &amp; hiện đại<br/>có bể bơi và phòng gym","address":"$i Lê Lợi","full_address":"$i Lê Lợi, Quận 1","street_name":"Lê Lợi","ward_name":"Bến Nghé","area_name":"Quận 1","region_name":"Hồ Chí Minh","area_total":${4000 + i * 10}.0,"area_construction":${2000 + i * 5}.0,"unit_total":"${100 + i}","sell_price_lower":$lo,"sell_price_higher":$hi,"price_lowest_per_m2":${4.0e7 + i * 1e5},"price_highest_per_m2":${6.0e7 + i * 1e5},"investor_id":"inv_$i","investor_name":"Investor $i","start_construction":"2021-03-0${i % 9 + 1}","facilities":["pool","gym"],"project_images":["http://img/$i.jpg"],"web_url":"http://chotot.example/$i","geo":"10.77${i % 10},106.70${i % 10}"}"""
    }
    val outlier =
      s"""{${env("2025-01-15T08:00:00", "chotot_api")},"project_oid":"ch_outlier","project_name":"Outlier Tower","type_name":"apartment","process":"selling","introduction":"expensive","area_name":"Quận 1","region_name":"Hồ Chí Minh","sell_price_lower":1.0e15,"sell_price_higher":1.1e15,"geo":"10.776,106.700"}"""
    val dupOld =
      s"""{${env("2025-01-15T08:00:00", "chotot_api")},"project_oid":"ch_dup","project_name":"Old Name","type_name":"apartment","area_name":"Quận 3","region_name":"Hồ Chí Minh","sell_price_lower":1.5e9,"sell_price_higher":2.5e9,"geo":"10.783,106.683"}"""
    val dupNew =
      s"""{${env("2025-01-15T09:30:00", "chotot_api")},"project_oid":"ch_dup","project_name":"New Name","type_name":"apartment","area_name":"Quận 3","region_name":"Hồ Chí Minh","sell_price_lower":1.6e9,"sell_price_higher":2.6e9,"geo":"10.783,106.683"}"""
    val noName = // project_name missing → invalid → quarantine
      s"""{${env("2025-01-15T08:00:00", "chotot_api")},"project_oid":"ch_invalid","type_name":"apartment","region_name":"Hồ Chí Minh"}"""
    regulars :+ outlier :+ dupOld :+ dupNew :+ noName
  }

  def meeyLines: Seq[String] = {
    def rec(i: Int, priced: Boolean, district: String = "Cầu Giấy"): String = {
      val prices = if (priced)
        s""""lowestPriceByProduct":${2.0e9 + i * 1e8},"highestPriceByProduct":${3.0e9 + i * 1e8},"lowestPriceByM2":${5.0e7 + i * 1e6},"highestPriceByM2":${7.0e7 + i * 1e6},"""
      else ""
      s"""{${env("2025-01-15T08:15:00", "meeyproject_api")},"_id":"me_$i","name":"Khu đô thị Hà Nội $i","tradeName":"KDT$i","slug":"kdt-$i","description":"Dự án có sân chơi và khu vui chơi cho trẻ em, an ninh 24/7","address":"$i Xuân Thủy",$prices"totalArea":${10000 + i * 100}.0,"totalApartment":${500 + i},"buildingDensity":0.${40 + i % 10},"totalBuilding":${3 + i % 5},"totalFloor":${20 + i},"location":{"type":"Point","coordinates":[105.79${i % 10},21.03${i % 10}]},"projectTypes":[{"translation":[{"name":"Căn hộ"},{"name":"Apartment"}]},{"translation":[{"name":"Căn hộ"}]}],"images":[{"url":"http://meey/img$i.jpg"},{"url":"http://meey/img${i}b.jpg"}],"videos":["http://meey/v$i.mp4"],"investorRelated":{"investor":{"name":"Tập đoàn $i"}},"utilities":{"basicUtilities":["Hồ bơi","Gym"]},"ward":{"translation":[{"name":"Dịch Vọng"}]},"district":{"translation":[{"name":"$district"}]},"city":{"translation":[{"name":"Hà Nội"}]}}"""
    }
    // 5 priced + 1 unpriced in Cầu Giấy (district-median imputation), one
    // with zero coords for centroid geocoding, one unknown district
    val priced = (1 to 5).map(i => rec(i, priced = true))
    val unpriced =
      s"""{${env("2025-01-15T08:15:00", "meeyproject_api")},"_id":"me_unpriced","name":"Dự án chưa có giá","description":"mới mở bán","address":"99 Xuân Thủy","totalArea":8000.0,"totalApartment":400,"location":{"type":"Point","coordinates":[105.794,21.034]},"district":{"translation":[{"name":"Cầu Giấy"}]},"city":{"translation":[{"name":"Hà Nội"}]},"ward":{"translation":[{"name":"Dịch Vọng"}]}}"""
    val zeroCoords =
      s"""{${env("2025-01-15T08:15:00", "meeyproject_api")},"_id":"me_zerocoord","name":"Dự án thiếu tọa độ","description":"vị trí đẹp","address":"1 Láng Hạ","lowestPriceByProduct":2.5e9,"highestPriceByProduct":3.5e9,"lowestPriceByM2":6.0e7,"highestPriceByM2":8.0e7,"totalArea":6000.0,"totalApartment":300,"location":{"type":"Point","coordinates":[0.0,0.0]},"district":{"translation":[{"name":"Cầu Giấy"}]},"city":{"translation":[{"name":"Hà Nội"}]},"ward":{"translation":[{"name":"Quan Hoa"}]}}"""
    val unknownDistrict =
      s"""{${env("2025-01-15T08:15:00", "meeyproject_api")},"_id":"me_unknown","name":"Dự án tỉnh lẻ","description":"ngoại thành","address":"5 Tỉnh Lộ","totalArea":3000.0,"totalApartment":100,"location":{"type":"Point","coordinates":[106.1,20.5]},"district":{"translation":[{"name":"Huyện Xa"}]},"city":{"translation":[{"name":"Tỉnh Khác"}]},"ward":{"translation":[{"name":"Xã Nào"}]}}"""
    priced :+ unpriced :+ zeroCoords :+ unknownDistrict
  }

  def onehousingLines: Seq[String] = {
    val isoDate = // handover as ISO string
      s"""{${env("2025-01-15T08:30:00", "onehousing_api")},"id":"oh_1","name":"OneHousing Tower A","code":"OHA","slug":"oh-a","description":"Premium tower with swimming pool, gym, parking and garden","address":"12 Phạm Hùng","ward":"Mỹ Đình 1","district":"Nam Từ Liêm","city":"Hà Nội","province":"Hà Nội","lat_cdnt":21.028,"long_cdnt":105.778,"total_area":0.5,"blocks":3,"total_property":600,"number_living_floor":30,"green_dens":0.35,"cstn_dens":0.45,"swim_dens":"0.05","min_prop_per_floor":8,"max_prop_per_floor":12,"min_selling_price":2.8e9,"max_selling_price":4.2e9,"min_unit_price":5.5e7,"max_unit_price":7.5e7,"insight_by_bedroom":[{"number_of_bedroom":1,"min_price":2.0e9,"max_price":2.5e9,"min_carpet_area":45.0,"max_carpet_area":55.0},{"number_of_bedroom":2,"min_price":2.8e9,"max_price":3.5e9,"min_carpet_area":65.0,"max_carpet_area":80.0},{"number_of_bedroom":3,"min_price":3.8e9,"max_price":4.2e9,"min_carpet_area":90.0,"max_carpet_area":110.0}],"developer_name":"Masterise","handover_date_from":"2022-04-01","construction_start_date_from":"2020-01-15","trans_grade":"Tốt","infra_grade":"Rất tốt","school_grade":"Khá","master_plan":"http://oh/mp1.png","quality_indexes":[{"name":"air quality"},{"name":"noise"}],"albums":[{"images":["http://oh/a1.jpg","http://oh/a2.jpg"]},{"images":["http://oh/b1.jpg"]}],"videos":["http://oh/v1.mp4"],"number_basement":[2],"number_ele":[6]}"""
    val epochDate = // handover as epoch millis (1648771200000 = 2022-04-01)
      s"""{${env("2025-01-15T08:30:00", "onehousing_api")},"id":"oh_2","name":"OneHousing Tower B","code":"OHB","slug":"oh-b","description":"Tower with security and playground","address":"99 Cầu Giấy","ward":"Quan Hoa","district":"Cầu Giấy","city":"Hà Nội","province":"Hà Nội","lat_cdnt":21.035,"long_cdnt":105.795,"total_area":1.2,"blocks":2,"total_property":400,"number_living_floor":25,"green_dens":0.3,"cstn_dens":0.5,"min_prop_per_floor":6,"max_prop_per_floor":10,"min_selling_price":3.0e9,"max_selling_price":4.0e9,"min_unit_price":6.0e7,"max_unit_price":8.0e7,"insight_by_bedroom":[{"number_of_bedroom":2,"min_price":3.0e9,"max_price":3.6e9,"min_carpet_area":70.0,"max_carpet_area":85.0}],"developer_name":"Vinhomes","handover_date_from":1648771200000,"construction_start_date_from":"2019-06-01","trans_grade":"Thuận tiện","infra_grade":"Tốt","school_grade":"Tốt","albums":[{"images":["http://oh/c1.jpg"]}],"number_basement":[3],"number_ele":[4]}"""
    val zeroCoords = // known (city, district) centroid, lat/lon = 0 → geocode
      s"""{${env("2025-01-15T08:30:00", "onehousing_api")},"id":"oh_3","name":"OneHousing Tower C","code":"OHC","slug":"oh-c","description":"Compact tower","address":"5 Trần Duy Hưng","ward":"Trung Hòa","district":"Cầu Giấy","city":"Hà Nội","province":"Hà Nội","lat_cdnt":0.0,"long_cdnt":0.0,"total_area":0.8,"blocks":1,"total_property":200,"number_living_floor":20,"min_prop_per_floor":5,"max_prop_per_floor":8,"min_selling_price":2.5e9,"max_selling_price":3.5e9,"min_unit_price":5.0e7,"max_unit_price":7.0e7,"developer_name":"Sunshine","trans_grade":"Tốt","infra_grade":"Khá","school_grade":"Tốt"}"""
    Seq(isoDate, epochDate, zeroCoords)
  }

  /** Writes bronze/{spider}/year=2025/month=01/20250115_080000.jsonl under
    * `base`; returns the bronze base path. */
  def write(base: String): String = {
    def writeFile(spider: String, lines: Seq[String]): Unit = {
      val dir = Paths.get(base, "bronze", spider, "year=2025", "month=01")
      Files.createDirectories(dir)
      Files.write(dir.resolve("20250115_080000.jsonl"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    writeFile("chotot_api", chototLines)
    writeFile("meeyproject_api", meeyLines)
    writeFile("onehousing_api", onehousingLines)
    s"$base/bronze"
  }

  val TotalRecords: Int = 28 + 8 + 3   // chotot + meey + onehousing
  val InvalidRecords: Int = 1          // chotot noName
  val DuplicatePairs: Int = 1          // ch_dup old/new
}
