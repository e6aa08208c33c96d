package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal tests: BMP/WAV/MP4 decode is REAL (pure-JVM
  * header+payload+sample-table parsers) and pinned against
  * analytically-computed feature values. Schema, batch shape,
  * partitioning, and determinism are exercised throughout. */
class MultimodalSpec extends SparkSuite {
  import graft.multimodal.Mp4

  test("BMP decode reads real pixels: brightness matches the analytic value") {
    // media_id 0 is an image: 16x8 grayscale, pixel v = (x*7 + y*13) % 251
    val expectedSum = (for (x <- 0 until 16; y <- 0 until 8)
      yield (x * 7 + y * 13) % 251).sum
    val expected = expectedSum.toDouble / 255.0 / (16 * 8)
    val feats = Multimodal.extractFeatures(spark, Multimodal.fixture(spark, 1))
      .collect()
    assert(feats.length === 1)
    assert(math.abs(feats(0).brightness - expected) < 1e-12,
      s"got ${feats(0).brightness}, expected $expected — parser not reading pixel payload")
    // the fixture bytes really are a BMP container, not raw pixels
    val bytes = Multimodal.fixture(spark, 1).collect()(0).content
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    assert(bytes.length === 54 + 16 * 8 * 3)
  }

  test("WAV decode walks RIFF chunks to real samples: loudness matches the analytic value") {
    // media_id 1 is audio: 500 samples, s_j = ((31 + j*7) % 2003) - 1001
    val n = 500
    val expectedAbsSum = (0 until n).map(j =>
      math.abs((31 + j * 7) % 2003 - 1001).toLong).sum
    val expected = expectedAbsSum.toDouble / n / 32768.0
    val audio = Multimodal.fixture(spark, 2).filter(_.kind == "audio")
    val feats = Multimodal.extractFeatures(spark, audio).collect()
    assert(feats.length === 1)
    assert(math.abs(feats(0).brightness - expected) < 1e-12,
      s"got ${feats(0).brightness}, expected $expected — parser not reading PCM payload")
    val bytes = audio.collect()(0).content
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    assert(bytes.length === 44 + 2 * n)
  }

  test("WAV parser is chunk-order robust, not offset-hardcoded") {
    // hand-build a WAV with an extra LIST chunk BEFORE fmt/data; the
    // parser must still find both by walking the chunk list
    val samples = Array[Short](100, -200, 300, -400)
    val extra = "junkdata".getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer
      .allocate(12 + (8 + extra.length) + 24 + 8 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(extra.length).put(extra)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val (brightness, emb) = Multimodal.decodeWav(bb.array())
    assert(math.abs(brightness - (100 + 200 + 300 + 400).toDouble / 4 / 32768.0) < 1e-12)
    assert(emb.length === 16)
  }

  test("MP4 decode walks the sample table to real frames: brightness matches the analytic value") {
    // media_id 2 is a video: 4 frames of 16×8 luma, v = (62 + f*17 + x*7 + y*13) % 251
    val expectedSum = (for (f <- 0 until 4; x <- 0 until 16; y <- 0 until 8)
      yield (2 * 31 + f * 17 + x * 7 + y * 13) % 251).sum
    val expected = expectedSum.toDouble / 255.0 / (4 * 16 * 8)
    val video = Multimodal.fixture(spark, 3).filter(_.kind == "video")
    val feats = Multimodal.extractFeatures(spark, video).collect()
    assert(feats.length === 1)
    assert(math.abs(feats(0).brightness - expected) < 1e-12,
      s"got ${feats(0).brightness}, expected $expected — parser not reading mdat payload")
  }

  test("MP4 container is structurally valid with constant moov overhead") {
    val bytes = Multimodal.fixture(spark, 3).filter(_.kind == "video")
      .collect()(0).content
    assert(new String(bytes, 4, 4, "US-ASCII") === "ftyp")
    assert(bytes.length === 592 + 4 * 16 * 8,
      "container size drifted from the 592 + f·w·8 formula the mm1 oracle uses")
    val m = Mp4.parse(bytes)
    assert(m.timescale === 1000 && m.duration === 400 && m.durationMs === 400)
    assert(m.trackWidth === 16 && m.trackHeight === 8)
    assert(m.samples.format === "raw " && m.samples.depth === 8)
    assert(m.samples.sizes.toSeq === Seq.fill(4)(16 * 8))
  }

  test("MP4 parser is box-order robust, not offset-hardcoded") {
    // rebuild media 2's container as ftyp | free | moov | mdat (moov-first
    // streaming layout plus a skippable box) with the stco offset patched;
    // the walker must produce identical features
    val std = Multimodal.fixture(spark, 3).filter(_.kind == "video")
      .collect()(0).content
    val ftyp = std.slice(0, 24)
    val mdat = std.slice(24, std.length - 560)
    val moov = std.slice(std.length - 560, std.length)
    val free = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("free".getBytes("US-ASCII"))
      .put("skipme!!".getBytes("US-ASCII")).array()
    // stco's single chunk offset is the last 4 bytes of this moov layout
    val patched = moov.clone()
    java.nio.ByteBuffer.wrap(patched, patched.length - 4, 4)
      .putInt(24 + 16 + 560 + 8)
    val reordered = ftyp ++ free ++ patched ++ mdat
    val (b1, e1) = Mp4.features(reordered)
    val (b2, e2) = Mp4.features(std)
    assert(b1 === b2)
    assert(e1.toSeq === e2.toSeq)
  }

  test("frame sampling extracts the REAL stored frame bytes") {
    // media 2, frame_idx 0 → sample 0: bytes must equal the pixel formula
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.fixture(spark, 3).filter(_.kind == "video")).collect()
      .sortBy(_.frame_idx)
    val expected = (for (y <- 0 until 8; x <- 0 until 16)
      yield ((2 * 31 + 0 * 17 + x * 7 + y * 13) % 251).toByte).toArray
    assert(frames(0).frame.toSeq === expected.toSeq,
      "frame 0 bytes are not the stored sample payload")
    // evenly-spaced sampling: 4 of 4 frames → src = frame_idx, all distinct
    assert(frames.map(_.frame.toSeq).distinct.length === 4)
  }

  test("corrupt media degrades to stub features instead of failing the batch") {
    import org.apache.spark.sql.{Encoders => E}
    val good = Multimodal.fixture(spark, 3).collect()
    // corrupt each format: truncated BMP, WAV with a lying chunk size,
    // MP4 magic followed by garbage boxes
    val corrupt = Seq(
      good(0).copy(content = good(0).content.take(20)),             // BMP cut mid-header
      good(2).copy(content = good(2).content.take(40)),             // MP4 cut mid-moov ref
      good(2).copy(content = good(2).content.updated(30, 0x7f.toByte)
        .take(200))                                                  // mangled box sizes
    )
    val ds = spark.createDataset(corrupt)(E.product[graft.multimodal.Multimodal.MediaRow])
    val feats = Multimodal.extractFeatures(spark, ds).collect()
    assert(feats.length === corrupt.length, "every corrupt row must still emit features")
    assert(feats.forall(_.embedding.length == 16))
    // and frame sampling over a corrupt video falls back to byte slices
    val frames = Multimodal.sampleFrames(spark,
      spark.createDataset(corrupt.filter(_.kind == "video"))(
        E.product[graft.multimodal.Multimodal.MediaRow])).collect()
    assert(frames.length === 2 * 4, "4 fallback slices per corrupt video")
  }

  test("corrupt stsz count bombs degrade instead of allocating gigabytes") {
    import org.apache.spark.sql.{Encoders => E}
    val good = Multimodal.fixture(spark, 3).collect().find(_.kind == "video").get
    // locate the stsz box and patch sample_count to ~1 billion: parse()
    // must reject it BEFORE allocating (OutOfMemoryError is an Error the
    // decode() fallback cannot absorb)
    val c = good.content.clone()
    val stszAt = c.indices.find(p => p + 4 < c.length &&
      c(p) == 's' && c(p + 1) == 't' && c(p + 2) == 's' && c(p + 3) == 'z').get
    val countAt = stszAt + 4 + 8 // past tag, version/flags, uniform size
    c(countAt) = 0x40.toByte; c(countAt + 1) = 0; c(countAt + 2) = 0; c(countAt + 3) = 0
    intercept[IllegalArgumentException](graft.multimodal.Mp4.parse(c))
    // and through the pipeline it degrades to stub features, same contract
    val ds = spark.createDataset(Seq(good.copy(content = c)))(
      E.product[graft.multimodal.Multimodal.MediaRow])
    val feats = Multimodal.extractFeatures(spark, ds).collect()
    assert(feats.length === 1 && feats(0).embedding.length === 16)
  }

  test("corrupt BMP passes through resize unchanged; top-down sources resize unflipped") {
    import org.apache.spark.sql.{Encoders => E}
    val good = Multimodal.fixture(spark, 1).collect()(0) // id 0: 16x8 image
    // header claims 16x8 but payload is truncated: resizeImages must pass
    // the row through unchanged, not fail the task
    val truncated = good.copy(content = good.content.take(60))
    val out = Multimodal.resizeImages(spark,
      spark.createDataset(Seq(truncated))(
        E.product[graft.multimodal.Multimodal.MediaRow]), 8, 4).collect()(0)
    assert(out.content.toSeq === truncated.content.toSeq, "corrupt BMP must pass through")
    // top-down variant (negative biHeight, rows stored top-first) must
    // resize to the same bottom-up output as the bottom-up original
    val src = good.content
    val topDown = src.clone()
    val bb = java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -8)
    val rowSize = 16 * 3
    for (r <- 0 until 8; i <- 0 until rowSize)
      topDown(54 + r * rowSize + i) = src(54 + (7 - r) * rowSize + i)
    assert(Multimodal.resizeBmp(topDown, 8, 4).toSeq ===
      Multimodal.resizeBmp(src, 8, 4).toSeq, "top-down source re-encoded flipped")
  }

  test("feature extraction is deterministic and schema-complete") {
    val f1 = Multimodal.featureTable(spark, 30).collect()
    val f2 = Multimodal.featureTable(spark, 30).collect()
    assert(f1.length === 30)
    assert(f1.map(_.getAs[Long]("phash")).toSeq ===
      f2.map(_.getAs[Long]("phash")).toSeq)
    f1.foreach { r =>
      assert(r.getAs[Seq[Float]]("embedding").length === 16)
      val b = r.getAs[Double]("brightness")
      assert(b >= 0.0 && b <= 1.0)
    }
  }

  test("small batch size still covers every row (batch iteration shape)") {
    val media = Multimodal.fixture(spark, 100)
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 7)
    assert(feats.count() === 100)
    assert(feats.select("media_id").distinct().count() === 100)
  }

  test("resize updates metadata and keeps non-images untouched") {
    val media = Multimodal.fixture(spark, 30)
    val resized = Multimodal.resizeImages(spark, media, 32, 32).collect()
    resized.filter(_.kind == "image").foreach { m =>
      assert(m.width === 32 && m.height === 32)
      assert(m.content.nonEmpty)
    }
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.filter(_.kind != "image").foreach { m =>
      assert(m.content.toSeq === orig(m.media_id).content.toSeq)
    }
  }

  test("resize is a REAL nearest-neighbor re-encode, not a byte trim") {
    // identity resize must reproduce the source payload exactly
    val src = Multimodal.fixture(spark, 1).collect()(0).content
    assert(Multimodal.resizeBmp(src, 16, 8).toSeq === src.toSeq)
    // 16×8 → 8×4: output is a valid BMP of the new geometry, and the
    // first stored pixel (bottom row, x=0) samples source stored row 0,
    // i.e. logical y=7: value = imagePixel(0, 0, 7) in all 3 channels
    val down = Multimodal.resizeBmp(src, 8, 4)
    val bb = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(18) === 8 && bb.getInt(22) === 4)
    assert(down.length === 54 + 24 * 4) // 8*3=24-byte rows, already aligned
    val expected = ((0 * 31 + 0 * 7 + 7 * 13) % 251).toByte
    assert(down(54) === expected && down(55) === expected && down(56) === expected)
    // downscaled brightness equals the analytic mean over sampled pixels
    val expBright = (for (r <- 0 until 4; x <- 0 until 8)
      yield (2 * x * 7 + (7 - 2 * r) * 13) % 251).sum.toDouble / 255.0 / 32
    val (gotBright, _) = Multimodal.decodeBmp(down)
    assert(math.abs(gotBright - expBright) < 1e-12)
  }

  test("frame sampling emits framesPerVideo rows per video") {
    val media = Multimodal.fixture(spark, 30)
    val nVideos = media.collect().count(_.kind == "video")
    val frames = Multimodal.sampleFrames(spark, media, framesPerVideo = 4)
    assert(frames.count() === nVideos * 4)
    val byVideo = frames.groupBy("media_id").count().collect()
    byVideo.foreach(r => assert(r.getLong(1) === 4))
  }

  test("binary column round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    Multimodal.fixture(spark, 10).write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    assert(back.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    assert(back.count() === 10)
  }

  test("dHash: planted one-pixel bump stays within 2 bits; banded join " +
    "≡ all-pairs at the ≤3 threshold (pigeonhole)") {
    import spark.implicits._
    val media = Multimodal.neardupFixture(spark, 120).collect()
    val hashes = media.flatMap(m => m.kind match {
      case "image" => Multimodal.dhashSafe(m.content).map(m.media_id -> _)
      case _ => None
    }).toMap
    // every planted copy within 2 bits of its source
    val planted = hashes.keys.filter(_ >= 100000L)
    assert(planted.nonEmpty)
    planted.foreach { dup =>
      val d = java.lang.Long.bitCount(hashes(dup) ^ hashes(dup - 100000L))
      assert(d <= 2, s"planted pair ($dup) drifted $d bits")
    }
    // banded-query ≡ all-pairs identity over the full media fixture
    val got = SparkEntry.queries("mm4_media_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = {
      val m2 = Multimodal.neardupFixture(spark, 500)
      val img = m2.filter(_.kind == "image").collect()
        .flatMap(m => Multimodal.dhashSafe(m.content).map(m.media_id -> _))
      val vid = Multimodal.sampleFrames(spark, m2, framesPerVideo = 1)
        .collect()
        .flatMap(fr => Multimodal.dhashFrameSafe(fr.frame).map(fr.media_id -> _))
      val hs = (img ++ vid).toSeq
      (for {
        (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (ia, ib, d)).toSet
    }
    assert(got == all,
      s"banded must equal all-pairs at <=3: got ${got.size}, all ${all.size}")
  }

  test("audio fingerprint: planted one-sample bump stays within 2 bits; " +
    "banded join ≡ all-pairs at the ≤3 threshold") {
    val media = Multimodal.audioNeardupFixture(spark, 500).collect()
    val hashes = media.flatMap(m => m.kind match {
      case "audio" => Multimodal.afpSafe(m.content).map(m.media_id -> _)
      case _ => None
    }).toMap
    val planted = hashes.keys.filter(_ >= 200000L)
    assert(planted.nonEmpty)
    planted.foreach { dup =>
      val d = java.lang.Long.bitCount(hashes(dup) ^ hashes(dup - 200000L))
      assert(d <= 2, s"planted pair ($dup) drifted $d bits")
    }
    val got = SparkEntry.queries("mm5_audio_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.toSeq
    val all = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == all,
      s"banded must equal all-pairs at <=3: got ${got.size}, all ${all.size}")
  }

  test("audio fingerprint degradation: corrupt, non-WAV, and sub-57-" +
    "sample blobs hash to None; gain shifts cancel") {
    // truncated WAV (data chunk promises more payload than exists)
    val aud = Multimodal.fixture(spark, 4).collect().find(_.kind == "audio").get
    assert(Multimodal.afpSafe(
      java.util.Arrays.copyOfRange(aud.content, 0, 50)).isEmpty)
    assert(Multimodal.afpSafe("not a wav".getBytes).isEmpty)
    // a valid WAV with 56 samples is too short for 57 windows
    val tiny = graft.multimodal.Multimodal.wavBytesOf(56, j => j * 10)
    assert(Multimodal.afpSafe(tiny).isEmpty)
    // 57 samples is the floor
    val floor = graft.multimodal.Multimodal.wavBytesOf(57, j => j * 10)
    assert(Multimodal.afpSafe(floor).nonEmpty)
    // the delta property: doubling every sample's amplitude preserves
    // the fingerprint ORDER structure on strictly-monotone windows
    val base = graft.multimodal.Multimodal.wavBytesOf(570, j => 100 + j)
    val gained = graft.multimodal.Multimodal.wavBytesOf(570, j => 2 * (100 + j))
    assert(Multimodal.afpSafe(base) == Multimodal.afpSafe(gained),
      "uniform gain must not change an energy-delta fingerprint")
  }

  test("corrupt media hashes to None — excluded from pairing, never a " +
    "crash or a fabricated stub-hash pair") {
    // truncated BMP (header promises more payload than exists)
    val img = Multimodal.fixture(spark, 3).collect().find(_.kind == "image").get
    val truncated = java.util.Arrays.copyOfRange(img.content, 0, 60)
    assert(Multimodal.dhashSafe(truncated).isEmpty)
    // non-image bytes
    assert(Multimodal.dhashSafe("not a bmp at all".getBytes).isEmpty)
    // corrupt-container frame fallback (byte slices, wrong geometry)
    assert(Multimodal.dhashFrameSafe(Array.fill[Byte](37)(1)).isEmpty)
    assert(Multimodal.dhashFrameSafe(Array.emptyByteArray).isEmpty)
    // a healthy frame geometry still hashes
    assert(Multimodal.dhashFrameSafe(Array.fill[Byte](16 * 8)(1)).nonEmpty)
  }

  test("scene cuts: in-scene frames diff exactly 0, boundaries flag, corrupt row silent") {
    val media = Multimodal.sceneFixture(spark, 120)
    val rows = Multimodal.sceneCuts(spark, media).collect()
    // the corrupt last video (id 119) must emit nothing
    assert(!rows.exists(_._1 == 119L), "corrupt container produced rows")
    // every video id 2,5,...,116 emits frames-1 rows
    val byId = rows.groupBy(_._1)
    assert(byId.keySet == (2L until 119L by 3L).toSet)
    byId.foreach { case (id, rs) =>
      assert(rs.length == 6 + (id % 4).toInt - 1, s"row count for $id")
    }
    rows.foreach { case (id, f, diff, cut) =>
      if (f % 3 == 0) { // scene boundary: every pixel shifts
        assert(diff > 0 && cut, s"missed cut at ($id, $f)")
      } else { // inside a scene: byte-identical frames
        assert(diff == 0L && !cut, s"false cut at ($id, $f)")
      }
    }
  }
}
