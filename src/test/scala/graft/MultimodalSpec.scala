package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal tests: BMP/WAV decode is REAL (pure-JVM header+payload
  * parsers) and pinned against analytically-computed feature values;
  * video decode remains a documented stub. Schema, batch shape,
  * partitioning, and determinism are exercised throughout. */
class MultimodalSpec extends SparkSuite {

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
}
