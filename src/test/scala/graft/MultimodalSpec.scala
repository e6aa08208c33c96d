package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing tests: the decode is a documented stub, but the
  * schema, batch shape, partitioning, and determinism are real. */
class MultimodalSpec extends SparkSuite {

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
