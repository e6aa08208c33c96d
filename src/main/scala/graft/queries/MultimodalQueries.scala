package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Driver-visible checks for the multimodal plumbing: the fixture bytes
  * and the stub decode are pure integer functions of media_id, so the
  * whole mapPartitions batch path (binary column → per-batch decode →
  * typed features) is reproducible in ANSI SQL from `range()` — the
  * oracle recomputes byte statistics without ever materializing bytes.
  * (A real deployment swaps decodeStub for a codec; the plumbing under
  * test — schema, encoder, batch iteration, partitioning — is identical.)
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // binary → batch decode → features: brightness (mean byte / 255),
    // byte count, and the 16-bucket byte-sum embedding quantized back to
    // exact ints.
    "mm1_media_features" -> ((s, d) => {
      val media = Multimodal.fixture(s, 500).repartition(col("media_id"))
      Multimodal.extractFeatures(s, media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("brightness"), 6).as("brightness"),
          concat_ws(",",
            expr("transform(embedding, x -> CAST(round(x * 1000) AS INT))"))
            .as("emb_q"))
        .orderBy("media_id")
    }),

    // video frame sampling: the explode/generator shape — 4 deterministic
    // slices per video with slice byte counts.
    "mm2_frame_sample" -> ((s, d) => {
      val media = Multimodal.fixture(s, 500)
      Multimodal.sampleFrames(s, media, framesPerVideo = 4).toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"))
        .orderBy("media_id", "frame_idx")
    })
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_features" ->
      """WITH m AS (
        |  SELECT i AS media_id,
        |    CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(256 + (i % 7) * 64 AS INTEGER) AS len
        |  FROM range(500) t(i)),
        |b AS (
        |  SELECT m.media_id, m.kind, m.len, j,
        |    (m.media_id * 31 + j * 7) % 251 AS v
        |  FROM m, LATERAL (SELECT UNNEST(range(m.len)) AS j) u),
        |bright AS (
        |  SELECT media_id, ANY_VALUE(kind) AS kind, ANY_VALUE(len) AS len,
        |    ROUND(CAST(SUM(v) AS DOUBLE) / ANY_VALUE(len) / 255.0, 6) AS brightness
        |  FROM b GROUP BY media_id),
        |emb AS (
        |  SELECT media_id, CAST(j % 16 AS INTEGER) AS k,
        |    CAST(SUM(v) % 1000 AS INTEGER) AS e
        |  FROM b GROUP BY media_id, j % 16),
        |embs AS (
        |  SELECT media_id,
        |    string_agg(CAST(e AS VARCHAR), ',' ORDER BY k) AS emb_q
        |  FROM emb GROUP BY media_id)
        |SELECT bright.media_id, kind, len AS n_bytes, brightness, emb_q
        |FROM bright JOIN embs USING (media_id)
        |ORDER BY media_id""".stripMargin,
    "mm2_frame_sample" ->
      """WITH m AS (
        |  SELECT i AS media_id, CAST(256 + (i % 7) * 64 AS INTEGER) AS len
        |  FROM range(500) t(i) WHERE i % 3 = 2),
        |f AS (
        |  SELECT media_id, CAST(k AS INTEGER) AS frame_idx, len,
        |    GREATEST(1, len // 4) AS step
        |  FROM m, LATERAL (SELECT UNNEST(range(4)) AS k) u)
        |SELECT media_id, frame_idx,
        |  CAST(LEAST(LEAST(k_from + step, len) - k_from, step) AS INTEGER) AS frame_bytes
        |FROM (SELECT media_id, frame_idx, len, step,
        |        LEAST(frame_idx * step, GREATEST(len - 1, 0)) AS k_from
        |      FROM f) t
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
