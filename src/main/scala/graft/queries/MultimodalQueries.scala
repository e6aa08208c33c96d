package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Driver-visible checks for the multimodal path. Image rows are REAL
  * 24-bit BMPs, audio rows REAL 16-bit PCM WAVs, and video rows REAL
  * MP4 (ISO-BMFF) containers with uncompressed-luma sample tables — all
  * decoded by the pure-JVM parsers in [[Multimodal]]/[[Mp4]]: header
  * fields read from the bytes, features from the actual
  * pixel/sample/frame payload located through each container's own
  * index structures. The fixture GENERATES those pixels/samples from
  * integer formulas of media_id, so the oracle recomputes the expected
  * features in ANSI SQL from `range()` without parsing any container
  * format: if a parser misread a header, the sample table, or the
  * payload, brightness/embedding/frame sums would diverge from the
  * formula and the hash compare would fail.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The mm4/mm5 banded Hamming join over a `(media_id, hash)` frame of
    * 56-bit perceptual hashes: 4 bands × 14 bits, candidates from the
    * (band, bits) equi-join, exact bit_count distance, pairs kept at
    * `hamming <= thresh`. For thresh ≤ 3 the banded candidate set
    * provably EQUALS all-pairs (≤3 flipped bits leave ≥1 of 4 bands
    * clean — pigeonhole), so the all-pairs DuckDB oracles carry no
    * recall caveat. At corpus scale this is the same never-all-pairs
    * shape as MinHashLSH: shuffle on the 14-bit band key, join within
    * buckets only. */
  private def hammingBandPairs(hashes: DataFrame, thresh: Int): DataFrame = {
    val banded = hashes.select(col("media_id"), col("hash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("hash"), b * 14)
          .bitwiseAND(lit(16383L)).as("bits"))): _*)).as("bd"))
      .select(col("media_id"), col("hash"),
        col("bd.band").as("band"), col("bd.bits").as("bits"))
    // packed long join key (operators.BandPack: 14-bit bits beside the
    // band id — bijective, and the long-specialized join probe is the
    // measured 20× r15 win)
    val pk = graft.operators.BandPack.exact(col("band"), col("bits"), 14)
    val a = banded.select(col("media_id").as("media_a"),
      col("hash").as("ha"), pk.as("bk"))
    val b = banded.select(col("media_id").as("media_b"),
      col("hash").as("hb"), pk.as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= thresh)
      .orderBy("media_a", "media_b")
  }

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

    // video frame sampling: 4 evenly-spaced REAL frames per video,
    // located via the MP4 sample table — byte count proves the stsz
    // geometry, the per-frame pixel sum proves the payload came from the
    // right stco offsets.
    "mm2_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.fixture(s, 500)
      Multimodal.sampleFrames(s, media, framesPerVideo = 4)
        .map(fr => (fr.media_id, fr.frame_idx, fr.frame.length,
          fr.frame.foldLeft(0L)((a, b) => a + (b & 0xff))))
        .toDF("media_id", "frame_idx", "frame_bytes", "frame_pixsum")
        .orderBy("media_id", "frame_idx")
    }),

    // MM4: perceptual near-dup over the media columns — the dedup
    // family extended to images/video. dHash-56 (integer 8×8 block
    // dHash) of every image's REAL BMP payload and every video's frame
    // 0 (located through the MP4 sample table), then a 4×14-bit Hamming
    // BAND join: a pair within distance ≤ 3 differs in ≤ 3 bit
    // positions, which can dirty at most 3 of the 4 bands (pigeonhole)
    // — the banded candidate set provably EQUALS all-pairs at this
    // threshold, so the all-pairs DuckDB oracle carries no recall
    // caveat. Corpus: the fixture + every 5th image re-encoded with a
    // one-pixel bump (≤ 2-bit perturbation) under id+100000. Audio has
    // no 2-D grid and is excluded; corrupt media hashes to None and is
    // excluded rather than crashing or fabricating stub-hash pairs
    // (MultimodalSpec pins the degradation).
    "mm4_media_neardup" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.neardupFixture(s, 500)
      val imgHashes = media.filter(_.kind == "image")
        .flatMap(m => Multimodal.dhashSafe(m.content)
          .map(h => (m.media_id, h)))
      val vidHashes = Multimodal.sampleFrames(s, media, framesPerVideo = 1)
        .flatMap(fr => Multimodal.dhashFrameSafe(fr.frame)
          .map(h => (fr.media_id, h)))
      hammingBandPairs(
        imgHashes.union(vidHashes).toDF("media_id", "hash"), thresh = 3)
    }),

    // MM5: the dedup family extended to AUDIO — perceptual near-dup over
    // the WAV rows via the 56-bit energy-delta fingerprint
    // (Multimodal.afpWav: 57 integer window energies over the REAL PCM
    // payload, bit k = E(k+1) > E(k)), then the same 4×14-bit Hamming
    // band join as mm4 (banded ≡ all-pairs at threshold ≤ 3 by
    // pigeonhole — no recall caveat on the oracle). Corpus: the fixture
    // + every 5th audio row re-encoded under id+200000 with one sample
    // bumped +50 (one window touched ⇒ ≤ 2 fingerprint bits differ).
    // Corrupt or sub-57-sample WAVs hash to None and are excluded
    // rather than crashing or fabricating pairs (MultimodalSpec pins
    // the degradation).
    // MM6: scene-change (shot-boundary) detection — the temporal-
    // structure member of the multimodal family (mm2 samples frames,
    // mm4 fingerprints them; this finds the CUTS between them). Sum of
    // absolute luma deltas between consecutive REAL MP4 frames, cut
    // flag = mean delta above one grey level; frames inside a scene of
    // the fixture are byte-identical (diff exactly 0), scene
    // boundaries light up every pixel. Pure per-video flatMap through
    // the Mp4 sample table — no shuffle, no state; the corrupt video
    // row emits nothing (degradation, MultimodalSpec-pinned). The
    // oracle replays the scene pixel formulas integer-exactly.
    "mm6_scene_cuts" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.sceneFixture(s, 120)
      Multimodal.sceneCuts(s, media)
        .toDF("media_id", "frame_idx", "diff_sum", "is_cut")
        .orderBy("media_id", "frame_idx")
    }),

    "mm5_audio_neardup" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal.audioNeardupFixture(s, 500)
      val hashes = media.filter(_.kind == "audio")
        .flatMap(m => Multimodal.afpSafe(m.content)
          .map(h => (m.media_id, h)))
        .toDF("media_id", "hash")
      hammingBandPairs(hashes, thresh = 3)
    }),

    // container-metadata extraction: every header field the MP4 parser
    // reads (track + sample-entry geometry, sample count, movie duration,
    // coded format) against the fixture formulas — gates the box-walk
    // itself, independent of payload decode.
    "mm3_video_metadata" -> ((s, d) => {
      import s.implicits._
      Multimodal.fixture(s, 500).filter(_.kind == "video")
        .map { m =>
          val mv = graft.multimodal.Mp4.parse(m.content)
          (m.media_id, mv.trackWidth, mv.trackHeight,
            mv.samples.sizes.length, mv.durationMs, mv.samples.format)
        }
        .toDF("media_id", "width", "height", "n_frames", "duration_ms",
          "sample_format")
        .orderBy("media_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // three branches, one per kind: image features recomputed from the
    // BMP pixel formula (16+(i%4)*8 × 8 grayscale, v=(i31+x7+y13)%251),
    // audio from the WAV sample formula (s=((i31+j7)%2003)-1001), video
    // from the MP4 luma-frame formula (v=(i31+g17+x7+y13)%251 over
    // f frames). n_bytes covers the real container sizes (54-byte BMP
    // header + 3wh; 44-byte WAV header + 2n; 592-byte MP4 scaffolding +
    // f·w·8).
    "mm1_media_features" ->
      """WITH img AS (
        |  SELECT i AS media_id, CAST(16 + (i % 4) * 8 AS INTEGER) AS w
        |  FROM range(500) t(i) WHERE i % 3 = 0),
        |imgpx AS (
        |  SELECT media_id, w, x, y, (media_id * 31 + x * 7 + y * 13) % 251 AS v
        |  FROM img,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b),
        |imgb AS (
        |  SELECT media_id, ANY_VALUE(w) AS w,
        |    ROUND(CAST(SUM(v) AS DOUBLE) / 255.0 / (ANY_VALUE(w) * 8), 6) AS brightness
        |  FROM imgpx GROUP BY media_id),
        |imge AS (
        |  SELECT media_id, string_agg(CAST(e AS VARCHAR), ',' ORDER BY k) AS emb_q
        |  FROM (SELECT media_id, CAST(x % 16 AS INTEGER) AS k,
        |          CAST(SUM(v) % 1000 AS INTEGER) AS e
        |        FROM imgpx GROUP BY media_id, x % 16) GROUP BY media_id),
        |imgf AS (
        |  SELECT imgb.media_id, 'image' AS kind,
        |    CAST(54 + 3 * w * 8 AS INTEGER) AS n_bytes, brightness, emb_q
        |  FROM imgb JOIN imge USING (media_id)),
        |aud AS (
        |  SELECT i AS media_id, CAST(400 + (i % 5) * 100 AS INTEGER) AS n
        |  FROM range(500) t(i) WHERE i % 3 = 1),
        |audsm AS (
        |  SELECT media_id, n, j, ABS((media_id * 31 + j * 7) % 2003 - 1001) AS s
        |  FROM aud, LATERAL (SELECT UNNEST(range(n)) AS j) u),
        |audb AS (
        |  SELECT media_id, ANY_VALUE(n) AS n,
        |    ROUND(CAST(SUM(s) AS DOUBLE) / ANY_VALUE(n) / 32768.0, 6) AS brightness
        |  FROM audsm GROUP BY media_id),
        |aude AS (
        |  SELECT media_id, string_agg(CAST(e AS VARCHAR), ',' ORDER BY k) AS emb_q
        |  FROM (SELECT media_id, CAST(j % 16 AS INTEGER) AS k,
        |          CAST(SUM(s) % 1000 AS INTEGER) AS e
        |        FROM audsm GROUP BY media_id, j % 16) GROUP BY media_id),
        |audf AS (
        |  SELECT audb.media_id, 'audio' AS kind,
        |    CAST(44 + 2 * n AS INTEGER) AS n_bytes, brightness, emb_q
        |  FROM audb JOIN aude USING (media_id)),
        |vid AS (
        |  SELECT i AS media_id, CAST(2 + (i % 3) AS INTEGER) AS f,
        |         CAST(16 + (i % 2) * 8 AS INTEGER) AS w
        |  FROM range(500) t(i) WHERE i % 3 = 2),
        |vidpx AS (
        |  SELECT media_id, f, w, x,
        |    (media_id * 31 + g * 17 + x * 7 + y * 13) % 251 AS v
        |  FROM vid,
        |    LATERAL (SELECT UNNEST(range(f)) AS g) gg,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b),
        |vidb AS (
        |  SELECT media_id, ANY_VALUE(f) AS f, ANY_VALUE(w) AS w,
        |    ROUND(CAST(SUM(v) AS DOUBLE) / 255.0
        |          / (ANY_VALUE(f) * ANY_VALUE(w) * 8), 6) AS brightness
        |  FROM vidpx GROUP BY media_id),
        |vide AS (
        |  SELECT media_id, string_agg(CAST(e AS VARCHAR), ',' ORDER BY k) AS emb_q
        |  FROM (SELECT media_id, CAST(x % 16 AS INTEGER) AS k,
        |          CAST(SUM(v) % 1000 AS INTEGER) AS e
        |        FROM vidpx GROUP BY media_id, x % 16) GROUP BY media_id),
        |-- n_bytes: 24-byte ftyp + 8-byte mdat header + f·w·8 luma payload
        |-- + the 560-byte constant moov tree (Mp4.MoovSize, asserted by a
        |-- require in Mp4.build and by MultimodalSpec)
        |vidf AS (
        |  SELECT vidb.media_id, 'video' AS kind,
        |    CAST(592 + f * w * 8 AS INTEGER) AS n_bytes, brightness, emb_q
        |  FROM vidb JOIN vide USING (media_id))
        |SELECT * FROM imgf
        |UNION ALL SELECT * FROM audf
        |UNION ALL SELECT * FROM vidf
        |ORDER BY media_id""".stripMargin,
    "mm2_frame_sample" ->
      """WITH m AS (
        |  SELECT i AS media_id, CAST(2 + (i % 3) AS INTEGER) AS f,
        |         CAST(16 + (i % 2) * 8 AS INTEGER) AS w
        |  FROM range(500) t(i) WHERE i % 3 = 2),
        |fr AS (
        |  SELECT media_id, CAST(k AS INTEGER) AS frame_idx, w,
        |    CAST((k * f) // 4 AS INTEGER) AS src
        |  FROM m, LATERAL (SELECT UNNEST(range(4)) AS k) u),
        |px AS (
        |  SELECT media_id, frame_idx, w,
        |    SUM((media_id * 31 + src * 17 + x * 7 + y * 13) % 251) AS pixsum
        |  FROM fr,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b
        |  GROUP BY media_id, frame_idx, w)
        |SELECT media_id, frame_idx, CAST(w * 8 AS INTEGER) AS frame_bytes,
        |  CAST(pixsum AS BIGINT) AS frame_pixsum
        |FROM px
        |ORDER BY media_id, frame_idx""".stripMargin,
    // mm4: the dHash recomputed from the fixture pixel FORMULAS (base
    // images, bumped copies, video frame 0), bits as a (media, bit_idx,
    // bit) table, Hamming by an all-pairs bit join — integer-exact end
    // to end, and all-pairs ≡ the query's banded join at threshold ≤ 3
    // by pigeonhole (≤3 flipped bits leave ≥1 of 4 bands clean).
    "mm4_media_neardup" ->
      """WITH imgs AS (
        |  SELECT i AS media_id, i AS src,
        |    CAST(16 + (i % 4) * 8 AS INTEGER) AS w, 0 AS bumped
        |  FROM range(500) t(i) WHERE i % 3 = 0
        |  UNION ALL
        |  SELECT i + 100000, i, CAST(16 + (i % 4) * 8 AS INTEGER), 1
        |  FROM range(500) t(i) WHERE i % 3 = 0 AND i % 5 = 0),
        |vids AS (
        |  SELECT i AS media_id, CAST(16 + (i % 2) * 8 AS INTEGER) AS w
        |  FROM range(500) t(i) WHERE i % 3 = 2),
        |px AS (
        |  SELECT media_id, w, x, y,
        |    CASE WHEN bumped = 1 AND x = 3 AND y = 2
        |         THEN ((src * 31 + x * 7 + y * 13) % 251 + 7) % 251
        |         ELSE (src * 31 + x * 7 + y * 13) % 251 END AS v
        |  FROM imgs,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b
        |  UNION ALL
        |  SELECT media_id, w, x, y,
        |    (media_id * 31 + x * 7 + y * 13) % 251 AS v
        |  FROM vids,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b),
        |grid AS (
        |  SELECT media_id, CAST(x // (w // 8) AS INTEGER) AS gx, y,
        |    CAST(SUM(v) AS BIGINT) AS gs
        |  FROM px GROUP BY media_id, x // (w // 8), y),
        |bits AS (
        |  SELECT a.media_id, CAST(a.y * 7 + a.gx AS INTEGER) AS bit_idx,
        |    CASE WHEN b.gs > a.gs THEN 1 ELSE 0 END AS bit
        |  FROM grid a JOIN grid b
        |    ON a.media_id = b.media_id AND a.y = b.y AND b.gx = a.gx + 1
        |  WHERE a.gx < 7),
        |pairs AS (
        |  SELECT a.media_id AS media_a, b.media_id AS media_b,
        |    CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
        |      AS INTEGER) AS hamming
        |  FROM bits a JOIN bits b
        |    ON a.bit_idx = b.bit_idx AND a.media_id < b.media_id
        |  GROUP BY 1, 2)
        |SELECT media_a, media_b, hamming FROM pairs
        |WHERE hamming <= 3
        |ORDER BY media_a, media_b""".stripMargin,
    // mm6: scene pixels replayed integer-exactly — per consecutive
    // frame pair, SUM |pix(f/3) − pix((f−1)/3)| over the frame grid;
    // the corrupt last video id never generates rows (degradation)
    "mm6_scene_cuts" ->
      """WITH v AS (
        |  SELECT i AS id, CAST(16 + (i % 2) * 8 AS INTEGER) AS w,
        |         CAST(6 + (i % 4) AS INTEGER) AS frames
        |  FROM range(120) t(i) WHERE i % 3 = 2 AND i <> 119),
        |fr AS (
        |  SELECT id, w, CAST(UNNEST(range(1, frames)) AS INTEGER) AS f
        |  FROM v),
        |px AS (
        |  SELECT id, f, w,
        |    SUM(ABS((id*31 + (f // 3)*17 + x*7 + y*13) % 251
        |          - (id*31 + ((f - 1) // 3)*17 + x*7 + y*13) % 251)) AS diff
        |  FROM fr,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) a,
        |    LATERAL (SELECT UNNEST(range(8)) AS y) b
        |  GROUP BY id, f, w)
        |SELECT id AS media_id, f AS frame_idx, CAST(diff AS BIGINT) AS diff_sum,
        |  diff > w * 8 AS is_cut
        |FROM px ORDER BY media_id, frame_idx""".stripMargin,
    // mm5: the audio fingerprint recomputed from the fixture SAMPLE
    // formula (s=((i·31+j·7)%2003)−1001, bumped copies +50 at j=10),
    // window energies by integer binning ⌊j·57/n⌋, bits as a
    // (media, bit_idx, bit) table, Hamming by an all-pairs bit join —
    // integer-exact end to end, all-pairs ≡ the query's banded join at
    // threshold ≤ 3 by pigeonhole.
    "mm5_audio_neardup" ->
      """WITH aud AS (
        |  SELECT i AS media_id, i AS src,
        |    CAST(400 + (i % 5) * 100 AS INTEGER) AS n, 0 AS bumped
        |  FROM range(500) t(i) WHERE i % 3 = 1
        |  UNION ALL
        |  SELECT i + 200000, i, CAST(400 + (i % 5) * 100 AS INTEGER), 1
        |  FROM range(500) t(i) WHERE i % 3 = 1 AND i % 5 = 0),
        |sm AS (
        |  SELECT media_id, n, j,
        |    CASE WHEN bumped = 1 AND j = 10
        |         THEN ABS((src * 31 + j * 7) % 2003 - 1001 + 50)
        |         ELSE ABS((src * 31 + j * 7) % 2003 - 1001) END AS s
        |  FROM aud, LATERAL (SELECT UNNEST(range(n)) AS j) u),
        |win AS (
        |  SELECT media_id, CAST((j * 57) // n AS INTEGER) AS k,
        |    CAST(SUM(s) AS BIGINT) AS e
        |  FROM sm GROUP BY media_id, (j * 57) // n),
        |bits AS (
        |  SELECT a.media_id, CAST(a.k AS INTEGER) AS bit_idx,
        |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        |  FROM win a JOIN win b
        |    ON a.media_id = b.media_id AND b.k = a.k + 1
        |  WHERE a.k < 56),
        |pairs AS (
        |  SELECT a.media_id AS media_a, b.media_id AS media_b,
        |    CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
        |      AS INTEGER) AS hamming
        |  FROM bits a JOIN bits b
        |    ON a.bit_idx = b.bit_idx AND a.media_id < b.media_id
        |  GROUP BY 1, 2)
        |SELECT media_a, media_b, hamming FROM pairs
        |WHERE hamming <= 3
        |ORDER BY media_a, media_b""".stripMargin,
    "mm3_video_metadata" ->
      """SELECT i AS media_id,
        |  CAST(16 + (i % 2) * 8 AS INTEGER) AS width,
        |  CAST(8 AS INTEGER) AS height,
        |  CAST(2 + (i % 3) AS INTEGER) AS n_frames,
        |  CAST((2 + (i % 3)) * 100 AS BIGINT) AS duration_ms,
        |  'raw ' AS sample_format
        |FROM range(500) t(i) WHERE i % 3 = 2
        |ORDER BY media_id""".stripMargin
  )
}
