package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY columns with typed metadata, processed by batch-shaped
  * partition functions.
  *
  * Decoding is REAL for all three fixture kinds: IMAGE (24-bit
  * uncompressed BMP) and AUDIO (16-bit PCM WAV) by pure-JVM parsers in
  * this file, VIDEO (MP4/ISO-BMFF carrying uncompressed 8-bpp luma
  * frames) by the box-walking parser in [[Mp4]] — header fields read
  * from the actual bytes, features computed from the actual
  * pixel/sample payload located through the real sample table
  * (stsc × stsz × stco). No codec jar is needed for any of them, which
  * is why they can be real in a codec-less container. `decodeStub`
  * remains only as the documented fallback for byte streams in a format
  * none of the parsers recognize; no fixture row reaches it. Everything
  * around decode — the schema, the Dataset[MediaRow] encoder, the batch
  * iteration shape (decode `batchSize` blobs at a time, like a
  * vectorized/Arrow UDF would), the per-media_id partitioning, the
  * frame-explode — is real Spark and tested.
  *
  * Scale posture: binary stays opaque end-to-end (no driver collect, no
  * base64 round-trips); feature extraction is mapPartitions (one JVM call
  * per partition, amortized setup per batch exactly where a codec handle
  * would be reused); repartition by media_id spreads decode cost evenly.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                            format: String, width: Int, height: Int,
                            sample_rate: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, kind: String, phash: Long,
                                 brightness: Double, n_bytes: Int,
                                 embedding: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Image fixture geometry: width 16/24/32/40 px (all multiples of 4,
    * so 24-bit rows need no padding), 8 rows; grayscale pixel value at
    * (x, y) is (id·31 + x·7 + y·13) mod 251 — a formula an oracle can
    * recompute without parsing BMP. */
  private[multimodal] def imageWidth(id: Long): Int = 16 + (id % 4).toInt * 8
  private[multimodal] val ImageHeight = 8
  private[multimodal] def imagePixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 251).toInt

  /** Audio fixture: 16-bit mono PCM at 16 kHz; sample j is
    * ((id·31 + j·7) mod 2003) − 1001, i.e. deterministic values spanning
    * ±1001 — again recomputable without parsing WAV. */
  private[multimodal] def audioSamples(id: Long): Int = 400 + (id % 5).toInt * 100
  private[multimodal] def audioSample(id: Long, j: Int): Int =
    ((id * 31 + j * 7) % 2003).toInt - 1001

  /** Video fixture geometry: 2–4 frames of 16- or 24-px-wide 8-row
    * 8-bpp luma, pixel (f, x, y) = (id·31 + f·17 + x·7 + y·13) mod 251 —
    * like the image/audio formulas, recomputable by an oracle without
    * parsing the MP4 container. 10 fps ⇒ duration = frames·100 ms. */
  private[multimodal] def videoFrames(id: Long): Int = 2 + (id % 3).toInt
  private[multimodal] def videoWidth(id: Long): Int = 16 + (id % 2).toInt * 8
  private[multimodal] def videoPixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 251).toInt

  /** A real, valid 24-bit uncompressed BMP: 54-byte header + bottom-up
    * BGR rows, every channel set to the grayscale [[imagePixel]]. */
  private[multimodal] def bmpBytes(id: Long): Array[Byte] =
    bmpBytesOf(imageWidth(id), imagePixel(id, _, _))

  /** [[bmpBytes]] with an arbitrary pixel function — the seam the
    * planted-near-dup fixture uses to re-encode a bumped copy. */
  private[multimodal] def bmpBytesOf(w: Int, px: (Int, Int) => Int): Array[Byte] = {
    val h = ImageHeight
    val data = w * h * 3 // widths are multiples of 4: no row padding
    val bb = java.nio.ByteBuffer.allocate(54 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + data)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    bb.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(data) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1 // bottom-up row order, as BMP stores them
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = px(x, y).toByte
        bb.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      y -= 1
    }
    bb.array()
  }

  /** A real, valid RIFF/WAVE file: canonical 44-byte header + 16-bit LE
    * mono PCM [[audioSample]]s. */
  private[multimodal] def wavBytes(id: Long, rate: Int = 16000): Array[Byte] =
    wavBytesOf(audioSamples(id), audioSample(id, _), rate)

  /** [[wavBytes]] with an arbitrary sample function — the seam the
    * planted audio-near-dup fixture uses to re-encode a bumped copy
    * (mirrors [[bmpBytesOf]]). */
  private[graft] def wavBytesOf(n: Int, sample: Int => Int,
                                rate: Int = 16000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var j = 0
    while (j < n) { bb.putShort(sample(j).toShort); j += 1 }
    bb.array()
  }

  /** Deterministic synthetic media table (seeded by media_id): REAL BMP
    * bytes for images, REAL WAV bytes for audio, REAL MP4 (ISO-BMFF
    * with an uncompressed-luma sample table) for video — every row's
    * metadata matches what its own container header declares. */
  def fixture(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      (id % 3) match {
        case 0 =>
          MediaRow(id, "image", bmpBytes(id), format = "bmp",
            width = imageWidth(id), height = ImageHeight,
            sample_rate = 0, duration_ms = 0)
        case 1 =>
          MediaRow(id, "audio", wavBytes(id), format = "wav",
            width = 0, height = 0, sample_rate = 16000,
            duration_ms = audioSamples(id) * 1000L / 16000)
        case _ =>
          val w = videoWidth(id)
          val frames = videoFrames(id)
          val bytes = Mp4.build(w, ImageHeight, frames,
            (f, x, y) => videoPixel(id, f, x, y))
          MediaRow(id, "video", bytes, format = "mp4",
            width = w, height = ImageHeight, sample_rate = 0,
            duration_ms = frames * 100L)
      }
    }
  }

  /** [[fixture]] plus PLANTED perceptual near-duplicates for the mm4
    * gate: every image id divisible by 5 is RE-ENCODED under
    * id + 100000 with its (3,2) pixel bumped +7 (mod 251) — one pixel
    * in one 8×8 grid cell, so the copy's [[dhashBmp]] differs from its
    * source's in at most 2 bits (only the two horizontal differences
    * that cell participates in can flip). */
  def neardupFixture(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val dups = spark.range(n).as[Long]
      .filter(i => i % 3 == 0 && i % 5 == 0)
      .map { id =>
        MediaRow(id + 100000L, "image",
          bmpBytesOf(imageWidth(id), (x, y) =>
            if (x == 3 && y == 2) (imagePixel(id, x, y) + 7) % 251
            else imagePixel(id, x, y)),
          format = "bmp", width = imageWidth(id), height = ImageHeight,
          sample_rate = 0, duration_ms = 0)
      }
    fixture(spark, n).unionByName(dups)
  }

  /** [[fixture]] plus PLANTED audio near-duplicates for the mm5 gate:
    * every audio id divisible by 5 is RE-ENCODED under id + 200000 with
    * sample 10 bumped +50 — one sample in one of the 57 energy windows,
    * so the copy's [[afpWav]] differs from its source's in at most 2
    * bits (only the two energy deltas that window participates in can
    * flip). */
  def audioNeardupFixture(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val dups = spark.range(n).as[Long]
      .filter(i => i % 3 == 1 && i % 5 == 0)
      .map { id =>
        MediaRow(id + 200000L, "audio",
          wavBytesOf(audioSamples(id), j =>
            if (j == 10) audioSample(id, j) + 50 else audioSample(id, j)),
          format = "wav", width = 0, height = 0, sample_rate = 16000,
          duration_ms = audioSamples(id) * 1000L / 16000)
      }
    fixture(spark, n).unionByName(dups)
  }

  // -------------------------------------------------- perceptual hash

  /** 56-bit difference hash (dHash) of a grayscale w×8 grid, w a
    * multiple of 8: equal integer block-sums onto an 8×8 grid (no float
    * resample — the hash is integer-exact end-to-end, which is what
    * lets the mm4 DuckDB oracle recompute it from the fixture pixel
    * formulas), bit y·7+x (LSB first) = 1 iff g(x+1,y) > g(x,y).
    * Differences cancel uniform brightness shifts — the classic dHash
    * robustness property. */
  private[graft] def dhashGray(px: (Int, Int) => Int, w: Int, h: Int): Long = {
    require(w > 0 && w % 8 == 0 && h == ImageHeight,
      s"dhash expects (8k)x8 grids, got ${w}x$h")
    val bw = w / 8
    val g = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { g(x / bw)(y) += px(x, y); x += 1 }
      y += 1
    }
    var hash = 0L
    var i = 0
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 7) {
        if (g(xx + 1)(yy) > g(xx)(yy)) hash |= 1L << i
        i += 1; xx += 1
      }
      yy += 1
    }
    hash
  }

  /** dHash from REAL BMP bytes — dimensions and row order read from the
    * header (negative height = top-down storage), one channel of the
    * BGR payload. Throws on malformed bytes; callers that must degrade
    * use [[dhashSafe]]. */
  private[graft] def dhashBmp(c: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(c)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = bb.getInt(10)
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    val h = math.abs(rawH)
    require(bb.getShort(28) == 24, "only 24-bit BMP supported")
    val rowSize = (w * 3 + 3) / 4 * 4
    dhashGray((x, y) => {
      val row = if (rawH > 0) h - 1 - y else y
      c(off + row * rowSize + x * 3) & 0xff
    }, w, h)
  }

  /** The [[decode]] degradation contract applied to hashing: a corrupt
    * or non-image blob hashes to None and is EXCLUDED from near-dup
    * pairing — a damaged file must neither crash the pass nor fabricate
    * pairs from a stub hash. */
  private[graft] def dhashSafe(c: Array[Byte]): Option[Long] =
    try { if (isBmp(c)) Some(dhashBmp(c)) else None }
    catch {
      case _: RuntimeException | _: IndexOutOfBoundsException => None
    }

  /** dHash of a raw row-major 8-bpp luma frame (the [[Mp4.sampleBytes]]
    * payload shape, w = len/8); None for frames whose geometry is not
    * the (8k)×8 grid — e.g. the byte-slice fallback of a corrupt
    * container. */
  private[graft] def dhashFrameSafe(frame: Array[Byte]): Option[Long] = {
    val w = frame.length / ImageHeight
    if (frame.length == 0 || frame.length % ImageHeight != 0 || w % 8 != 0)
      None
    else
      try Some(dhashGray((x, y) => frame(y * w + x) & 0xff, w, ImageHeight))
      catch {
        case _: RuntimeException | _: IndexOutOfBoundsException => None
      }
  }

  /** 56-bit audio fingerprint (the dHash analogue for PCM): the 16-bit
    * samples are binned into 57 equal time windows (window of sample j
    * = ⌊j·57/n⌋ — every window non-empty for n ≥ 57), each window's
    * energy is the INTEGER sum of absolute sample values, and bit k
    * (LSB first) = 1 iff E(k+1) > E(k). Energy DELTAS cancel uniform
    * gain changes exactly as dHash's pixel deltas cancel brightness
    * shifts, and the hash is integer-exact end-to-end so the mm5
    * DuckDB oracle recomputes it from the fixture sample formula.
    * Chunk layout (fmt/data discovery) mirrors [[decodeWav]]'s RIFF
    * walk — no fixed-offset assumptions beyond the preamble. */
  private[graft] def afpWav(c: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(c)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var dataPos = -1
    var dataLen = 0
    var bits = 16
    while (pos + 8 <= c.length && (dataPos < 0 || bits == 0)) {
      val tag = new String(c, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (tag == "fmt ") bits = bb.getShort(pos + 22)
      else if (tag == "data") { dataPos = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1)
    }
    require(dataPos >= 0, "WAV without a data chunk")
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    val n = dataLen / 2
    require(n >= 57, s"audio fingerprint needs >= 57 samples, got $n")
    val e = new Array[Long](57)
    var j = 0
    while (j < n) {
      e((j.toLong * 57 / n).toInt) +=
        math.abs(bb.getShort(dataPos + 2 * j).toInt)
      j += 1
    }
    var hash = 0L
    var k = 0
    while (k < 56) {
      if (e(k + 1) > e(k)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** The decode degradation contract applied to audio fingerprinting: a
    * corrupt, non-WAV, or too-short (< 57 samples) blob hashes to None
    * and is EXCLUDED from near-dup pairing — same contract as
    * [[dhashSafe]]. */
  private[graft] def afpSafe(c: Array[Byte]): Option[Long] =
    try { if (isWav(c)) Some(afpWav(c)) else None }
    catch {
      case _: RuntimeException | _: IndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------ decode

  private def isBmp(c: Array[Byte]): Boolean =
    c.length > 54 && c(0) == 'B'.toByte && c(1) == 'M'.toByte

  private def isWav(c: Array[Byte]): Boolean =
    c.length > 44 &&
      c(0) == 'R'.toByte && c(1) == 'I'.toByte && c(2) == 'F'.toByte &&
      c(3) == 'F'.toByte && c(8) == 'W'.toByte && c(9) == 'A'.toByte &&
      c(10) == 'V'.toByte && c(11) == 'E'.toByte

  /** REAL BMP decode: pixel-data offset, dimensions and bpp read from
    * the header; luminance aggregated from the actual BGR payload.
    * brightness = mean channel value / 255; embedding bucket k holds
    * the luminance sum of pixel columns with x ≡ k (mod 16), mod 1000 —
    * orientation-free aggregates, so bottom-up row storage needs no
    * flip. */
  private[graft] def decodeBmp(c: Array[Byte]): (Double, Array[Float]) = {
    val bb = java.nio.ByteBuffer.wrap(c)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = bb.getInt(10)
    val w = bb.getInt(18)
    val h = math.abs(bb.getInt(22)) // negative height = top-down storage
    val bpp = bb.getShort(28)
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    val rowSize = (w * 3 + 3) / 4 * 4
    var chanSum = 0L
    val buckets = new Array[Long](16)
    var r = 0
    while (r < h) {
      var x = 0
      while (x < w) {
        val p = off + r * rowSize + x * 3
        val lum3 = (c(p) & 0xff) + (c(p + 1) & 0xff) + (c(p + 2) & 0xff)
        chanSum += lum3
        buckets(x % 16) += lum3 / 3
        x += 1
      }
      r += 1
    }
    val px = w.toLong * h
    val brightness = if (px == 0) 0.0 else chanSum / 3.0 / 255.0 / px
    (brightness, buckets.map(b => (b % 1000).toFloat / 1000.0f))
  }

  /** REAL WAV decode: walks the RIFF chunk list to the fmt and data
    * chunks (no fixed-offset assumptions beyond the RIFF/WAVE preamble),
    * then aggregates the actual 16-bit samples. brightness = mean
    * absolute amplitude / 32768 (the loudness analogue of image
    * brightness); embedding bucket k holds the |sample| sum of samples
    * with index ≡ k (mod 16), mod 1000. */
  private[graft] def decodeWav(c: Array[Byte]): (Double, Array[Float]) = {
    val bb = java.nio.ByteBuffer.wrap(c)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12 // past RIFF size WAVE
    var dataPos = -1
    var dataLen = 0
    var bits = 16
    while (pos + 8 <= c.length && (dataPos < 0 || bits == 0)) {
      val tag = new String(c, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (tag == "fmt ") bits = bb.getShort(pos + 22)
      else if (tag == "data") { dataPos = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(dataPos >= 0, "WAV without a data chunk")
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    val n = dataLen / 2
    var absSum = 0L
    val buckets = new Array[Long](16)
    var j = 0
    while (j < n) {
      val s = math.abs(bb.getShort(dataPos + 2 * j).toInt).toLong
      absSum += s
      buckets(j % 16) += s
      j += 1
    }
    val brightness = if (n == 0) 0.0 else absSum.toDouble / n / 32768.0
    (brightness, buckets.map(b => (b % 1000).toFloat / 1000.0f))
  }

  /** Decode dispatch: real parsers for every fixture format (BMP, WAV,
    * MP4); the stub for unrecognized byte streams AND for rows whose
    * container is recognized but corrupt (truncated payload, malformed
    * header/sample table). At corpus scale some fraction of media is
    * always damaged — a bad row must degrade to pseudo-features, not
    * fail its whole task. */
  private[graft] def decode(content: Array[Byte]): (Double, Array[Float]) =
    try {
      if (isBmp(content)) decodeBmp(content)
      else if (isWav(content)) decodeWav(content)
      else if (Mp4.isMp4(content)) Mp4.features(content)
      else decodeStub(content)
    } catch {
      case _: RuntimeException | _: IndexOutOfBoundsException =>
        decodeStub(content)
    }

  /** STUB decode, now only a fallback for formats none of the real
    * parsers recognize (no fixture row reaches it): deterministic pseudo
    * statistics from the raw bytes so an unknown-format row degrades
    * instead of failing the batch. */
  private[multimodal] def decodeStub(content: Array[Byte]): (Double, Array[Float]) = {
    val brightness =
      if (content.isEmpty) 0.0
      else content.map(b => (b & 0xff).toDouble).sum / content.length / 255.0
    val emb = Array.tabulate(16) { k =>
      var acc = 0L
      var j = k
      while (j < content.length) { acc += (content(j) & 0xff); j += 16 }
      (acc % 1000).toFloat / 1000.0f
    }
    (brightness, emb)
  }

  /** Batch-shaped feature extraction: decodes `batchSize` blobs per inner
    * batch within each partition (the Arrow/pandas-batch analog). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup is where a real codec/session handle would live
        batch.iterator.map { m =>
          val (brightness, emb) = decode(m.content)
          val phash = m.content.foldLeft(1125899906842597L)((h, b) =>
            31 * h + (b & 0xff))
          MediaFeatures(m.media_id, m.kind, phash, brightness,
            m.content.length, emb)
        }
      }
    }
  }

  /** REAL nearest-neighbor BMP resize: decodes the 24-bit source through
    * its header, maps each target pixel to floor(x·w/w2, y·h/h2) in the
    * source payload, and re-encodes a valid BMP of the new geometry.
    * Non-BMP rows pass through untouched (resize of a coded video frame
    * would need the codec). */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
                   w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image" || !isBmp(m.content)) m
      else
        // same degradation contract as decode(): a truncated payload or
        // a header that lies about geometry passes the row through
        // unchanged instead of failing the whole task
        try m.copy(content = resizeBmp(m.content, w, h), width = w, height = h)
        catch {
          case _: RuntimeException | _: IndexOutOfBoundsException => m
        }
    }
  }

  private[graft] def resizeBmp(c: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val src = java.nio.ByteBuffer.wrap(c)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = src.getInt(10)
    val w = src.getInt(18)
    val hRaw = src.getInt(22)
    val topDown = hRaw < 0 // negative biHeight = rows stored top-down
    val h = math.abs(hRaw)
    require(src.getShort(28) == 24, "resize supports 24-bit BMP")
    require(w > 0 && h > 0, s"BMP geometry ${w}x$hRaw invalid")
    val srcRow = (w * 3 + 3) / 4 * 4
    // header must not lie: the declared payload has to fit the file
    require(off >= 54 && off.toLong + srcRow.toLong * h <= c.length,
      s"BMP payload (off=$off row=$srcRow h=$h) overruns ${c.length} bytes")
    val dstRow = (w2 * 3 + 3) / 4 * 4
    val out = java.nio.ByteBuffer.allocate(54 + dstRow * h2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dstRow * h2)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(w2).putInt(h2).putShort(1).putShort(24)
      .putInt(0).putInt(dstRow * h2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0 // output row index in stored (bottom-up) order
    while (r < h2) {
      val sr = r * h / h2 // source row, counted from the bottom
      val srStored = if (topDown) h - 1 - sr else sr
      var x = 0
      while (x < w2) {
        val sx = x * w / w2
        val p = off + srStored * srcRow + sx * 3
        out.put(c(p)).put(c(p + 1)).put(c(p + 2))
        x += 1
      }
      var pad = w2 * 3
      while (pad < dstRow) { out.put(0.toByte); pad += 1 }
      r += 1
    }
    out.array()
  }

  /** REAL frame sampling: for MP4 rows, `framesPerVideo` evenly-spaced
    * frames are located through the sample table (stsc × stsz × stco)
    * and each emitted `frame` is the actual stored sample bytes — the
    * explode/generator shape of video preprocessing over real payloads.
    * Non-ISO-BMFF byte streams keep the byte-slice fallback so unknown
    * formats still flow through the pipeline shape. */
  /** Scene-structured video fixture for the mm6 cut-detection gate:
    * ids ≡ 2 (mod 3) are MP4s of `6 + id%4` frames whose pixels depend
    * on the SCENE index `f / 3` — frames within a scene are
    * byte-identical, every frame index divisible by 3 is a hard cut:
    * pixel(f, x, y) = (id·31 + (f/3)·17 + x·7 + y·13) mod 251. The last
    * video id carries 5 garbage bytes instead of a container (the
    * degradation row: cut detection must skip it, not crash or emit
    * zeros). Other kinds are omitted — sceneCuts only reads videos. */
  private[multimodal] def sceneFrames(id: Long): Int = 6 + (id % 4).toInt
  private[multimodal] def scenePixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + (f / 3) * 17 + x * 7 + y * 13) % 251).toInt

  def sceneFixture(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    val lastVideoId = (0L until n).filter(_ % 3 == 2).max
    spark.range(n).filter(_ % 3 == 2).map { id =>
      val w = videoWidth(id)
      val content =
        if (id == lastVideoId) Array[Byte](9, 9, 9, 9, 9)
        else Mp4.build(w, ImageHeight, sceneFrames(id),
          (f, x, y) => scenePixel(id, f, x, y))
      MediaRow(id, "video", content, format = "mp4",
        width = w, height = ImageHeight, sample_rate = 0,
        duration_ms = sceneFrames(id) * 100L)
    }
  }

  /** Scene-change (shot-boundary) detection over real MP4 payloads: for
    * every consecutive frame pair, the SUM of absolute luma deltas —
    * `diff_sum(f) = Σ_{pixels} |luma_f − luma_{f−1}|` — plus the cut
    * flag `diff_sum > pixels` (mean delta above 1 grey level; identical
    * frames score exactly 0). A pure per-row (per-video) flatMap: each
    * task decodes its own videos through the [[Mp4]] sample table and
    * emits (frames−1) narrow rows — no shuffle, no state,
    * embarrassingly parallel at any corpus size, the mapPartitions
    * shape a 100 TB video sweep needs. Corrupt/unparsable containers
    * and sub-2-frame videos emit NOTHING (the mm4/mm5 degradation rule:
    * skip, never fabricate). */
  def sceneCuts(spark: SparkSession,
                media: Dataset[MediaRow]): Dataset[(Long, Int, Long, Boolean)] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val parsed =
        if (Mp4.isMp4(m.content))
          try Some(Mp4.parse(m.content)) catch {
            case _: RuntimeException | _: IndexOutOfBoundsException => None
          }
        else None
      parsed match {
        case Some(movie) if movie.samples.sizes.length >= 2 =>
          val n = movie.samples.sizes.length
          (1 until n).map { f =>
            val a = Mp4.sampleBytes(m.content, movie, f - 1)
            val b = Mp4.sampleBytes(m.content, movie, f)
            val len = math.min(a.length, b.length)
            var s = 0L
            var i = 0
            while (i < len) {
              s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1
            }
            (m.media_id, f, s, s > len.toLong)
          }
        case _ => Nil
      }
    }
  }

  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   framesPerVideo: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val parsed =
        if (Mp4.isMp4(m.content))
          try Some(Mp4.parse(m.content)) catch {
            case _: RuntimeException | _: IndexOutOfBoundsException => None
          }
        else None
      parsed match {
        case Some(movie) if movie.samples.sizes.nonEmpty =>
          val n = movie.samples.sizes.length
          (0 until framesPerVideo).map { k =>
            val src = k * n / framesPerVideo // evenly spaced; repeats if n < fpv
            Frame(m.media_id, k, Mp4.sampleBytes(m.content, movie, src))
          }
        case _ => // unrecognized or corrupt container: byte-slice fallback
          val step = math.max(1, m.content.length / framesPerVideo)
          (0 until framesPerVideo).map { k =>
            val from = math.min(k * step, math.max(m.content.length - 1, 0))
            val until = math.min(from + step, m.content.length)
            Frame(m.media_id, k, java.util.Arrays.copyOfRange(m.content, from, until))
          }
      }
    }
  }

  /** End-to-end demo frame: features joined back to metadata. */
  def featureTable(spark: SparkSession, n: Int): DataFrame = {
    val media = fixture(spark, n).repartition(col("media_id"))
    extractFeatures(spark, media).toDF()
      .join(media.toDF().select("media_id", "format", "duration_ms"), "media_id")
      .orderBy("media_id")
  }
}
