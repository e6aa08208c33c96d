package graft.multimodal

import java.nio.ByteBuffer

/** Minimal, real ISO-BMFF (MP4) support — pure JVM, no codec jar.
  *
  * Writer: [[Mp4.build]] emits a structurally valid MP4 — `ftyp`, `mdat`
  * holding uncompressed 8-bpp luma frames, and a full `moov` tree
  * (`mvhd`, `trak/tkhd`, `mdia/mdhd/hdlr`, `minf/vmhd/dinf`, and a real
  * sample table: `stsd` with a `'raw '` VisualSampleEntry, `stts`,
  * `stsc`, `stsz`, `stco`). Uncompressed video in an MP4 container is a
  * legitimate (QuickTime-lineage) arrangement and is what makes decode
  * REAL in a codec-less container: the payload is actual pixels.
  *
  * Reader: [[Mp4.parse]] walks boxes by size+fourcc (no fixed offsets
  * beyond each box's own layout; handles 64-bit `co64`/largesize and
  * unknown boxes by skipping), reads movie timescale/duration, track
  * and sample-entry dimensions, and reconstructs per-sample byte
  * offsets from the chunk map — the standard stsc × stsz × stco walk.
  * Features are then computed from the REAL sample bytes at those
  * offsets, exactly as the BMP/WAV decoders read their payloads.
  *
  * Box layouts follow ISO/IEC 14496-12 (public spec).
  */
object Mp4 {

  /** Reconstructed sample table: per-sample sizes and absolute file
    * offsets, plus the coded frame geometry from the sample entry. */
  final case class SampleTable(format: String, width: Int, height: Int,
                               depth: Int, sizes: Array[Int],
                               offsets: Array[Long])

  final case class Movie(timescale: Long, duration: Long,
                         trackWidth: Int, trackHeight: Int,
                         samples: SampleTable) {
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
  }

  def isMp4(c: Array[Byte]): Boolean =
    c.length >= 12 &&
      c(4) == 'f'.toByte && c(5) == 't'.toByte &&
      c(6) == 'y'.toByte && c(7) == 'p'.toByte

  // ------------------------------------------------------------- writer

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(tag: String, parts: Array[Byte]*): Array[Byte] = {
    val len = 8 + parts.map(_.length).sum
    val bb = ByteBuffer.allocate(len) // ISO-BMFF is big-endian (BB default)
    bb.putInt(len).put(fourcc(tag))
    parts.foreach(bb.put)
    bb.array()
  }

  private def u32(vs: Long*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  private def u16(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Size of the fixed moov tree (every box version-0, one entry per
    * table, uniform stsz, single chunk): all frame-count/geometry
    * variation lives in mdat, so the container overhead is a constant —
    * which is what lets the mm1 oracle recompute n_bytes analytically. */
  val MoovSize: Int = 560
  val HeaderSize: Int = 24 + 8 // ftyp + mdat header; mdat payload at 32

  /** Build a valid single-track video MP4: `frames` uncompressed 8-bpp
    * luma frames of `w`×`h`, `pixel(frameIdx, x, y)` supplying each
    * byte; 10 fps at timescale 1000. Layout: ftyp | mdat | moov. */
  def build(w: Int, h: Int, frames: Int,
            pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val sampleSize = w * h
    val ftyp = box("ftyp", fourcc("isom"), u32(0x200), fourcc("isom"), fourcc("mp41"))
    require(ftyp.length == 24, s"ftyp size drifted: ${ftyp.length}")
    val payload = new Array[Byte](frames.toInt * sampleSize)
    var f = 0
    while (f < frames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          payload(f * sampleSize + y * w + x) = pixel(f, x, y).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    val mdat = box("mdat", payload)
    val duration = frames * 100L // 10 fps at timescale 1000

    val mvhd = box("mvhd",
      u32(0, 0, 0, 1000, duration), // v/flags, ctime, mtime, timescale, dur
      u32(0x00010000), u16(0x0100, 0), // rate, volume, reserved
      u32(0, 0), // reserved
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000), // matrix
      u32(0, 0, 0, 0, 0, 0), // pre_defined
      u32(2)) // next track id
    val tkhd = box("tkhd",
      u32(7, 0, 0, 1, 0, duration), // v/flags(enabled), ctime, mtime, id, rsv, dur
      u32(0, 0), u16(0, 0, 0, 0), // reserved, layer, alt_group, volume, rsv
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000), // matrix
      u32(w.toLong << 16, h.toLong << 16)) // 16.16 fixed-point dimensions
    val mdhd = box("mdhd",
      u32(0, 0, 0, 1000, duration), u16(0x55c4, 0)) // language 'und'
    val hdlr = box("hdlr",
      u32(0, 0), fourcc("vide"), u32(0, 0, 0),
      fourcc("graft") :+ 0.toByte)
    val vmhd = box("vmhd", u32(1), u16(0, 0, 0, 0)) // graphicsmode+opcolor
    val dinf = box("dinf",
      box("dref", u32(0, 1), box("url ", u32(1)))) // self-contained
    val sampleEntry = {
      val bb = ByteBuffer.allocate(86)
      bb.putInt(86).put(fourcc("raw ")) // uncompressed sample entry
        .put(new Array[Byte](6)).putShort(1) // reserved, data_ref_index
        .putShort(0).putShort(0).put(new Array[Byte](12)) // pre_defined/rsv
        .putShort(w.toShort).putShort(h.toShort)
        .putInt(0x00480000).putInt(0x00480000) // 72 dpi
        .putInt(0).putShort(1) // reserved, frame_count
        .put(new Array[Byte](32)) // compressor name (pascal, zeroed)
        .putShort(8).putShort(-1) // depth: 8-bpp luma, pre_defined
      bb.array()
    }
    val stsd = box("stsd", u32(0, 1), sampleEntry)
    val stts = box("stts", u32(0, 1, frames, 100))
    val stsc = box("stsc", u32(0, 1, 1, frames, 1)) // one chunk, all samples
    val stsz = box("stsz", u32(0, sampleSize, frames)) // uniform size
    val stco = box("stco", u32(0, 1, HeaderSize)) // chunk 0 right after mdat hdr
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    require(moov.length == MoovSize,
      s"moov size drifted: ${moov.length} != $MoovSize — update MoovSize AND the mm1 oracle")
    ftyp ++ mdat ++ moov
  }

  // ------------------------------------------------------------- reader

  private def be16(c: Array[Byte], p: Int): Int =
    ((c(p) & 0xff) << 8) | (c(p + 1) & 0xff)
  private def be32(c: Array[Byte], p: Int): Long =
    ((c(p) & 0xffL) << 24) | ((c(p + 1) & 0xffL) << 16) |
      ((c(p + 2) & 0xffL) << 8) | (c(p + 3) & 0xffL)
  private def be64(c: Array[Byte], p: Int): Long =
    (be32(c, p) << 32) | be32(c, p + 4)
  private def tag(c: Array[Byte], p: Int): String =
    new String(c, p, 4, "US-ASCII")

  /** Visit each box in [from, to): f(tag, bodyStart, bodyEnd). Handles
    * largesize (size==1 → 64-bit) and size==0 (extends to `to`). */
  private def walk(c: Array[Byte], from: Int, to: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p + 8 <= to) {
      val size0 = be32(c, p)
      val t = tag(c, p + 4)
      val (body, end) =
        if (size0 == 1) (p + 16, p + be64(c, p + 8).toInt)
        else if (size0 == 0) (p + 8, to)
        else (p + 8, p + size0.toInt)
      require(end > p && end <= to, s"malformed box '$t' at $p (end=$end)")
      f(t, body, end)
      p = end
    }
  }

  /** Parse the movie structure. Throws on anything that is not a
    * single-video-track MP4 with a complete sample table — the caller
    * decides whether to fall back. */
  def parse(c: Array[Byte]): Movie = {
    require(isMp4(c), "not an ISO-BMFF file (no ftyp)")
    var timescale = 0L; var duration = 0L
    var tkW = 0; var tkH = 0
    var seFormat = ""; var seW = 0; var seH = 0; var seDepth = 0
    var stszSizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stscRuns: Array[(Int, Int)] = null // (first_chunk 1-based, samples/chunk)

    def stbl(from: Int, to: Int): Unit = walk(c, from, to) {
      case ("stsd", b, _) =>
        if (be32(c, b + 4) >= 1) { // entry_count
          seFormat = tag(c, b + 12)
          seW = be16(c, b + 8 + 32); seH = be16(c, b + 8 + 34)
          seDepth = be16(c, b + 8 + 82)
        }
      case ("stsz", b, e) =>
        val uniform = be32(c, b + 4); val n = be32(c, b + 8).toInt
        // Bound BEFORE allocating: a corrupt-but-positive count would
        // otherwise allocate gigabytes and die with OutOfMemoryError —
        // an Error the decode() fallback (catching RuntimeException)
        // cannot absorb. Non-uniform entries must fit the box body;
        // uniform total payload must fit the file.
        require(n >= 0, s"stsz sample_count $n negative")
        if (uniform != 0)
          require(n.toLong * (uniform & 0xffffffffL) <= c.length,
            s"stsz uniform $uniform x $n exceeds file of ${c.length} bytes")
        else
          require(b + 12 + 4L * n <= e,
            s"stsz sample_count $n overruns box body")
        stszSizes =
          if (uniform != 0) Array.fill(n)(uniform.toInt)
          else Array.tabulate(n)(i => be32(c, b + 12 + 4 * i).toInt)
      case ("stco", b, e) =>
        val n = be32(c, b + 4).toInt
        require(n >= 0 && b + 8 + 4L * n <= e, s"stco entry_count $n overruns box body")
        chunkOffsets = Array.tabulate(n)(i => be32(c, b + 8 + 4 * i))
      case ("co64", b, e) =>
        val n = be32(c, b + 4).toInt
        require(n >= 0 && b + 8 + 8L * n <= e, s"co64 entry_count $n overruns box body")
        chunkOffsets = Array.tabulate(n)(i => be64(c, b + 8 + 8 * i))
      case ("stsc", b, e) =>
        val n = be32(c, b + 4).toInt
        require(n >= 0 && b + 8 + 12L * n <= e, s"stsc entry_count $n overruns box body")
        stscRuns = Array.tabulate(n)(i =>
          (be32(c, b + 8 + 12 * i).toInt, be32(c, b + 12 + 12 * i).toInt))
      case _ => // stts etc.: durations come from mvhd
    }
    def minf(from: Int, to: Int): Unit =
      walk(c, from, to) { case ("stbl", b, e) => stbl(b, e); case _ => }
    def mdia(from: Int, to: Int): Unit =
      walk(c, from, to) { case ("minf", b, e) => minf(b, e); case _ => }
    def trak(from: Int, to: Int): Unit = walk(c, from, to) {
      case ("tkhd", b, _) =>
        // v0 layout: width/height are 16.16 at body +76/+80
        tkW = (be32(c, b + 76) >> 16).toInt; tkH = (be32(c, b + 80) >> 16).toInt
      case ("mdia", b, e) => mdia(b, e)
      case _ =>
    }
    def moov(from: Int, to: Int): Unit = walk(c, from, to) {
      case ("mvhd", b, _) =>
        timescale = be32(c, b + 12); duration = be32(c, b + 16)
      case ("trak", b, e) => trak(b, e)
      case _ =>
    }
    walk(c, 0, c.length) { case ("moov", b, e) => moov(b, e); case _ => }

    require(stszSizes != null && chunkOffsets != null && stscRuns != null,
      "MP4 without a complete stsc/stsz/stco sample table")
    // standard chunk walk: expand stsc runs over the chunk list, then lay
    // consecutive sample sizes into each chunk from its stco offset
    val nSamples = stszSizes.length
    val offsets = new Array[Long](nSamples)
    var sample = 0
    var chunk = 0
    while (chunk < chunkOffsets.length && sample < nSamples) {
      var run = 0
      var spc = stscRuns(0)._2
      while (run < stscRuns.length && stscRuns(run)._1 <= chunk + 1) {
        spc = stscRuns(run)._2; run += 1
      }
      var off = chunkOffsets(chunk)
      var s = 0
      while (s < spc && sample < nSamples) {
        offsets(sample) = off
        off += stszSizes(sample)
        sample += 1; s += 1
      }
      chunk += 1
    }
    require(sample == nSamples, s"chunk map covered $sample of $nSamples samples")
    Movie(timescale, duration, tkW, tkH,
      SampleTable(seFormat, seW, seH, seDepth, stszSizes, offsets))
  }

  /** REAL video decode: brightness = mean sample byte / 255 over every
    * frame located through the sample table; embedding bucket k holds
    * the luma sum of pixel columns x ≡ k (mod 16), mod 1000 — the same
    * aggregate shape as the BMP decoder, x derived from the sample-entry
    * width. */
  def features(c: Array[Byte]): (Double, Array[Float]) = {
    val m = parse(c)
    val w = math.max(m.samples.width, 1)
    var sum = 0L
    var total = 0L
    val buckets = new Array[Long](16)
    var i = 0
    while (i < m.samples.sizes.length) {
      val base = m.samples.offsets(i)
      val len = m.samples.sizes(i)
      require(base + len <= c.length, s"sample $i overruns the file")
      var j = 0
      while (j < len) {
        val v = c(base.toInt + j) & 0xff
        sum += v
        buckets((j % w) % 16) += v
        j += 1
      }
      total += len
      i += 1
    }
    val brightness = if (total == 0) 0.0 else sum.toDouble / total / 255.0
    (brightness, buckets.map(b => (b % 1000).toFloat / 1000.0f))
  }

  /** The real bytes of sample `idx` — what frame extraction returns. */
  def sampleBytes(c: Array[Byte], m: Movie, idx: Int): Array[Byte] = {
    val off = m.samples.offsets(idx).toInt
    java.util.Arrays.copyOfRange(c, off, off + m.samples.sizes(idx))
  }
}
