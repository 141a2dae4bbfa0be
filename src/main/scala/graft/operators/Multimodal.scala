package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside. The decode /
  * feature-extract step runs per-partition over iterator batches — the
  * Scala analog of `mapInPandas` — so a real decoder (JNI / native lib)
  * would slot in without changing the plan shape: narrow map, no shuffle,
  * batch-at-a-time memory footprint.
  *
  * Container-header METADATA (format, pixel dimensions) is parsed for
  * real — [[parseImageHeader]] reads the actual PNG/JPEG/GIF byte
  * layouts, pure JVM, no media libraries — and the decode paths are
  * real end-to-end: [[parseWav]] walks the RIFF/WAVE container and
  * decodes PCM16 samples (peak/RMS/duration); [[decodeImagePixels]]
  * decodes PPM-P6 / uncompressed 24-bit BMP pixel data byte-level and,
  * since round 13, COMPRESSED rasters (PNG/JPEG/GIF + non-trivial BMP)
  * through the JDK's own `javax.imageio` codecs ([[decodeToRgb]]) — no
  * external media library, headless-safe. [[resize]] decodes any of
  * those, nearest-neighbor-resamples with exact integer index math,
  * and re-encodes as PPM-P6 (a deterministic byte-exact container, so
  * the resampled payload itself is gate-able). Video frame extraction
  * is REAL since round 14 for the one container the JDK can read
  * without a codec: Y4M / YUV4MPEG2 (plain-text header + uncompressed
  * planar YCbCr frames — mjpegtools' interchange format, what
  * ffmpeg/x264 pipe between stages). [[parseY4m]] walks the container
  * and [[frameSample]]/[[y4mFrameStats]] demux every `stride`-th
  * frame; compressed containers (MP4/MKV) stay out of scope — the JDK
  * ships no inter-frame codec, and fabricating frames would violate
  * the corrupt-path contract (unreadable payload → no rows, never
  * fake bytes).
  */
object Multimodal {

  // ImageIO's default scratch-file cache serializes concurrent decodes
  // on tmp-dir I/O; all payloads here are in-memory byte arrays.
  javax.imageio.ImageIO.setUseCache(false)

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = true),
    StructField("last_byte", IntegerType, nullable = true),
    StructField("format", StringType, nullable = false),
    StructField("img_width", IntegerType, nullable = true),
    StructField("img_height", IntegerType, nullable = true)))

  /** REAL container-header parse — (format, width, height) from the
    * actual byte layouts, no decode:
    *  - PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
    *    big-endian 4-byte width/height at offsets 16/20;
    *  - JPEG: SOI then marker segments (0xFF marker len16 payload);
    *    dimensions live in the frame header SOFn (0xC0-0xCF minus
    *    DHT 0xC4 / JPG 0xC8 / DAC 0xCC): big-endian height at +5,
    *    width at +7. Standalone markers (RSTn/TEM) have no length;
    *    fill 0xFF bytes are padding; SOS/EOI end the search.
    *  - GIF: "GIF87a"/"GIF89a", then the logical-screen descriptor —
    *    little-endian 2-byte width/height at offsets 6/8.
    * Unrecognized bytes → ("unknown", None, None). */
  def parseImageHeader(p: Array[Byte]): (String, Option[Int], Option[Int]) = {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a && u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' &&
        u8(15) == 'R')
      ("png", Some(be32(16)), Some(be32(20)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: (String, Option[Int], Option[Int]) = ("jpeg", None, None)
      var done = false
      while (!done && i + 1 < p.length) {
        if (u8(i) != 0xff) done = true // corrupt stream: stop, keep format
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (m == 0xd9 || m == 0xda) done = true // EOI / SOS
          else if (i + 3 < p.length) {
            val len = be16(i + 2)
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                m != 0xcc && i + 8 < p.length) {
              res = ("jpeg", Some(be16(i + 7)), Some(be16(i + 5)))
              done = true
            } else i += 2 + math.max(len, 2)
          } else done = true
        }
      }
      res
    } else if (p.length >= 13 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      ("gif", Some(le16(6)), Some(le16(8)))
    else ("unknown", None, None)
  }

  /** REAL audio parse+decode — RIFF/WAVE container walk and, for
    * PCM16, the actual sample decode (no codecs needed: PCM16 IS the
    * samples). Returns (format, channels, sampleRate, bitsPerSample,
    * nFrames, durationMs, peakAbs, rms):
    *  - "RIFF" le32(size) "WAVE", then chunks of (4cc, le32 len,
    *    payload, pad-to-even);
    *  - "fmt ": le16 audioFormat (1 = PCM), le16 channels, le32
    *    sampleRate, le32 byteRate, le16 blockAlign, le16 bits;
    *  - "data": the sample stream; frames = len / blockAlign,
    *    durationMs = frames·1000 / sampleRate (integer arithmetic);
    *  - PCM16 decode: le16 two's-complement per sample, peak = max
    *    |s|, rms over ALL channels' samples.
    * Non-WAV bytes → ("unknown", None…); WAV with a non-PCM16 body
    * keeps the real header metadata and null decode stats. */
  def parseWav(p: Array[Byte]): (String, Option[Int], Option[Int],
      Option[Int], Option[Long], Option[Long], Option[Int], Option[Double]) = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def fourcc(i: Int, s: String) =
      p.length >= i + 4 && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !fourcc(0, "RIFF") || !fourcc(8, "WAVE"))
      return ("unknown", None, None, None, None, None, None, None)
    var i = 12
    var audioFormat, channels, bits = -1
    var sampleRate = -1L
    var blockAlign = -1
    var dataOff = -1
    var dataLen = -1L
    var corrupt = false
    while (!corrupt && i + 8 <= p.length && (audioFormat < 0 || dataOff < 0)) {
      val len = le32(i + 4)
      if (fourcc(i, "fmt ") && len >= 16 && i + 8 + 16 <= p.length) {
        audioFormat = le16(i + 8)
        channels = le16(i + 10)
        sampleRate = le32(i + 12)
        blockAlign = le16(i + 20)
        bits = le16(i + 22)
      } else if (fourcc(i, "data")) {
        dataOff = i + 8
        dataLen = math.min(len, (p.length - dataOff).toLong)
      }
      // a declared length past the buffer ends the walk (truncated or
      // corrupt stream; a data chunk already clamps via dataLen)
      if (len < 0 || len > p.length.toLong - i - 8) corrupt = true
      else i += 8 + len.toInt + (len.toInt & 1) // chunks pad to even
    }
    if (audioFormat < 0)
      return ("wav", None, None, None, None, None, None, None)
    // an unsigned le32 rate above Int.MaxValue (or 0) is a corrupt
    // header — surface real metadata only, like the other corrupt paths
    if (sampleRate <= 0 || sampleRate > Int.MaxValue)
      return ("wav", Some(channels), None, Some(bits), None, None, None, None)
    val nFrames =
      if (dataLen >= 0 && blockAlign > 0) Some(dataLen / blockAlign) else None
    val durMs = nFrames.flatMap(f =>
      if (sampleRate > 0) Some(f * 1000L / sampleRate) else None)
    val pcm16 = audioFormat == 1 && bits == 16
    val fmt = if (pcm16) "wav-pcm16" else "wav"
    if (!pcm16 || dataOff < 0)
      return (fmt, Some(channels), Some(sampleRate.toInt), Some(bits),
        nFrames, durMs, None, None)
    // REAL PCM16 decode: every sample, all channels
    val nSamples = (dataLen / 2).toInt
    var peak = 0
    var sumSq = 0.0
    var s = 0
    while (s < nSamples) {
      val v = (le16(dataOff + 2 * s) << 16) >> 16 // sign-extend
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v.toDouble * v.toDouble
      s += 1
    }
    val rms = if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0
    (fmt, Some(channels), Some(sampleRate.toInt), Some(bits),
      nFrames, durMs, Some(peak), Some(rms))
  }

  /** Locate a well-formed PCM16 data chunk: Some((dataOff, nSamples))
    * when the RIFF/WAVE walk finds audioFormat=1, bits=16 and a data
    * chunk (the same walk as [[parseWav]], minus the statistics). */
  private def pcm16Data(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def fourcc(i: Int, s: String) =
      p.length >= i + 4 && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !fourcc(0, "RIFF") || !fourcc(8, "WAVE"))
      return None
    var i = 12
    var audioFormat, bits = -1
    var dataOff = -1
    var dataLen = -1L
    var corrupt = false
    while (!corrupt && i + 8 <= p.length && (audioFormat < 0 || dataOff < 0)) {
      val len = le32(i + 4)
      if (fourcc(i, "fmt ") && len >= 16 && i + 8 + 16 <= p.length) {
        audioFormat = le16(i + 8)
        bits = le16(i + 22)
      } else if (fourcc(i, "data")) {
        dataOff = i + 8
        dataLen = math.min(len, (p.length - dataOff).toLong)
      }
      if (len < 0 || len > p.length.toLong - i - 8) corrupt = true
      else i += 8 + len.toInt + (len.toInt & 1)
    }
    if (audioFormat == 1 && bits == 16 && dataOff >= 0 && dataLen >= 2)
      Some((dataOff, (dataLen / 2).toInt))
    else None
  }

  /** Per-frame PCM16 features — the frame-level extraction pass
    * behind VAD / loudness curves and audio-segment quality filters:
    * each valid PCM16 payload fans out to one row per frame of
    * `frameSamples` samples (the trailing remainder is its own
    * shorter frame) with EXACT integer energy (Σ sample²) and peak
    * (max |sample|) — gate-safe, no float RMS in the surface.
    * Payloads that are not well-formed PCM16 emit nothing (the
    * corrupt-path contract of [[parseWav]]).
    *
    * Shape at scale: mapPartitions flatMap — per-row bounded output
    * (samples/frameSamples frames), no shuffle; the decode stays
    * byte-local exactly like the other real decoders here. */
  def frameEnergy(df: DataFrame, idCol: String, payloadCol: String,
      frameSamples: Int): DataFrame = {
    require(frameSamples >= 1, "frameSamples must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("peak", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte]
        else row.getAs[Array[Byte]](pIdx)
      pcm16Data(payload) match {
        case None => Iterator.empty
        case Some((off, n)) =>
          def u8(i: Int) = payload(i) & 0xff
          val id = row.getLong(idIdx)
          (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
            val s0 = f * frameSamples
            val s1 = math.min(s0 + frameSamples, n)
            var energy = 0L
            var peak = 0L
            var s = s0
            while (s < s1) {
              val v = ((u8(off + 2 * s) | (u8(off + 2 * s + 1) << 8))
                << 16) >> 16
              energy += v.toLong * v
              if (math.abs(v).toLong > peak) peak = math.abs(v).toLong
              s += 1
            }
            Row(id, f.toLong, (s1 - s0).toLong, energy, peak)
          }
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame ZERO-CROSSING RATE + absolute deviation — the classic
    * cheap speech/tone discriminator next to [[frameEnergy]]'s
    * loudness: how often the signal crosses `midline` between
    * consecutive samples WITHIN a frame (boundary transitions belong
    * to neither frame, so frame stats are frame-local in both
    * engines), plus Σ|v − midline|. `midline` 0 is textbook ZCR; a
    * positive midline measures crossings of the DC offset — what the
    * ASCII-pinned synth WAVs need, their samples being always
    * positive. All integers; same mapPartitions no-shuffle shape and
    * corrupt-path contract as [[frameEnergy]]. */
  def frameZcr(df: DataFrame, idCol: String, payloadCol: String,
      frameSamples: Int, midline: Long = 0L): DataFrame = {
    require(frameSamples >= 1, "frameSamples must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("zcr", LongType, nullable = false),
      StructField("sum_dev", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte]
        else row.getAs[Array[Byte]](pIdx)
      pcm16Data(payload) match {
        case None => Iterator.empty
        case Some((off, n)) =>
          def u8(i: Int) = payload(i) & 0xff
          def sample(s: Int): Long =
            (((u8(off + 2 * s) | (u8(off + 2 * s + 1) << 8))
              << 16) >> 16).toLong
          val id = row.getLong(idIdx)
          (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
            val s0 = f * frameSamples
            val s1 = math.min(s0 + frameSamples, n)
            var zcr = 0L
            var dev = 0L
            var s = s0
            while (s < s1) {
              val v = sample(s)
              dev += math.abs(v - midline)
              if (s > s0 &&
                (sample(s - 1) >= midline) != (v >= midline)) zcr += 1
              s += 1
            }
            Row(id, f.toLong, (s1 - s0).toLong, zcr, dev)
          }
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio CLIPPING card over REAL PCM16 decode — the "is this
    * recording saturated?" QA filter next to [[frameZcr]]'s activity
    * and [[silenceTrim]]'s quiet-edge card: per clip the sample
    * count, samples at the digital rails (|v| ≥ `railAbs`, default
    * the int16 positive rail 32767 — clipping shows as runs pinned at
    * either rail), the LONGEST consecutive clipped run (one pinned
    * sample can be a legitimate peak; a run is a flat-topped wave),
    * and the exact e6 clipped share. Undecodable payloads emit
    * nothing (the parseWav corrupt-path contract).
    *
    * Shape at scale: the [[frameZcr]] narrow per-partition map — one
    * row per clip, no shuffle. */
  def clippingCard(df: DataFrame, idCol: String, payloadCol: String,
      railAbs: Long = 32767L): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_clipped", LongType, nullable = false),
      StructField("max_clip_run", LongType, nullable = false),
      StructField("clip_rate_e6", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte]
        else row.getAs[Array[Byte]](pIdx)
      pcm16Data(payload) match {
        case None => Iterator.empty
        case Some((off, n)) =>
          def u8(i: Int) = payload(i) & 0xff
          def sample(s: Int): Long =
            (((u8(off + 2 * s) | (u8(off + 2 * s + 1) << 8))
              << 16) >> 16).toLong
          var clipped = 0L
          var run = 0L
          var maxRun = 0L
          var s = 0
          while (s < n) {
            if (math.abs(sample(s)) >= railAbs) {
              clipped += 1
              run += 1
              if (run > maxRun) maxRun = run
            } else run = 0
            s += 1
          }
          val rate =
            if (n == 0) 0L
            else (clipped * 2000000L + n) / (2L * n)
          Iterator.single(Row(row.getLong(idIdx), n.toLong, clipped,
            maxRun, rate))
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image pixel decode for the two codec-free raster formats —
    * the image twin of [[parseWav]]'s PCM16 path, closing the "only
    * audio decodes for real" gap. Returns
    * (format, w, h, sumCh, minCh, maxCh) with channel-byte statistics
    * over the actual pixel data, all integers (gate-safe):
    *  - PPM P6 (binary NetPBM): "P6", then whitespace-separated width,
    *    height, maxval (≤ 255; '#' comments legal in the header), one
    *    whitespace byte, then w·h·3 raw RGB bytes;
    *  - BMP (Windows, BITMAPINFOHEADER): "BM", pixel-array offset
    *    le32@10, header size le32@14 ≥ 40, signed width le32@18 /
    *    height le32@22 (negative height = top-down), bpp le16@28 = 24,
    *    compression le32@30 = 0 (BI_RGB); rows pad to 4 bytes, and the
    *    padding bytes are EXCLUDED from the statistics.
    * A recognized magic with a malformed/truncated body keeps the
    * format tag and yields null statistics (the parseWav corrupt-path
    * contract); unrecognized bytes → ("unknown", nulls). */
  def decodeImagePixels(p: Array[Byte]): (String, Option[Int], Option[Int],
      Option[Long], Option[Int], Option[Int]) = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def stats(ranges: Seq[(Int, Int)]): (Long, Int, Int) = {
      var sum = 0L
      var mn = 255
      var mx = 0
      ranges.foreach { case (off, len) =>
        var i = off
        while (i < off + len) {
          val b = u8(i)
          sum += b
          if (b < mn) mn = b
          if (b > mx) mx = b
          i += 1
        }
      }
      (sum, mn, mx)
    }
    if (p.length >= 2 && u8(0) == 'P' && u8(1) == '6') {
      parsePpmHeader(p) match {
        case Some((w, h, dataOff)) =>
          val (sum, mn, mx) = stats(Seq((dataOff, w * h * 3)))
          ("ppm", Some(w), Some(h), Some(sum), Some(mn), Some(mx))
        case None => ("ppm", None, None, None, None, None)
      }
    } else if (p.length >= 54 && u8(0) == 'B' && u8(1) == 'M') {
      val dataOff = le32(10)
      val w = le32(18).toInt
      val hRaw = le32(22).toInt
      val h = math.abs(hRaw)
      val ok = le32(14) >= 40 && le16(28) == 24 && le32(30) == 0 &&
        w > 0 && h > 0 && dataOff >= 54
      // not the byte-decodable 24-bpp/BI_RGB layout: hand the payload
      // to the JDK codec, which covers the other BMP bit depths
      if (!ok) imageIoStats(p, "bmp")
      else {
        // row math in LONG: a crafted width near 2^31/3 would overflow
        // w*3 to a negative rowSize and slip past the truncation guard
        val rowSize = ((w.toLong * 3 + 3) / 4) * 4
        if (dataOff + rowSize * h > p.length)
          ("bmp", Some(w), Some(h), None, None, None)
        else {
          val rows = (0 until h).map(r =>
            (dataOff.toInt + r * rowSize.toInt, w * 3))
          val (sum, mn, mx) = stats(rows)
          ("bmp", Some(w), Some(h), Some(sum), Some(mn), Some(mx))
        }
      }
    } else parseImageHeader(p) match {
      // compressed rasters: REAL decode through the JDK's javax.imageio
      // codecs (PNG is lossless, so decoded statistics are exact and
      // oracle-reproducible from the pixel generator — the q193 gate)
      case (fmt @ ("png" | "jpeg" | "gif"), _, _) => imageIoStats(p, fmt)
      case _ => ("unknown", None, None, None, None, None)
    }
  }

  /** REAL compressed-image decode via `javax.imageio` (JDK-bundled
    * PNG/JPEG/GIF/BMP readers, headless): Some((w, h, row-major packed
    * sRGB ints)) or None when no registered codec can read the bytes.
    * Deterministic: PNG/GIF/BMP are lossless; JPEG decode is a fixed
    * IDCT for a given payload. */
  def decodeToRgb(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Throwable => None }

  /** Channel-byte statistics (R,G,B per pixel — alpha excluded, like
    * the byte-level PPM/BMP paths) over a [[decodeToRgb]] decode;
    * recognized-but-undecodable keeps the format tag with null stats
    * (the parseWav corrupt-path contract). */
  private def imageIoStats(p: Array[Byte], fmt: String): (String, Option[Int],
      Option[Int], Option[Long], Option[Int], Option[Int]) =
    decodeToRgb(p) match {
      case None => (fmt, None, None, None, None, None)
      case Some((w, h, rgb)) =>
        var sum = 0L
        var mn = 255
        var mx = 0
        var i = 0
        while (i < rgb.length) {
          val v = rgb(i)
          var c = 0
          while (c < 3) {
            val b = (v >> (16 - 8 * c)) & 0xff
            sum += b
            if (b < mn) mn = b
            if (b > mx) mx = b
            c += 1
          }
          i += 1
        }
        (fmt, Some(w), Some(h), Some(sum), Some(mn), Some(mx))
    }

  /** Encode row-major packed-RGB pixels as PNG through the JDK codec —
    * the synthesis half of the decode gate (PNG is lossless, so
    * encode→decode round-trips pixel-exactly). */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"need $w*$h pixels, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic pixel generator shared by the q193 gate's Spark
    * harness and its DuckDB oracle: channel byte for (id, x, y, c) —
    * pure integer arithmetic so both engines reproduce it exactly. */
  def synthChannel(id: Long, x: Int, y: Int, c: Int): Int =
    (((id % 100003L) * 31 + x.toLong * 7 + y.toLong * 13 + c.toLong * 97) % 256).toInt

  /** Deterministic synthetic-image dims for id: bounded (≤16 × ≤14)
    * so the oracle can enumerate pixels with a fixed unnest range. */
  def synthDims(id: Long): (Int, Int) =
    ((4 + (id % 13)).toInt, (4 + (id % 11)).toInt)

  /** Synthesize one REAL PNG payload per input row from the row's id
    * alone — the by-construction harness for the compressed-decode
    * gate (q193): the generator formula is mirrored in SQL, PNG is
    * lossless, so decode statistics are oracle-exact. Narrow
    * per-partition map, no shuffle. */
  def synthPngPayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val id = row.getLong(idIdx)
      val (w, h) = synthDims(id)
      val rgb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          rgb(y * w + x) = (synthChannel(id, x, y, 0) << 16) |
            (synthChannel(id, x, y, 1) << 8) | synthChannel(id, x, y, 2)
          x += 1
        }
        y += 1
      }
      Row(id, encodePng(w, h, rgb))
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** TEXT-derived PNG payloads — the q267 PPM pixel convention (RGB
    * bytes from the first w·h·3 chars) through a REAL PNG encode →
    * [[dhashFingerprints]]' ImageIO decode exercises an actual codec
    * while an oracle recomputes the gray levels from the chars (PNG
    * is lossless, the q193-gated roundtrip). Because the pixels ARE
    * the text, textual near-dups become visual near-dups — the
    * coupling the multimodal-agreement gate needs. Callers must
    * pre-filter to ASCII-pure rows (octet_length = char_length) of
    * at least w·h·3 chars, where byte == char. */
  def textPngPayloads(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, h: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val b = row.getString(tIdx).getBytes("UTF-8")
      val rgb = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        rgb(i) = ((b(3 * i) & 0xff) << 16) |
          ((b(3 * i + 1) & 0xff) << 8) | (b(3 * i + 2) & 0xff)
        i += 1
      }
      Row(row.getLong(idIdx), encodePng(w, h, rgb))
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[synthChannel]] with a GROUPED perturbation: `groupSize`
    * consecutive ids share a base image (base = id / groupSize), and
    * the group-local variant v = id % groupSize shifts ONLY source
    * pixel (0,0)'s channels by v·40 (mod 256). Within a group the
    * dHash fingerprints of [[dhashFingerprints]] can differ only in
    * the band-boundary bits of the resample rows/cols covering source
    * (0,0) — near-duplicates by construction, with the formula
    * mirrored verbatim in the q216 oracle. */
  def synthVariantChannel(id: Long, groupSize: Int, x: Int, y: Int,
      c: Int): Int = {
    val raw = synthChannel(id / groupSize, x, y, c)
    if (x == 0 && y == 0)
      ((raw + (id % groupSize) * 40) % 256).toInt
    else raw
  }

  /** [[synthPngPayloads]] over the VARIANT generator — real PNG
    * payloads where groups of `groupSize` consecutive ids are
    * perceptual near-duplicates (dims come from the shared base, so
    * group members always align pixel-for-pixel). */
  def synthVariantPngPayloads(df: DataFrame, idCol: String,
      groupSize: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val id = row.getLong(idIdx)
      val (w, h) = synthDims(id / groupSize)
      val rgb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          rgb(y * w + x) =
            (synthVariantChannel(id, groupSize, x, y, 0) << 16) |
            (synthVariantChannel(id, groupSize, x, y, 1) << 8) |
            synthVariantChannel(id, groupSize, x, y, 2)
          x += 1
        }
        y += 1
      }
      Row(id, encodePng(w, h, rgb))
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** dHash (difference-hash) perceptual fingerprints over REAL decoded
    * images: [[decodeToRgb]] (any ImageIO-supported codec), exact
    * integer nearest-neighbor resample to a 9×8 grayscale grid
    * (src = (x·w)/9, (y·h)/8; gray = R+G+B — monotone, no /3 rounding
    * to mirror), then bit (x,y) = gray(x,y) > gray(x+1,y) packed at
    * y·8+x — one 64-bit long per image, (doc, fp). Two images hash
    * close iff their horizontal gradient signs agree — the standard
    * scaled/re-encoded-duplicate detector. Undecodable payloads drop:
    * the perceptual surface is defined only over decodable images.
    *
    * Shape at scale: narrow per-partition map (decode + 72 pixel
    * probes per image), no shuffle; downstream banding reuses
    * [[Dedup.simhashFromFingerprints]]'s multi-index join — identical
    * hamming ≤ 3 pigeonhole guarantee at 4 bands. */
  def dhashFingerprints(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val id = row.getLong(idIdx)
      decodeToRgb(row.getAs[Array[Byte]](pIdx)).map { case (w, h, rgb) =>
        def gray(x: Int, y: Int): Int = {
          val p = rgb((y * h / 8) * w + (x * w / 9))
          ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        }
        var fp = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x, y) > gray(x + 1, y)) fp |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Row(id, fp)
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** PPM-P6 header walk shared by decode and resize: Some((w, h,
    * pixel-data offset)) for a well-formed header with a complete
    * w·h·3-byte body, None for malformed/truncated. Dimension product
    * is bounded by the payload length, so w·h·3 fits an Int. */
  private def parsePpmHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    if (p.length < 2 || u8(0) != 'P' || u8(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        val c = u8(i)
        if (c == '#') { while (i < p.length && u8(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = -1
      while (i < p.length && u8(i) >= '0' && u8(i) <= '9') {
        v = math.max(v, 0) * 10 + (u8(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    i += 1 // the single whitespace byte after maxval
    val n = if (w > 0 && h > 0) w.toLong * h * 3 else -1L
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
        n > p.length.toLong - i) None
    else Some((w, h, i))
  }

  /** REAL image resize for the codec-free PPM-P6 format:
    * nearest-neighbor resample (integer source-index math — srcY =
    * y·h div outH — fully deterministic) re-encoded as a PPM of the
    * target dimensions. None for anything that is not a complete PPM
    * payload; [[resize]] falls back to the declared stub there. */
  def resizePpm(p: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    parsePpmHeader(p).map { case (w, h, dataOff) =>
      val header = s"P6\n$outW $outH\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + outW * outH * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0
      var o = header.length
      while (y < outH) {
        val sy = (y.toLong * h / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * w / outW).toInt
          val src = dataOff + (sy * w + sx) * 3
          out(o) = p(src); out(o + 1) = p(src + 1); out(o + 2) = p(src + 2)
          o += 3; x += 1
        }
        y += 1
      }
      out
    }

  val pixelFeatureSchema: StructType = StructType(Seq(
    StructField("px_format", StringType, nullable = false),
    StructField("px_w", IntegerType, nullable = true),
    StructField("px_h", IntegerType, nullable = true),
    StructField("px_sum", LongType, nullable = true),
    StructField("px_min", IntegerType, nullable = true),
    StructField("px_max", IntegerType, nullable = true)))

  /** Pixel feature extraction — REAL end-to-end for PPM/uncompressed
    * BMP ([[decodeImagePixels]]); same narrow per-partition map shape
    * as [[audioFeatures]]. */
  def pixelFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +:
        pixelFeatureSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      val (fmt, w, h, sum, mn, mx) = decodeImagePixels(payload)
      Row(row.getLong(idIdx), fmt,
        w.map(Int.box).orNull, h.map(Int.box).orNull,
        sum.map(Long.box).orNull, mn.map(Int.box).orNull,
        mx.map(Int.box).orNull)
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-PIXEL luma rows for P6/PPM payloads — (id, l) with the
    * [[contrastCard]] BT.709 integer luma per pixel: the exploded
    * form distribution analyses (histograms, [[otsuCard]]) aggregate,
    * where the card operators fold in-place. Non-PPM / corrupt
    * payloads contribute no rows. Narrow per-partition flatMap; row
    * volume = pixels, bounded by the caller's image dimensions. */
  def lumaPixels(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("l", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val p =
        if (row.isNullAt(pIdx)) Array.empty[Byte]
        else row.getAs[Array[Byte]](pIdx)
      if (p.length >= 2 && (p(0) & 0xff) == 'P' && (p(1) & 0xff) == '6')
        parsePpmHeader(p).toSeq.flatMap { case (w, h, off) =>
          if (off + w * h * 3 > p.length) Seq.empty[Row]
          else (0 until w * h).map { i =>
            val o = off + 3 * i
            Row(row.getLong(idIdx),
              2126L * (p(o) & 0xff) + 7152L * (p(o + 1) & 0xff) +
                722L * (p(o + 2) & 0xff))
          }
        }
      else Seq.empty[Row]
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** OTSU binarization threshold per image (Otsu 1979) — over the
    * [[lumaPixels]] rows: the luma value that maximizes between-class
    * variance σ²_B = (s0·n1 − s1·n0)² / (n²·n0·n1), computed on the
    * q275 gini-stump two-stage integer ladder (d·10⁶ div n0·n1, times
    * d again, div n²·10⁶ — all DECIMAL(38,0), no floats) with the
    * (score DESC, value ASC) argmax: the document-vs-background
    * separator quality card for scanned/synthetic image QA ("is there
    * a bimodal split at all, and where?"). Thresholds with an empty
    * right class are excluded (zero denominator); an image whose
    * pixels are all one value emits no row.
    *
    * Shape at scale: one (id, value) tally shuffle, one per-image
    * cumulative window over ≤ distinct-values rows (bounded by
    * pixels/image), one struct-max argmax — no driver state. */
  def otsuCard(pixels: DataFrame, idCol: String,
      lCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val g = pixels
      .groupBy(col(idCol), col(lCol).as("v__"))
      .agg(count(lit(1)).as("cnt__"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = Window.partitionBy(col(idCol))
    val sc = g
      .withColumn("cumn__", sum(col("cnt__")).over(w).cast("long"))
      .withColumn("cums__",
        sum(col("v__") * col("cnt__")).over(w).cast("long"))
      .withColumn("n__", sum(col("cnt__")).over(p).cast("long"))
      .withColumn("s__",
        sum(col("v__") * col("cnt__")).over(p).cast("long"))
      .filter(col("n__") - col("cumn__") > 0)
      .withColumn("d__",
        abs(dec(col("cums__")) * (col("n__") - col("cumn__")) -
          dec(col("s__") - col("cums__")) * col("cumn__")))
      .withColumn("score__",
        call_function("div",
          call_function("div", col("d__") * lit(1000000L),
            dec(col("cumn__")) * (col("n__") - col("cumn__"))) *
            col("d__"),
          dec(col("n__")) * col("n__") * lit(1000000L)).cast("long"))
    sc.groupBy(col(idCol))
      .agg(first(col("n__")).as("n_px"),
        max(struct(col("score__"), (-col("v__")).as("nv__"),
          col("cumn__").as("nb__"))).as("b__"))
      .select(col(idCol), col("n_px"),
        (-col("b__.nv__")).as("otsu_l"),
        col("b__.nb__").as("n_below"),
        col("b__.score__").as("score_between"))
  }

  val contrastCardSchema: StructType = StructType(Seq(
    StructField("n_px", LongType, nullable = true),
    StructField("sum_l", LongType, nullable = true),
    StructField("sumsq_l", LongType, nullable = true),
    StructField("min_l", LongType, nullable = true),
    StructField("max_l", LongType, nullable = true)))

  /** Per-image LUMA CONTRAST card over REAL P6/PPM pixel decode — the
    * "is this image blank / low-contrast?" curation filter: per
    * pixel the BT.709 integer luma (2126·R + 7152·G + 722·B, e4 of
    * the 0..255 scale — weights sum to 10⁴ so no division enters),
    * then n, Σl, Σl², min, max as exact longs. Dynamic range is
    * max−min; the RMS-contrast variance numerator n·Σl²−(Σl)² stays
    * for the caller (128-bit there — Σl² alone is long-safe to ~1.4M
    * pixels/image, the documented per-image bound). Non-PPM or
    * corrupt payloads yield NULL stats (the parseWav contract — no
    * fabricated pixels).
    *
    * Shape at scale: the [[pixelFeatures]] narrow per-partition map —
    * one row per image in, one out, no shuffle. */
  def contrastCard(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +:
        contrastCardSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val p =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      val stats =
        if (p.length >= 2 && (p(0) & 0xff) == 'P' && (p(1) & 0xff) == '6')
          parsePpmHeader(p).flatMap { case (w, h, off) =>
            if (off + w * h * 3 > p.length) None
            else {
              var i = 0
              var sum = 0L
              var sumSq = 0L
              var mn = Long.MaxValue
              var mx = Long.MinValue
              while (i < w * h) {
                val o = off + 3 * i
                val l = 2126L * (p(o) & 0xff) + 7152L * (p(o + 1) & 0xff) +
                  722L * (p(o + 2) & 0xff)
                sum += l
                sumSq += l * l
                if (l < mn) mn = l
                if (l > mx) mx = l
                i += 1
              }
              Some((w.toLong * h, sum, sumSq, mn, mx))
            }
          }
        else None
      stats match {
        case Some((n, s, ss, mn, mx)) =>
          Row(row.getLong(idIdx), n, s, ss, mn, mx)
        case None =>
          Row(row.getLong(idIdx), null, null, null, null, null)
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("peak_abs", IntegerType, nullable = true),
    StructField("rms", DoubleType, nullable = true)))

  /** Audio feature extraction — REAL end-to-end for PCM16 WAV (the
    * container parse and sample decode are both actual byte-level
    * implementations, not stubs). Same per-partition narrow-map plan
    * shape as [[extractFeatures]]. */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +:
        audioFeatureSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      val (fmt, ch, sr, bits, frames, durMs, peak, rms) = parseWav(payload)
      Row(row.getLong(idIdx), payload.length.toLong, fmt,
        ch.map(Int.box).orNull, sr.map(Int.box).orNull,
        bits.map(Int.box).orNull, frames.map(Long.box).orNull,
        durMs.map(Long.box).orNull, peak.map(Int.box).orNull,
        rms.map(Double.box).orNull)
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Nearest-neighbor resample of a [[decodeToRgb]] decode re-encoded
    * as PPM-P6 — the same exact integer index math as [[resizePpm]]
    * (srcY = y·h div outH), and PPM output makes the resampled payload
    * byte-deterministic (PNG re-encode would be codec-dependent). */
  def resizeRgbToPpm(w: Int, h: Int, rgb: Array[Int],
      outW: Int, outH: Int): Array[Byte] = {
    val header = s"P6\n$outW $outH\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + outW * outH * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    var o = header.length
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        val v = rgb(sy * w + sx)
        out(o) = ((v >> 16) & 0xff).toByte
        out(o + 1) = ((v >> 8) & 0xff).toByte
        out(o + 2) = (v & 0xff).toByte
        o += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** A demuxed Y4M stream: pixel dims, colorspace tag, and one byte
    * slice per frame (planar Y then Cb then Cr, no compression). */
  final case class Y4mVideo(width: Int, height: Int, colorspace: String,
      frames: Seq[(Int, Array[Byte])])

  /** REAL video frame demux for the YUV4MPEG2 (Y4M) container — the
    * one video format readable with zero codecs (plain-ASCII stream
    * header `YUV4MPEG2 W.. H.. F..` + `FRAME...\n`-delimited
    * uncompressed planar YCbCr frames; mjpegtools' interchange format).
    * Frame byte size follows the colorspace tag: C420* = W·H·3/2,
    * C422 = 2·W·H, C444 = 3·W·H, Cmono = W·H (C420 when absent, per
    * spec). Returns None — never fabricated frames — when the magic,
    * a dimension, a FRAME marker, or a frame's byte budget is missing
    * or malformed (the corrupt-path contract). */
  def parseY4m(payload: Array[Byte]): Option[Y4mVideo] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (payload.length < magic.length + 1 ||
        !payload.take(magic.length).sameElements(magic)) return None
    val hdrEnd = payload.indexOf('\n'.toByte)
    if (hdrEnd < 0) return None
    val params = new String(payload, 0, hdrEnd, "US-ASCII")
      .split(' ').drop(1).filter(_.nonEmpty)
    def tagged(c: Char): Option[String] =
      params.find(_.head == c).map(_.tail)
    val wh = for {
      w <- tagged('W').flatMap(_.toIntOption) if w > 0
      h <- tagged('H').flatMap(_.toIntOption) if h > 0
    } yield (w, h)
    wh.flatMap { case (w, h) =>
      val cs = tagged('C').getOrElse("420")
      val frameLen: Option[Long] = cs match {
        case c if c.startsWith("420") =>
          // 2x2-subsampled chroma needs even dims to tile
          if (w % 2 == 0 && h % 2 == 0) Some(w.toLong * h * 3 / 2) else None
        case c if c.startsWith("422") =>
          if (w % 2 == 0) Some(w.toLong * h * 2) else None
        case c if c.startsWith("444") => Some(w.toLong * h * 3)
        case c if c.startsWith("mono") => Some(w.toLong * h)
        case _ => None
      }
      frameLen.filter(_ <= Int.MaxValue.toLong).flatMap { fl =>
        val fLen = fl.toInt
        val fm = "FRAME".getBytes("US-ASCII")
        val out = Seq.newBuilder[(Int, Array[Byte])]
        var pos = hdrEnd + 1
        var idx = 0
        var bad = false
        while (!bad && pos < payload.length) {
          // each frame: "FRAME" [ ' 'params... ] '\n' then fLen bytes
          if (pos + fm.length > payload.length ||
              !payload.slice(pos, pos + fm.length).sameElements(fm)) {
            bad = true
          } else {
            val nl = payload.indexOf('\n'.toByte, pos + fm.length)
            if (nl < 0 || nl + 1 + fLen > payload.length) bad = true
            else {
              out += idx -> payload.slice(nl + 1, nl + 1 + fLen)
              pos = nl + 1 + fLen
              idx += 1
            }
          }
        }
        if (bad) None else Some(Y4mVideo(w, h, cs, out.result()))
      }
    }
  }

  /** Resize pipeline: (id, payload) -> (id, resized payload, w, h) via
    * per-partition iteration — same plan shape as `extractFeatures`.
    * REAL for every decodable raster: PPM resamples byte-level
    * ([[resizePpm]]); compressed formats (PNG/JPEG/GIF/BMP) decode
    * through `javax.imageio` ([[decodeToRgb]]) and resample with the
    * identical integer math ([[resizeRgbToPpm]]). Both paths re-encode
    * as PPM-P6 so the output payload is byte-deterministic. Payloads no
    * codec can read emit a NULL payload (the corrupt-path contract —
    * no fabricated bytes). */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      val resized = resizePpm(payload, w, h)
        .orElse(decodeToRgb(payload).map { case (sw, sh, rgb) =>
          resizeRgbToPpm(sw, sh, rgb, w, h) })
        .orNull
      Row(row.getLong(idIdx), resized, w, h)
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sample pipeline: REAL Y4M demux ([[parseY4m]]), one output
    * row per kept (every `stride`-th) frame — the explode-shaped
    * multimodal op (id, frame_idx, width, height, frame). Non-Y4M /
    * corrupt payloads emit no rows (never fabricated frames). Narrow
    * map, no shuffle; frames materialize one row at a time. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      parseY4m(payload).iterator.flatMap { v =>
        v.frames.iterator.filter(_._1 % stride == 0).map { case (f, bytes) =>
          Row(row.getLong(idIdx), f, v.width, v.height, bytes)
        }
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame luma/chroma accounting over a Y4M column: one row per
    * frame with the Y-plane byte sum and the combined chroma-plane
    * byte sum (for Cmono, chroma is 0) — the cheap per-frame signal a
    * video curation pass filters on (all-black / frozen-frame /
    * exposure drift detection) before any expensive model sees the
    * pixels. Same narrow demux map as [[frameSample]]. */
  def y4mFrameStats(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("y_sum", LongType, nullable = false),
      StructField("c_sum", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      parseY4m(payload).iterator.flatMap { v =>
        val ySize = v.width * v.height
        v.frames.iterator.map { case (f, bytes) =>
          var ySum = 0L
          var cSum = 0L
          var i = 0
          while (i < bytes.length) {
            if (i < ySize) ySum += bytes(i) & 0xff else cSum += bytes(i) & 0xff
            i += 1
          }
          Row(row.getLong(idIdx), f, v.width, v.height, ySum, cSum)
        }
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** SILENCE-TRIM card over a PCM16/WAV column — the VAD-lite first
    * pass of an audio curation pipeline (trim leading/trailing quiet,
    * drop mostly-quiet clips before any expensive model): frames from
    * [[frameZcr]], a frame is QUIET when its summed |v − midline|
    * deviation sits below `devThreshold`, and the per-clip card is
    * (n_frames, n_quiet, lead_quiet, trail_quiet) where lead/trail
    * count the quiet run at each edge (= the trim offsets in frames;
    * both equal n_frames when every frame is quiet). Pure conditional
    * aggregates over the frame stream — no window, map-side
    * combinable, one shuffle per corpus. */
  def silenceTrim(df: DataFrame, idCol: String, payloadCol: String,
      frameSamples: Int, midline: Long,
      devThreshold: Long): DataFrame = {
    val quiet = col("sum_dev") < devThreshold
    frameZcr(df, idCol, payloadCol, frameSamples, midline)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(quiet, 1L).otherwise(0L)).as("n_quiet"),
        min(when(!quiet, col("frame"))).as("fl__"),
        max(when(!quiet, col("frame"))).as("ll__"))
      .select(col(idCol), col("n_frames"), col("n_quiet"),
        coalesce(col("fl__"), col("n_frames")).as("lead_quiet"),
        coalesce(col("n_frames") - 1 - col("ll__"), col("n_frames"))
          .as("trail_quiet"))
  }

  /** Scene-cut detection over a Y4M column — the standard first pass
    * of a video curation pipeline (segment at cuts, then sample/dedup
    * per scene instead of per raw frame): demux per-frame luma sums
    * ([[y4mFrameStats]]) and flag every frame whose total-luma jump
    * from the previous frame reaches `thrNum/thrDen` of the frame's
    * full-scale luma budget (width·height·255). Exact integer test —
    * |Δ|·thrDen ≥ thrNum·W·H·255 — so the flag is engine-portable.
    * Frame 0 has no predecessor: delta NULL, never a cut (a cut is a
    * transition, not a start). One narrow demux map + one per-video
    * window; videos are independent, so the window shuffle partitions
    * by id and no video's frames cross executors. */
  def sceneChanges(df: DataFrame, idCol: String, payloadCol: String,
      thrNum: Long, thrDen: Long): DataFrame = {
    require(thrNum >= 0 && thrDen > 0, "need thrNum >= 0 and thrDen > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    y4mFrameStats(df, idCol, payloadCol)
      .select(col(idCol), col("frame_idx"), col("width"), col("height"),
        col("y_sum"),
        (col("y_sum") - lag(col("y_sum"), 1).over(w)).as("delta"))
      .select(col(idCol), col("frame_idx"), col("y_sum"), col("delta"),
        coalesce(
          abs(col("delta")) * thrDen >=
            col("width").cast("long") * col("height") * 255L * thrNum,
          lit(false)).as("is_cut"))
  }

  /** Attach a binary payload column + extract header features per
    * partition — byte length, boundary bytes, and the REAL container-
    * header parse ([[parseImageHeader]]). `idCol` long id, `payloadCol`
    * binary. Output: id + featureSchema. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: featureSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val payload =
          if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
        val (fmt, w, h) = parseImageHeader(payload)
        Row(id, payload.length.toLong,
          (if (payload.nonEmpty) Int.box(payload(0) & 0xff) else null): Any,
          (if (payload.nonEmpty) Int.box(payload(payload.length - 1) & 0xff)
           else null): Any,
          fmt, w.map(Int.box).orNull, h.map(Int.box).orNull)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
