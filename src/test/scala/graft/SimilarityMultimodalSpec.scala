package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.operators.{Multimodal, SimilaritySearch}

class SimilarityMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.1f, 0.0f)),    // closest to 0
    (2L, Array(0.5f, 0.5f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))    // opposite
  ).toDF("vec_id", "embedding")

  test("cosine math in double precision") {
    val out = vecs.filter($"vec_id" === 3L)
      .crossJoin(vecs.filter($"vec_id" === 0L).select($"embedding".as("q")))
      .select(VectorFns.cosine($"embedding", $"q").as("c"))
      .collect()(0).getDouble(0)
    assert(math.abs(out) < 1e-12)
  }

  test("bruteForceTopK orders by cosine desc with id tie-break") {
    val out = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("lshTopK returns a subset of true ranking, query excluded") {
    val out = SimilaritySearch.lshTopK(vecs, "vec_id", "embedding", 0L, 5,
      baseBits = 64, bands = 32)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(0L))
    assert(out.contains(1L)) // near-identical vector must share a band
  }

  test("adaptiveBands tracks the amplification math") {
    // hand-computed from b = ln(1-R)/ln(1-p^16), p = 1 - acos(t)/pi
    assert(SimilaritySearch.adaptiveBands(0.45) == 3055)
    assert(SimilaritySearch.adaptiveBands(0.8) == 116)
    // harder thresholds need more bands; higher targets need more bands
    assert(SimilaritySearch.adaptiveBands(0.3) >
      SimilaritySearch.adaptiveBands(0.6))
    assert(SimilaritySearch.adaptiveBands(0.45, targetRecall = 0.99) >
      SimilaritySearch.adaptiveBands(0.45, targetRecall = 0.9))
    // clamped: near-identical threshold needs almost no bands, floor 16
    assert(SimilaritySearch.adaptiveBands(0.999) == 16)
    // wider bands (more bits) collide less per band -> need more bands
    assert(SimilaritySearch.adaptiveBands(0.6, bitsPerBand = 20) >
      SimilaritySearch.adaptiveBands(0.6, bitsPerBand = 16))
  }

  test("lshIndex + lshProbe equals one-shot lshTopK, index reusable across queries") {
    val index = SimilaritySearch.lshIndex(vecs, "vec_id", "embedding",
      baseBits = 64, bands = 32)
    val oneShot = SimilaritySearch.lshTopK(vecs, "vec_id", "embedding", 0L, 5,
      baseBits = 64, bands = 32).collect().map(_.getLong(0)).toSeq
    val probed = SimilaritySearch.lshProbe(index, vecs, "vec_id", "embedding",
      0L, 5).collect().map(_.getLong(0)).toSeq
    assert(probed == oneShot)
    // the SAME index answers a different query without re-keying: vec 1
    // is near-identical to vec 0 (cos ≈ 0.995), so 0 must surface
    val probed1 = SimilaritySearch.lshProbe(index, vecs, "vec_id", "embedding",
      1L, 5).collect().map(_.getLong(0)).toSet
    assert(!probed1.contains(1L) && probed1.contains(0L))
  }

  test("multimodal resize and frame-sample plumbing") {
    // undecodable bytes: resize emits a NULL payload (corrupt-path
    // contract — no fabricated pixels), target dims still recorded
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "txt")
      .select($"doc_id", $"txt".cast("binary").as("payload"))
    val resized = Multimodal.resize(df, "doc_id", "payload", 4, 3)
      .collect()(0)
    assert(resized.isNullAt(1))
    assert(resized.getInt(2) == 4 && resized.getInt(3) == 3)
    // a real PPM payload resamples for real through the same pipeline
    val ppm = "P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val rs = Multimodal.resize(Seq((2L, ppm)).toDF("doc_id", "payload"),
      "doc_id", "payload", 4, 2).collect()(0)
    assert(Multimodal.decodeImagePixels(rs.getAs[Array[Byte]](1)) ==
      (("ppm", Some(4), Some(2), Some(2L * (2 * 6 + 2 * 15)), Some(1), Some(6))))
    // non-Y4M bytes: frameSample emits NO rows (corrupt-path contract)
    assert(Multimodal.frameSample(df, "doc_id", "payload", stride = 1)
      .count() == 0L)
    // a real Y4M stream demuxes for real: 4x2 C420 = 8 Y + 4 chroma
    // bytes per frame, 3 frames, stride 2 keeps frames 0 and 2
    val y4m = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII") ++
      (0 until 3).flatMap(f => "FRAME\n".getBytes("US-ASCII") ++
        Array.tabulate[Byte](12)(i => (f * 12 + i).toByte)).toArray
    val frames = Multimodal.frameSample(
      Seq((7L, y4m)).toDF("doc_id", "payload"), "doc_id", "payload",
      stride = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getAs[Array[Byte]](4).toSeq))
    assert(frames.toSeq == Seq(
      (0, 4, 2, Array.tabulate[Byte](12)(_.toByte).toSeq),
      (2, 4, 2, Array.tabulate[Byte](12)(i => (24 + i).toByte).toSeq)))
    // per-frame stats: Y plane = first 8 bytes, chroma = last 4
    val stats = Multimodal.y4mFrameStats(
      Seq((7L, y4m)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => (r.getInt(1), r.getLong(4), r.getLong(5)))
    assert(stats.toSeq == Seq(
      (0, (0 to 7).sum.toLong, (8 to 11).sum.toLong),
      (1, (12 to 19).sum.toLong, (20 to 23).sum.toLong),
      (2, (24 to 31).sum.toLong, (32 to 35).sum.toLong)))
    // truncated last frame / bad marker: None, not partial frames
    assert(Multimodal.parseY4m(y4m.dropRight(1)).isEmpty)
    assert(Multimodal.parseY4m("YUV4MPEG2 W4 H2\n".getBytes ++
      "FRUME\n".getBytes ++ new Array[Byte](12)).isEmpty)
    // odd dims under 2x2 subsampling cannot tile: reject
    assert(Multimodal.parseY4m(
      "YUV4MPEG2 W3 H2 C420\nFRAME\n".getBytes ++ new Array[Byte](9))
      .isEmpty)
    // mono colorspace: W*H bytes per frame, zero chroma
    val mono = "YUV4MPEG2 W2 H2 Cmono\nFRAME\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val mv = Multimodal.parseY4m(mono).get
    assert(mv.colorspace == "mono" && mv.frames.map(_._1) == Seq(0))
  }

  test("sceneChanges: luma-delta cuts, frame 0 never a cut") {
    // 3 frames: dark (Y=0), bright (Y=255 -> delta 2040 = full
    // budget), bright again (delta 0). At thr 1/2 only the dark->
    // bright transition is a cut; frame 0's delta is NULL.
    def frm(y: Int) = "FRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(y.toByte) ++ Array.fill[Byte](4)(128.toByte)
    val y4m = "YUV4MPEG2 W4 H2 C420\n".getBytes("US-ASCII") ++
      frm(0) ++ frm(255) ++ frm(255)
    val out = Multimodal.sceneChanges(
      Seq((1L, y4m)).toDF("doc_id", "payload"), "doc_id", "payload",
      thrNum = 1L, thrDen = 2L)
      .orderBy($"frame_idx")
      .collect().map(r => (r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (0, 0L, None, false),
      (1, 2040L, Some(2040L), true),
      (2, 2040L, Some(0L), false)))
  }

  test("extractFeatures: header features incl. null payload") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "txt")
      .select($"doc_id", $"txt".cast("binary").as("payload"))
      .union(Seq((3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload"))
    val out = Multimodal.extractFeatures(df, "doc_id", "payload")
      .select("doc_id", "byte_len", "first_byte", "last_byte", "format")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getString(4))).toMap
    assert(out(1L) == ((3L, Some(97), Some(99), "unknown"))) // 'a'=97, 'c'=99
    assert(out(2L) == ((0L, None, None, "unknown")))
    assert(out(3L) == ((0L, None, None, "unknown")))
  }

  test("decodeToRgb: real javax.imageio PNG decode round-trips the generator") {
    val id = 42L
    val (w, h) = Multimodal.synthDims(id)
    val rgb = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      (Multimodal.synthChannel(id, x, y, 0) << 16) |
        (Multimodal.synthChannel(id, x, y, 1) << 8) |
        Multimodal.synthChannel(id, x, y, 2)
    }
    val png = Multimodal.encodePng(w, h, rgb)
    // it is a real PNG container...
    assert(Multimodal.parseImageHeader(png) == (("png", Some(w), Some(h))))
    // ...and the JDK codec decodes it pixel-exactly (PNG is lossless)
    val Some((dw, dh, drgb)) = Multimodal.decodeToRgb(png)
    assert(dw == w && dh == h)
    assert(drgb.map(_ & 0xffffff).toSeq == rgb.toSeq)
    // decodeImagePixels routes compressed rasters through the codec
    val (fmt, pw, ph, sum, mn, mx) = Multimodal.decodeImagePixels(png)
    val chans = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      yield Multimodal.synthChannel(id, x, y, c)
    assert(fmt == "png" && pw.contains(w) && ph.contains(h))
    assert(sum.contains(chans.map(_.toLong).sum))
    assert(mn.contains(chans.min) && mx.contains(chans.max))
    // resize: codec decode + the exact NN index math, PPM re-encode
    val rs = Multimodal.resizeRgbToPpm(w, h, rgb, 5, 3)
    val expected = for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      yield Multimodal.synthChannel(id, (x * w) / 5, (y * h) / 3, c)
    val (rfmt, rw, rh, rsum, rmn, rmx) = Multimodal.decodeImagePixels(rs)
    assert(rfmt == "ppm" && rw.contains(5) && rh.contains(3))
    assert(rsum.contains(expected.map(_.toLong).sum))
    assert(rmn.contains(expected.min) && rmx.contains(expected.max))
  }

  test("decodeImagePixels: real JPEG decode through the JDK codec") {
    // encode a smooth gradient as JPEG with the JDK writer, decode it
    // back: dims are exact; JPEG is lossy so statistics are asserted
    // within a quantization tolerance rather than bit-exactly (the
    // oracle-exact gate uses lossless PNG — q193)
    val (w, h) = (16, 12)
    val rgb = Array.tabulate(w * h) { i =>
      val g = 64 + 8 * (i % w) / 2 // gentle horizontal ramp
      (g << 16) | (g << 8) | g
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    val (fmt, pw, ph, sum, mn, mx) = Multimodal.decodeImagePixels(jpeg)
    assert(fmt == "jpeg" && pw.contains(w) && ph.contains(h))
    val trueMean = rgb.map(v => ((v >> 16) & 0xff).toLong * 3).sum / (w * h * 3)
    val decMean = sum.get / (w * h * 3)
    assert(math.abs(decMean - trueMean) <= 8,
      s"JPEG mean drifted: $decMean vs $trueMean")
    assert(mn.exists(_ >= 32) && mx.exists(_ <= 160))
  }

  test("parseImageHeader reads real PNG/JPEG/GIF container headers") {
    // PNG: signature + IHDR length + "IHDR" + 640x480 big-endian
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseImageHeader(png) == (("png", Some(640), Some(480))))

    // JPEG: SOI, APP0 segment (skipped), SOF0 with height 480 width 640
    val jpeg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0, 4, 0x4a, 0x46, // APP0 len=4 (2 payload bytes)
      0xff, 0xc0, 0, 11, 8, 0x01, 0xe0, 0x02, 0x80, 3, 0, 0, 0)
      .map(_.toByte)
    assert(Multimodal.parseImageHeader(jpeg) == (("jpeg", Some(640), Some(480))))

    // JPEG with no SOF before SOS: format detected, dims unknown
    val jpegNoSof = Array[Int](0xff, 0xd8, 0xff, 0xda, 0, 2).map(_.toByte)
    assert(Multimodal.parseImageHeader(jpegNoSof) == (("jpeg", None, None)))

    // GIF89a: 320x200 little-endian logical screen descriptor
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xc8, 0x00, 0, 0, 0).map(_.toByte))
    assert(Multimodal.parseImageHeader(gif) == (("gif", Some(320), Some(200))))

    assert(Multimodal.parseImageHeader("just text".getBytes) ==
      (("unknown", None, None)))
    assert(Multimodal.parseImageHeader(Array.empty[Byte]) ==
      (("unknown", None, None)))
  }

  /** Build a genuine PCM16 WAV byte stream. */
  private def wav(sampleRate: Int, channels: Int,
      samples: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("parseWav decodes real PCM16: header, duration, peak, rms") {
    // mono 8 kHz square wave ±1000, 4000 frames = 500 ms; rms == 1000
    val sq = (0 until 4000).map(i => if (i % 2 == 0) 1000 else -1000)
    val (fmt, ch, sr, bits, frames, durMs, peak, rms) =
      Multimodal.parseWav(wav(8000, 1, sq))
    assert((fmt, ch, sr, bits) == (("wav-pcm16", Some(1), Some(8000), Some(16))))
    assert((frames, durMs) == ((Some(4000L), Some(500L))))
    assert(peak.contains(1000))
    assert(rms.contains(1000.0), s"square-wave rms must be exact: $rms")

    // stereo frame accounting: 600 samples = 300 frames at 2 channels
    val st = Multimodal.parseWav(wav(16000, 2, Seq.fill(600)(-32768)))
    assert(st._2.contains(2) && st._5.contains(300L))
    assert(st._7.contains(32768), "Short.MinValue must not overflow abs()")

    // a header declaring an out-of-range sample rate is corrupt:
    // real metadata survives, decode stats are withheld
    val badRate = {
      val b = wav(8000, 1, Seq.fill(10)(3))
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(24, 0xF0000000) // sampleRate field: > Int.MaxValue unsigned
      b
    }
    assert(Multimodal.parseWav(badRate) ==
      (("wav", Some(1), None, Some(16), None, None, None, None)))

    // non-WAV and truncated streams degrade, never throw
    assert(Multimodal.parseWav("plain text".getBytes)._1 == "unknown")
    assert(Multimodal.parseWav(Array.empty[Byte])._1 == "unknown")
    val trunc = wav(8000, 1, Seq.fill(100)(7)).take(50)
    assert(Multimodal.parseWav(trunc)._1 == "wav-pcm16")
  }

  test("decodeImagePixels decodes real PPM-P6 and 24-bit BMP pixels") {
    // PPM: 2x2 RGB, bytes 10..21, with a header comment
    val ppm = "P6\n# c\n2 2\n255\n".getBytes ++ (10 to 21).map(_.toByte)
    assert(Multimodal.decodeImagePixels(ppm) ==
      (("ppm", Some(2), Some(2), Some((10 to 21).sum.toLong), Some(10), Some(21))))
    // truncated pixel data keeps the format, nulls the stats
    assert(Multimodal.decodeImagePixels(ppm.dropRight(1)) ==
      (("ppm", None, None, None, None, None)))

    // BMP: 2x2 24bpp bottom-up, rows padded to 8 bytes; padding bytes
    // (0xEE) must be EXCLUDED from the statistics
    def bmp(topDown: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(54 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
      bb.putInt(40).putInt(2).putInt(if (topDown) -2 else 2)
      bb.putShort(1).putShort(24).putInt(0).putInt(16)
      bb.putInt(0).putInt(0).putInt(0).putInt(0)
      for (r <- 0 until 2) {
        for (i <- 0 until 6) bb.put((30 + r * 6 + i).toByte)
        bb.put(0xEE.toByte).put(0xEE.toByte)
      }
      bb.array()
    }
    assert(Multimodal.decodeImagePixels(bmp(topDown = false)) ==
      (("bmp", Some(2), Some(2), Some((30 to 41).sum.toLong), Some(30), Some(41))))
    assert(Multimodal.decodeImagePixels(bmp(topDown = true)) ==
      (("bmp", Some(2), Some(2), Some((30 to 41).sum.toLong), Some(30), Some(41))))
    // 8bpp (unsupported depth) keeps the tag, nulls the stats
    val bmp8 = { val b = bmp(topDown = false); b(28) = 8; b }
    assert(Multimodal.decodeImagePixels(bmp8) ==
      (("bmp", None, None, None, None, None)))
    // crafted width near 2^31/3: w*3 must not overflow into a negative
    // row size that slips past the truncation guard (long row math)
    val bmpHuge = {
      val b = bmp(topDown = false)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, 715827883)
      b
    }
    assert(Multimodal.decodeImagePixels(bmpHuge) ==
      (("bmp", Some(715827883), Some(2), None, None, None)),
      "truncated huge-width body must yield null stats, not bogus Some")
    assert(Multimodal.decodeImagePixels("plain text".getBytes)._1 == "unknown")
    assert(Multimodal.decodeImagePixels(Array.empty[Byte])._1 == "unknown")
  }

  test("resizePpm: real nearest-neighbor resample, re-encoded PPM") {
    // 2x1 source: left pixel (1,2,3), right pixel (4,5,6)
    val src = "P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val up = Multimodal.resizePpm(src, 4, 2).get
    // result must itself decode as a 4x2 PPM
    val (fmt, w, h, sum, mn, mx) = Multimodal.decodeImagePixels(up)
    assert(fmt == "ppm" && w.contains(4) && h.contains(2))
    // nearest neighbor: columns 0,1 sample src x=0, columns 2,3 src x=1;
    // both output rows sample src y=0 -> sum = 2 rows * 2*(1+2+3) + 2*(4+5+6)
    assert(sum.contains(2L * (2 * 6 + 2 * 15)))
    assert(mn.contains(1) && mx.contains(6))
    // downscale 2x1 -> 1x1 keeps the left pixel (floor index math)
    val down = Multimodal.resizePpm(src, 1, 1).get
    assert(Multimodal.decodeImagePixels(down)._4.contains(6L)) // 1+2+3
    // non-PPM payloads return None (resize() then tries the JDK codec)
    assert(Multimodal.resizePpm("not an image".getBytes, 2, 2).isEmpty)
  }

  test("pixelFeatures: per-partition real decode over a binary column") {
    import spark.implicits._
    val ppm = "P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val rows = Seq((1L, ppm), (2L, "not an image".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.pixelFeatures(
        rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("px_format") == "ppm")
    assert(out(1L).getAs[Long]("px_sum") == 21L)
    assert(out(1L).getAs[Int]("px_min") == 1)
    assert(out(1L).getAs[Int]("px_max") == 6)
    assert(out(2L).getAs[String]("px_format") == "unknown")
    assert(out(3L).getAs[String]("px_format") == "unknown")
  }

  test("audioFeatures: per-partition decode over a binary column") {
    import spark.implicits._
    val rows = Seq(
      (1L, wav(8000, 1, (0 until 800).map(i => if (i % 2 == 0) 500 else -500))),
      (2L, "not audio".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.audioFeatures(
        rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("format") == "wav-pcm16")
    assert(out(1L).getAs[Long]("duration_ms") == 100L)
    assert(out(1L).getAs[Double]("rms") == 500.0)
    assert(out(2L).getAs[String]("format") == "unknown")
    assert(out(3L).getAs[String]("format") == "unknown")
    assert(out(3L).getAs[Long]("byte_len") == 0L)
  }
}
