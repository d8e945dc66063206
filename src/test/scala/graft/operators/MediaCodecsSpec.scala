package graft.operators

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Format-level contracts of the pure-JVM media decoders, cross-checked
  * against INDEPENDENT readers where the JDK ships one: javax.sound's WAV
  * reader for the synthesized audio payloads, ImageIO's BMP codec for the
  * bitmap path. The loud-failure policy (bad magic, truncation,
  * unsupported variants) is pinned per format. */
class MediaCodecsSpec extends SparkSpec {

  private def wavBytesOf(text: String): Array[Byte] = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(Multimodal.wavPayload(col("text")).as("p"))
      .head.getAs[Array[Byte]](0)
  }

  private def ppmBytesOf(text: String): Array[Byte] = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(Multimodal.ppmPayload(col("text")).as("p"))
      .head.getAs[Array[Byte]](0)
  }

  // ------------------------------------------------------------------ WAV

  test("synthesized WAV parses with the JDK's own javax.sound reader") {
    val text = "hello media pipeline, this is eight-bit pcm"
    val bytes = wavBytesOf(text)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleRate === 8000.0f)
    assert(fmt.getSampleSizeInBits === 8)
    assert(in.getFrameLength === text.length.toLong)
    val pcm = in.readAllBytes()
    assert(pcm === text.getBytes(US_ASCII),
      "the data chunk must be the text bytes verbatim")
  }

  test("WAV decode agrees with a brute-force reference over the text bytes") {
    val text = ("the quick brown fox " * 9).trim // 179 chars -> odd, padded
    val bytes = wavBytesOf(text)
    assert(bytes.length % 2 === 0, "odd data must get the RIFF pad byte")
    val got = new WavPcmCodec().decodeFrames(bytes, 64, 4)
    val amps = text.getBytes(US_ASCII).map(b => (b & 0xff) - 128)
    val expected = amps.grouped(64).zipWithIndex.collect {
      case (w, i) if i % 4 == 0 =>
        AudioFrame(i, w.length, w.map(_.toLong).sum,
          w.map(math.abs).max, w.map(a => a.toLong * a).sum)
    }.toArray
    assert(got === expected)
  }

  test("WAV chunk walk skips unknown chunks (LIST before data)") {
    val text = "abcdefgh"
    val canonical = new WavPcmCodec().decodeFrames(wavBytesOf(text), 4, 1)
    // hand-build: RIFF [fmt ] [LIST 6 bytes] [data]
    val data = text.getBytes(US_ASCII)
    val bb = java.nio.ByteBuffer
      .allocate(12 + 24 + 14 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + 14 + data.length)
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("LIST".getBytes(US_ASCII)).putInt(6)
      .put("INFOxx".getBytes(US_ASCII))
    bb.put("data".getBytes(US_ASCII)).putInt(data.length).put(data)
    val got = new WavPcmCodec().decodeFrames(bb.array(), 4, 1)
    assert(got === canonical)
  }

  test("WAV 16-bit signed LE mono decodes with true signed amplitudes") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5, -5, 300)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16).putShort(1).putShort(1)
      .putInt(16000).putInt(32000).putShort(2).putShort(16)
    bb.put("data".getBytes(US_ASCII)).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val got = new WavPcmCodec().decodeFrames(bb.array(), 4, 1)
    assert(got.length === 2)
    assert(got(0) === AudioFrame(0, 4,
      0L + 1000 - 1000 + 32767, 32767,
      1000L * 1000 * 2 + 32767L * 32767))
    assert(got(1) === AudioFrame(1, 4,
      -32768L + 5 - 5 + 300, 32768,
      32768L * 32768 + 25L * 2 + 300L * 300))
  }

  test("WAV loud failures: bad magic, stereo, truncated data, overrun chunk") {
    val good = wavBytesOf("some pcm audio content")
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    def decodeMsg(b: Array[Byte]): String =
      intercept[IllegalArgumentException] {
        new WavPcmCodec().decodeFrames(b, 64, 4)
      }.getMessage
    assert(decodeMsg(corrupt(c => c(0) = 'X'.toByte)).contains("RIFF"))
    assert(decodeMsg(corrupt(c => c(8) = 'X'.toByte)).contains("WAVE"))
    assert(decodeMsg(corrupt(c => c(22) = 2)).contains("channels"))
    assert(decodeMsg(corrupt(c => c(20) = 3)).contains("format"))
    // data chunk claims more bytes than the file holds
    assert(decodeMsg(good.dropRight(4)).contains("overruns"))
  }

  // ------------------------------------------------------------------ PPM

  test("PPM decode agrees with a brute-force reference, incl. padding") {
    val text = "x" * 100 // 100 bytes -> h=3, 44 pad spaces
    val bytes = ppmBytesOf(text)
    val got = new StandardImageCodec().decode(bytes)
    assert(got.width === 16 && got.height === 3)
    val raster = text.getBytes(US_ASCII).padTo(144, ' '.toByte)
    def chan(c: Int) = raster.zipWithIndex.collect {
      case (b, i) if i % 3 == c => b & 0xff
    }
    assert(got.r_sum === chan(0).map(_.toLong).sum)
    assert(got.g_sum === chan(1).map(_.toLong).sum)
    assert(got.b_sum === chan(2).map(_.toLong).sum)
    assert(got.r_min === chan(0).min && got.r_max === chan(0).max)
    assert(got.b_min === chan(2).min && got.b_max === chan(2).max)
  }

  test("PPM header: comments and arbitrary whitespace per the netpbm spec") {
    val raster = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 10).toByte)
    val header = "P6 # a comment\n# another\n 2\t2 #dims\n255\n"
    val bytes = header.getBytes(US_ASCII) ++ raster
    val got = Ppm.decode(bytes)
    assert(got.width === 2 && got.height === 2)
    assert(got.r_sum === (0 + 30 + 60 + 90))
  }

  test("PPM loud failures: magic, maxval, truncated raster, bad dimension") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Ppm.decode(b)).getMessage
    assert(msg("P5\n1 1\n255\nxxx".getBytes(US_ASCII)).contains("P6"))
    assert(msg("P6\n1 1\n65535\nxxxxxx".getBytes(US_ASCII)).contains("maxval"))
    assert(msg("P6\n4 4\n255\nshort".getBytes(US_ASCII)).contains("raster"))
    assert(msg("P6\n-3 4\n255\nxxx".getBytes(US_ASCII)).contains("dimensions"))
    assert(msg("P6\nwide 4\n255\nxxx".getBytes(US_ASCII)).contains("malformed"))
  }

  // ------------------------------------------------------------------ BMP

  test("BMP decode agrees with ImageIO on an ImageIO-written bitmap") {
    val w = 7
    val h = 5 // stride 24 -> 3 pad bytes per row exercises stride logic
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 91) % 256 << 16) |
        ((x * 53 + y * 17) % 256 << 8) | ((x * 11 + y * 71) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val got = new StandardImageCodec().decode(bos.toByteArray)
    assert(got.width === w && got.height === h)
    val rgb = for (y <- 0 until h; x <- 0 until w) yield img.getRGB(x, y)
    assert(got.r_sum === rgb.map(p => (p >> 16) & 0xff).map(_.toLong).sum)
    assert(got.g_sum === rgb.map(p => (p >> 8) & 0xff).map(_.toLong).sum)
    assert(got.b_sum === rgb.map(p => p & 0xff).map(_.toLong).sum)
    assert(got.r_max === rgb.map(p => (p >> 16) & 0xff).max)
    assert(got.b_min === rgb.map(p => p & 0xff).min)
  }

  test("BMP top-down (negative height) decodes identically") {
    // hand-build 2x2 24bpp, height = -2 (top-down), stride 8
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(-2).putShort(1).putShort(24).putInt(0)
      .putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // rows in image order (top-down): pixels BGR
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 0, 0, // row 0 + pad
      70, 80, 90, 100, 110, 120, 0, 0)                 // row 1 + pad
    bb.put(px)
    val got = Bmp.decode(bb.array())
    assert(got.width === 2 && got.height === 2)
    assert(got.b_sum === (10L + 40 + 70 + 100))
    assert(got.g_sum === (20L + 50 + 80 + 110))
    assert(got.r_sum === (30L + 60 + 90 + 120))
  }

  test("BMP loud failures: magic, bpp, compression") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Bmp.decode(b)).getMessage
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR), "bmp", bos)
    val good = bos.toByteArray
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    assert(msg(corrupt(c => c(0) = 'X')).contains("magic"))
    assert(msg(corrupt(c => c(28) = 8)).contains("bpp"))
    assert(msg(corrupt(c => c(30) = 1)).contains("compressed"))
  }

  test("image magic dispatch rejects unknown formats loudly") {
    val ex = intercept[IllegalArgumentException] {
      new StandardImageCodec().decode("GIF89a....".getBytes(US_ASCII))
    }
    assert(ex.getMessage.contains("magic"))
  }

  // --------------------------------------------------------------- raster

  test("raster: PPM and BMP containers normalize to identical RGB") {
    val w = 4
    val h = 3
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 29 + 5) % 256).toByte)
    val ppm = s"P6\n$w $h\n255\n".getBytes(US_ASCII) ++ rgb
    // the same pixels through ImageIO's BMP writer (bottom-up BGR strided)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
        ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val codec = new StandardImageCodec()
    val fromPpm = codec.raster(ppm)
    val fromBmp = codec.raster(bos.toByteArray)
    assert(fromPpm.width === w && fromPpm.height === h)
    assert(fromBmp.width === w && fromBmp.height === h)
    assert(fromPpm.rgb.toSeq === rgb.toSeq)
    assert(fromBmp.rgb.toSeq === rgb.toSeq)
  }

  test("boxResize: floor-mean blocks, ragged bottom edge averages what exists") {
    val w = 16
    val h = 5 // 4x4 factor -> 4x2 output, bottom blocks only 1 row tall
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 7 + 3) % 251).toByte)
    val out = ImageOps.boxResize(ImageRaster(w, h, rgb), 4, 4)
    assert(out.width === 4 && out.height === 2)
    for (by <- 0 until 2; bx <- 0 until 4; c <- 0 until 3) {
      val ys = (by * 4) until math.min(h, by * 4 + 4)
      val xs = (bx * 4) until math.min(w, bx * 4 + 4)
      val vals = for (y <- ys; x <- xs) yield rgb((y * w + x) * 3 + c) & 0xff
      val want = vals.map(_.toLong).sum / vals.length // floor mean
      val got = out.rgb((by * 4 + bx) * 3 + c) & 0xff
      assert(got.toLong === want, s"block ($bx,$by) chan $c")
    }
  }

  test("resize to 1x1 equals the whole-image floor mean per channel") {
    val text = "mixed Content 123 with SOME Spread!"
    val bytes = ppmBytesOf(text)
    val codec = new StandardImageCodec()
    val r = codec.raster(bytes)
    val one = ImageOps.boxResize(r, r.width, r.height)
    assert(one.width === 1 && one.height === 1)
    val stats = codec.decode(bytes)
    val n = r.width.toLong * r.height
    assert((one.rgb(0) & 0xff).toLong === stats.r_sum / n)
    assert((one.rgb(1) & 0xff).toLong === stats.g_sum / n)
    assert((one.rgb(2) & 0xff).toLong === stats.b_sum / n)
  }

  // ------------------------------------------------------------------ Y4M

  private def y4mBytesOf(text: String): Array[Byte] = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(Multimodal.y4mPayload(col("text")).as("p"))
      .head.getAs[Array[Byte]](0)
  }

  test("synthesized Y4M decodes: brute-force reference over the text bytes") {
    val text = ("frame sample me " * 17).trim // 271 chars -> 3 frames, padded
    val bytes = y4mBytesOf(text)
    assert(new String(bytes.take(9), US_ASCII) === "YUV4MPEG2")
    val got = new Y4mCodec().sampleFrames(bytes, 2)
    val padded = text.getBytes(US_ASCII).padTo(3 * 96, ' '.toByte)
    val expected = padded.grouped(96).zipWithIndex.collect {
      case (f, i) if i % 2 == 0 =>
        val planes = f.map(_ & 0xff).grouped(32).toArray
        VideoFrameStats(i, 32, planes(0).map(_.toLong).sum, planes(0).max,
          planes(1).map(_.toLong).sum, planes(2).map(_.toLong).sum)
    }.toArray
    assert(got === expected)
    // sampleEvery=1 keeps all three frames; =3 keeps frame 0 only
    assert(new Y4mCodec().sampleFrames(bytes, 1).map(_.frame_idx) ===
      Array(0, 1, 2))
    assert(new Y4mCodec().sampleFrames(bytes, 3).map(_.frame_idx) === Array(0))
  }

  test("Y4M header: unknown parameters skipped, C420 quarter chroma planes") {
    // hand-built 4x2 C420 stream: Y=8 bytes, U=V=2 bytes, 2 frames
    def frame(seed: Int): Array[Byte] =
      "FRAME\n".getBytes(US_ASCII) ++
        Array.tabulate[Byte](12)(i => ((seed + i * 11) % 200 + 10).toByte)
    val hdr = "YUV4MPEG2 W4 H2 F30:1 It A0:0 C420jpeg Xgraft-meta\n"
    val stream = hdr.getBytes(US_ASCII) ++ frame(1) ++ frame(100)
    val got = new Y4mCodec().sampleFrames(stream, 1)
    assert(got.length === 2)
    for ((f, seed) <- got.zip(Seq(1, 100))) {
      val bytes = Array.tabulate(12)(i => (seed + i * 11) % 200 + 10)
      assert(f.n_pixels === 8)
      assert(f.y_sum === bytes.take(8).map(_.toLong).sum)
      assert(f.y_peak === bytes.take(8).max)
      assert(f.u_sum === bytes.slice(8, 10).map(_.toLong).sum)
      assert(f.v_sum === bytes.slice(10, 12).map(_.toLong).sum)
    }
    // the spec's default colorspace (no C tag) is 420jpeg — same planes
    val noC = ("YUV4MPEG2 W4 H2 F30:1\n".getBytes(US_ASCII)
      ++ frame(1) ++ frame(100))
    assert(new Y4mCodec().sampleFrames(noC, 1) === got)
  }

  test("Y4M loud failures: magic, colorspace, odd C420 dims, truncation") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](
        new Y4mCodec().sampleFrames(b, 1)).getMessage
    val ok = y4mBytesOf("x" * 96)
    assert(msg("JUNK4MPEG2 W8 H4\nFRAME\n".getBytes(US_ASCII) ++
      new Array[Byte](96)).contains("magic"))
    assert(msg("YUV4MPEG2 W8 H4 C999\n".getBytes(US_ASCII))
      .contains("unsupported"))
    assert(msg("YUV4MPEG2 W3 H2 C420\nFRAME\n".getBytes(US_ASCII) ++
      new Array[Byte](9)).contains("even dimensions"))
    assert(msg("YUV4MPEG2 W8 H4\n".getBytes(US_ASCII)).contains("no frames"))
    assert(msg(ok.dropRight(1)).contains("plane bytes"))
    assert(msg(ok ++ "GARBAGE".getBytes(US_ASCII)).contains("FRAME header"))
  }

  // ---------------------------------------------- conformance corners (r9)

  test("Y4M interlacing flags: Ip/It/Ib/I? accepted (same bytes), Im loud-fails") {
    val body = "FRAME\n".getBytes(US_ASCII) ++
      Array.tabulate(96)(i => (i % 251).toByte)
    def stream(hdr: String): Array[Byte] = hdr.getBytes(US_ASCII) ++ body
    val base = new Y4mCodec().sampleFrames(stream("YUV4MPEG2 W8 H4 C444\n"), 1)
    // one full picture per FRAME regardless of field order — identical
    // stats for progressive, tff, bff, and unknown
    for (i <- Seq("Ip", "It", "Ib", "I?")) {
      val got = new Y4mCodec().sampleFrames(
        stream(s"YUV4MPEG2 W8 H4 $i C444\n"), 1)
      assert(got === base, s"$i changed the decode")
    }
    val e = intercept[IllegalArgumentException](new Y4mCodec().sampleFrames(
      stream("YUV4MPEG2 W8 H4 Im C444\n"), 1))
    assert(e.getMessage.contains("mixed-mode"))
    val e2 = intercept[IllegalArgumentException](new Y4mCodec().sampleFrames(
      stream("YUV4MPEG2 W8 H4 Iz C444\n"), 1))
    assert(e2.getMessage.contains("unknown interlacing"))
  }

  test("Y4M odd dims: C444 accepts them, C420 loud-fails on width AND height") {
    // C444 has no subsampling, so odd geometry is fully defined: 3 planes
    // of w*h each
    val odd = "YUV4MPEG2 W3 H3 C444\nFRAME\n".getBytes(US_ASCII) ++
      Array.tabulate(27)(i => (i + 1).toByte)
    val got = new Y4mCodec().sampleFrames(odd, 1)
    assert(got.length === 1 && got(0).n_pixels === 9)
    assert(got(0).y_sum === (1 to 9).sum.toLong)
    // C420: both odd-width and odd-height are loud, and the message says
    // why (chroma rounding is tool-defined)
    for (dims <- Seq("W3 H2", "W4 H3")) {
      val e = intercept[IllegalArgumentException](new Y4mCodec().sampleFrames(
        s"YUV4MPEG2 $dims C420\nFRAME\n".getBytes(US_ASCII) ++
          new Array[Byte](18), 1))
      assert(e.getMessage.contains("even dimensions"), dims)
    }
  }

  /** Hand-built WAVE_FORMAT_EXTENSIBLE mono 8-bit PCM file. */
  private def extensibleWav(samples: Array[Byte],
      subFormat: Int = 1, guidTailByte: Option[Int] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v); out.write(v >>> 8) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16(v >>> 16) }
    def tag(s: String): Unit = out.write(s.getBytes(US_ASCII))
    val fmtSize = 40
    val dataSize = samples.length
    tag("RIFF"); w32(4 + 8 + fmtSize + 8 + dataSize + (dataSize & 1))
    tag("WAVE")
    tag("fmt "); w32(fmtSize)
    w16(0xFFFE) // WAVE_FORMAT_EXTENSIBLE
    w16(1)      // channels
    w32(8000)   // sample rate
    w32(8000)   // byte rate
    w16(1)      // block align
    w16(8)      // bits per sample
    w16(22)     // cbSize
    w16(8)      // valid bits
    w32(4)      // channel mask
    w16(subFormat); w16(0) // SubFormat GUID data1 low/high
    val tail = Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
      0x00, 0x38, 0x9B, 0x71)
    tail.foreach(b => out.write(guidTailByte.getOrElse(b)))
    tag("data"); w32(dataSize)
    out.write(samples)
    if (dataSize % 2 == 1) out.write(0) // word-align pad
    out.toByteArray
  }

  test("resizeTo: exact geometry, floor means, upscale clamps to nearest") {
    // 2x2 -> 1x1: whole-image floor mean per channel
    val r22 = ImageRaster(2, 2, Array[Byte](
      10, 20, 30,  50, 60, 70,
      90, 100, 110,  (200 - 256).toByte, (210 - 256).toByte, (220 - 256).toByte))
    val one = ImageOps.resizeTo(r22, 1, 1)
    assert((one.rgb(0) & 0xff) === (10 + 50 + 90 + 200) / 4)
    assert((one.rgb(1) & 0xff) === (20 + 60 + 100 + 210) / 4)
    // 1x1 -> 3x3: nearest-neighbor duplication of the single pixel
    val r11 = ImageRaster(1, 1, Array[Byte](7, 8, 9))
    val up = ImageOps.resizeTo(r11, 3, 3)
    assert(up.width === 3 && up.height === 3)
    assert(up.rgb.grouped(3).forall(_.toSeq === Seq[Byte](7, 8, 9)))
    // non-integer ratio (3 -> 2) tiles without dropping pixels: blocks
    // [0,1) and [1,3)
    val r31 = ImageRaster(3, 1, Array[Byte](
      10, 0, 0,  20, 0, 0,  40, 0, 0))
    val two = ImageOps.resizeTo(r31, 2, 1)
    assert((two.rgb(0) & 0xff) === 10 && (two.rgb(3) & 0xff) === (20 + 40) / 2)
  }

  test("dHash: Hamming-stable under 2x upscale, far for distinct images") {
    val text = "perceptual hashing invariance check over this document body " * 4
    val ppm = ppmBytesOf(text)
    val codec = new StandardImageCodec
    val base = codec.raster(ppm)
    // hand-build the 2x-upscaled PPM: each pixel becomes a 2x2 block
    val w2 = base.width * 2
    val h2 = base.height * 2
    val big = new Array[Byte](w2 * h2 * 3)
    for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3)
      big((y * w2 + x) * 3 + c) =
        base.rgb(((y / 2) * base.width + (x / 2)) * 3 + c)
    val header = s"P6\n$w2 $h2\n255\n".getBytes(US_ASCII)
    val bigPpm = header ++ big
    val h1 = Multimodal.dHash(codec, ppm)
    val h2h = Multimodal.dHash(codec, bigPpm)
    assert(h1 !== null)
    // robustness is HAMMING closeness, not bit equality: 9 doesn't divide
    // the doubled width, so area blocks regroup pixels and near-tie
    // gradients may flip a few bits — the perceptual contract is that a
    // rescale stays within a small radius while different images are far
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2h) <= 8,
      s"2x upscale moved the dHash ${ham(h1, h2h)} bits — not perceptual")
    val other = Multimodal.dHash(codec,
      ppmBytesOf("completely different content " * 9))
    assert(ham(h1, other) > 8, s"distinct images only ${ham(h1, other)} apart")
  }

  test("audioFp: hand-computed gradient bits, invariant under amplitude scaling") {
    val codec = new WavPcmCodec
    def wav(amps: Seq[Int]): Array[Byte] =
      extensibleWav(amps.map(a => (128 + a).toByte).toArray)
    // frame i holds amps (i, i): energy 2i^2 strictly increases, so all 9
    // delta bits set
    val up = (0 until 10).flatMap(i => Seq(i, i))
    val fpUp = Multimodal.audioFp(codec, wav(up))
    assert(fpUp === 0x1FFL, f"expected delta bits 0..8 set, got $fpUp%x")
    // doubling every amplitude preserves every gradient SIGN — the
    // perceptual contract (absolute energies all change, the hash doesn't)
    assert(Multimodal.audioFp(codec, wav(up.map(_ * 2))) === fpUp)
    // reversing the clip reverses every gradient: no bits set
    assert(Multimodal.audioFp(codec, wav(up.reverse)) === 0L)
    // deterministic on a synthesized corpus payload
    val p = wavBytesOf("audio fingerprint determinism probe")
    assert(Multimodal.audioFp(codec, p) === Multimodal.audioFp(codec, p))
  }

  test("videoFp: hand-computed lane packing, invariant within a luma cell") {
    val codec = new Y4mCodec
    // 2×1 C444 frames: each frame = 6 plane bytes (2 Y, 2 U, 2 V); the
    // mean-luma cell is floor(y_sum * 16 / (256 * 2))
    def y4m(frameY: Seq[(Int, Int)]): Array[Byte] = {
      val hdr = "YUV4MPEG2 W2 H1 F25:1 Ip A1:1 C444\n"
      val body = frameY.map { case (a, b) =>
        "FRAME\n" + new String(Array(a, b, 7, 7, 7, 7).map(_.toChar))
      }.mkString
      (hdr + body).getBytes("ISO-8859-1")
    }
    // frame 0: Y = (32, 32) → cell floor(64*16/512) = 2
    // frame 1: Y = (160, 160) → cell floor(320*16/512) = 10
    val fp = Multimodal.videoFp(codec, y4m(Seq((32, 32), (160, 160))))
    assert(fp === (2L | (10L << 4)), f"got $fp%x")
    // moving luma WITHIN a cell leaves the fingerprint unchanged (the
    // perceptual property): 33+34 → y_sum 67 → cell 2 still
    assert(Multimodal.videoFp(codec, y4m(Seq((33, 34), (165, 158)))) === fp)
    // crossing a cell boundary changes it
    assert(Multimodal.videoFp(codec, y4m(Seq((64, 64), (160, 160)))) !== fp)
    // a 17th frame XOR-folds into lane 0
    val many = Seq.fill(16)((32, 32)) :+ ((160, 160))
    val base16 = Multimodal.videoFp(codec, y4m(Seq.fill(16)((32, 32))))
    assert(Multimodal.videoFp(codec, y4m(many)) === (base16 ^ 10L))
  }

  test("WAV extensible (0xFFFE) with the PCM subtype GUID decodes as PCM") {
    val text = "extensible pcm conformance corner"
    val plain = wavBytesOf(text)
    val ext = extensibleWav(text.getBytes(US_ASCII))
    val a = new WavPcmCodec().decodeFrames(plain, 16, 1)
    val b = new WavPcmCodec().decodeFrames(ext, 16, 1)
    assert(b === a, "extensible PCM must decode identically to plain PCM")
    // and the JDK agrees the container is well-formed
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(ext))
    assert(in.getFormat.getChannels === 1)
    assert(in.readAllBytes() === text.getBytes(US_ASCII))
  }

  test("WAV extensible loud failures: non-PCM subtype, corrupt GUID, short fmt") {
    val samples = "abcd".getBytes(US_ASCII)
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](
        new WavPcmCodec().decodeFrames(b, 4, 1)).getMessage
    // IEEE-float subtype (3) must not decode as integer PCM
    assert(msg(extensibleWav(samples, subFormat = 3)).contains("unsupported"))
    // a GUID that is not the media-subtype family is not a format code
    assert(msg(extensibleWav(samples, guidTailByte = Some(0x42)))
      .contains("GUID"))
    // declared extensible but the fmt chunk is too short to hold the GUID
    val short = extensibleWav(samples)
    // patch fmt size down to 16: chunk walk then reads it as a plain fmt
    short(16) = 16
    // rebuild is messy — instead assert the honest path: a 16-byte fmt
    // claiming 0xFFFE has no GUID to dispatch on and must fail loudly
    val e = intercept[IllegalArgumentException] {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v); out.write(v >>> 8) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16(v >>> 16) }
      out.write("RIFF".getBytes(US_ASCII)); w32(4 + 8 + 16 + 8 + 4)
      out.write("WAVE".getBytes(US_ASCII))
      out.write("fmt ".getBytes(US_ASCII)); w32(16)
      w16(0xFFFE); w16(1); w32(8000); w32(8000); w16(1); w16(8)
      out.write("data".getBytes(US_ASCII)); w32(4); out.write(samples)
      new WavPcmCodec().decodeFrames(out.toByteArray, 4, 1)
    }
    assert(e.getMessage.contains("needs 40"))
  }
}
