package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media decoders for the multimodal columns (m02/m03): a real
  * RIFF/WAVE PCM reader and real PPM (P6) / BMP (24bpp) image readers,
  * written from the public format specifications — the same discipline as
  * the BAM v1.6 decoder in [[graft.sources]]. No codec libraries exist in
  * this container, so these cover the self-describing uncompressed formats;
  * compressed formats (JPEG/MP3/…) plug in through the same
  * [[AudioCodec]]/[[ImageCodec]] seams (`spark.graft.codec.audio` /
  * `spark.graft.codec.image`) with a library-backed implementation.
  *
  * All decoders FAIL LOUDLY on malformed input (bad magic, truncated
  * chunks, unsupported variants): at 100 TB a silently-skipped decode
  * error poisons the training corpus downstream.
  */

/** One sampled PCM analysis window's exact-integer statistics. Sums stay
  * integral so the one derived division (mean) happens once downstream —
  * bit-identical regardless of accumulation order (oracle-safe). */
case class AudioFrame(frame_idx: Int, n_samples: Int, sum_amp: Long,
    peak_amp: Int, energy: Long)

/** Whole-image per-channel exact-integer statistics. */
case class ImageStats(width: Int, height: Int,
    r_sum: Long, g_sum: Long, b_sum: Long,
    r_min: Int, g_min: Int, b_min: Int,
    r_max: Int, g_max: Int, b_max: Int)

/** The audio decode seam: parse the container, window the PCM stream, and
  * return statistics for every `sampleEvery`-th window of `windowSamples`
  * samples — the sample-then-decode pattern that never decodes the frames
  * it drops. Implementations must be Serializable: the driver constructs
  * the codec once and ships it inside the decode UDF's closure. */
trait AudioCodec extends Serializable {
  def decodeFrames(payload: Array[Byte], windowSamples: Int,
      sampleEvery: Int): Array[AudioFrame]
  /** The raw recentered mono PCM stream — the input to sample-domain
    * transforms (resampling, filtering). Null payload → null. */
  def samples(payload: Array[Byte]): Array[Int]
}

/** Decoded image pixels: row-major top-down RGB, 3 bytes per pixel —
  * the normalized form every container decodes into (BMP's bottom-up BGR
  * storage is reordered here), so raster-consuming operators (resize,
  * per-pixel features) are container-agnostic. */
case class ImageRaster(width: Int, height: Int, rgb: Array[Byte])

/** The image decode seam (see [[AudioCodec]] for the loading contract).
  * `decode` returns whole-image statistics without materializing pixels;
  * `raster` materializes the normalized RGB pixels for operators that
  * transform the image (resize). */
trait ImageCodec extends Serializable {
  def decode(payload: Array[Byte]): ImageStats
  def raster(payload: Array[Byte]): ImageRaster
}

/** Raster transforms shared by every codec (pure integer arithmetic). */
object ImageOps {

  /** Box-filter downsample by integer factors: output pixel (bx, by) is
    * the mean of the `fx × fy` input block (floor division — exact, so
    * the DuckDB oracle can restate it), edge blocks averaging only the
    * pixels that exist. The standard mipmap/thumbnail kernel. */
  def boxResize(r: ImageRaster, fx: Int, fy: Int): ImageRaster = {
    require(fx > 0 && fy > 0, s"resize factors must be positive: $fx x $fy")
    val ow = (r.width + fx - 1) / fx
    val oh = (r.height + fy - 1) / fy
    val out = new Array[Byte](ow * oh * 3)
    var by = 0
    while (by < oh) {
      var bx = 0
      while (bx < ow) {
        var c = 0
        while (c < 3) {
          var sum = 0L
          var cnt = 0
          var y = by * fy
          val yEnd = math.min(r.height, by * fy + fy)
          while (y < yEnd) {
            var x = bx * fx
            val xEnd = math.min(r.width, bx * fx + fx)
            while (x < xEnd) {
              sum += r.rgb((y * r.width + x) * 3 + c) & 0xff
              cnt += 1
              x += 1
            }
            y += 1
          }
          out((by * ow + bx) * 3 + c) = (sum / cnt).toByte
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    ImageRaster(ow, oh, out)
  }

  /** Horizontal mirror — the cheapest augmentation every image training
    * recipe applies: output (x, y) = input (width−1−x, y), exact byte
    * moves, no arithmetic. */
  def flipH(r: ImageRaster): ImageRaster = {
    val out = new Array[Byte](r.rgb.length)
    var y = 0
    while (y < r.height) {
      var x = 0
      while (x < r.width) {
        val src = (y * r.width + (r.width - 1 - x)) * 3
        val dst = (y * r.width + x) * 3
        out(dst) = r.rgb(src); out(dst + 1) = r.rgb(src + 1)
        out(dst + 2) = r.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    ImageRaster(r.width, r.height, out)
  }

  /** Axis-aligned crop at (x0, y0), clamped to the raster bounds — the
    * fixed-window patch extraction feeding patch-level models. The
    * clamped geometry is part of the contract (an image smaller than
    * the window yields the intersection, never padding). */
  def crop(r: ImageRaster, x0: Int, y0: Int, w: Int, h: Int): ImageRaster = {
    require(x0 >= 0 && y0 >= 0 && w > 0 && h > 0,
      s"crop window must be non-negative and non-empty: ($x0,$y0) ${w}x$h")
    val cw = math.max(0, math.min(r.width - x0, w))
    val ch = math.max(0, math.min(r.height - y0, h))
    val out = new Array[Byte](cw * ch * 3)
    var y = 0
    while (y < ch) {
      System.arraycopy(r.rgb, ((y0 + y) * r.width + x0) * 3,
        out, y * cw * 3, cw * 3)
      y += 1
    }
    ImageRaster(cw, ch, out)
  }

  /** CONTENT-BOX detection (FFmpeg `cropdetect`): the bounding box of
    * pixels at or above `thr`, scanned from each edge — the pass a video
    * training pipeline runs to strip letterbox/pillarbox bars before
    * resize (bars poison both perceptual hashes and patch statistics).
    * Returns (top, bottom, left, right) bar widths plus the content
    * dimensions; an all-dark frame reports full-width bars and a 0×0
    * content box. One pass over the raster per edge pair, pure integer. */
  def contentBox(r: ImageRaster, thr: Int): (Int, Int, Int, Int, Int, Int) = {
    val w = r.width; val h = r.height
    def rowLit(y: Int): Boolean = {
      var i = y * w * 3; val end = i + w * 3
      while (i < end) { if ((r.rgb(i) & 0xff) >= thr) return true; i += 1 }
      false
    }
    def colLit(x: Int): Boolean = {
      var y = 0
      while (y < h) {
        var c = 0
        while (c < 3) {
          if ((r.rgb((y * w + x) * 3 + c) & 0xff) >= thr) return true
          c += 1
        }
        y += 1
      }
      false
    }
    var top = 0; while (top < h && !rowLit(top)) top += 1
    if (top == h) return (h, h, w, w, 0, 0)
    var bot = h - 1; while (bot >= 0 && !rowLit(bot)) bot -= 1
    var lft = 0; while (lft < w && !colLit(lft)) lft += 1
    var rgt = w - 1; while (rgt >= 0 && !colLit(rgt)) rgt -= 1
    (top, h - 1 - bot, lft, w - 1 - rgt, rgt - lft + 1, bot - top + 1)
  }

  /** Area-map resize to an EXACT output geometry (perceptual-hash grids
    * need fixed dimensions; [[boxResize]] fixes the factor instead):
    * output pixel (bx, by) floor-means the input block
    * [bx·w/ow, (bx+1)·w/ow) × [by·h/oh, (by+1)·h/oh) — the blocks tile
    * the image exactly, non-integer ratios distribute remainder pixels
    * deterministically, and an input smaller than the target clamps each
    * empty block to its nearest row/column (nearest-neighbor upscale).
    * Pure integer arithmetic throughout. */
  def resizeTo(r: ImageRaster, ow: Int, oh: Int): ImageRaster = {
    require(ow > 0 && oh > 0, s"resize target must be positive: $ow x $oh")
    val out = new Array[Byte](ow * oh * 3)
    var by = 0
    while (by < oh) {
      val y0 = math.min((by.toLong * r.height / oh).toInt, r.height - 1)
      val y1 = math.max(((by + 1).toLong * r.height / oh).toInt, y0 + 1)
      var bx = 0
      while (bx < ow) {
        val x0 = math.min((bx.toLong * r.width / ow).toInt, r.width - 1)
        val x1 = math.max(((bx + 1).toLong * r.width / ow).toInt, x0 + 1)
        var c = 0
        while (c < 3) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += r.rgb((y * r.width + x) * 3 + c) & 0xff
              x += 1
            }
            y += 1
          }
          out((by * ow + bx) * 3 + c) = (sum / ((y1 - y0) * (x1 - x0))).toByte
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    ImageRaster(ow, oh, out)
  }
}

/** One sampled video frame's exact-integer plane statistics (YCbCr planar
  * layouts: luma sum/peak + chroma sums — integral, oracle-safe). */
case class VideoFrameStats(frame_idx: Int, n_pixels: Int,
    y_sum: Long, y_peak: Int, u_sum: Long, v_sum: Long)

/** The video decode seam (see [[AudioCodec]] for the loading contract):
  * parse the container, FRAME-SAMPLE every `sampleEvery`-th frame, and
  * return per-frame plane statistics. The frames dropped by sampling are
  * never decoded — the reader seeks over them by the container's frame
  * geometry, the pattern that makes sampled feature extraction linear in
  * frames KEPT, not frames stored. */
trait VideoCodec extends Serializable {
  def sampleFrames(payload: Array[Byte], sampleEvery: Int): Array[VideoFrameStats]
}

/** YUV4MPEG2 (".y4m") decoder per the public mjpegtools stream spec: an
  * ASCII stream header `YUV4MPEG2` with space-separated `W`/`H`/`F`/`I`/
  * `A`/`C`/`X` parameters terminated by LF, then per frame an ASCII
  * `FRAME` header line (optional parameters, LF-terminated) followed by
  * raw planar YCbCr bytes. Supported colorspaces: `C444` (three full
  * `w*h` planes) and the `C420` family (full luma + quarter chroma).
  * Uncompressed and self-describing — the video analogue of PPM/WAV, and
  * like them decodable from the spec alone with no codec library. */
final class Y4mCodec extends VideoCodec {
  import Y4mCodec._

  def sampleFrames(payload: Array[Byte], sampleEvery: Int)
      : Array[VideoFrameStats] = {
    if (payload == null) return null
    require(sampleEvery > 0, s"y4m: sampleEvery $sampleEvery must be positive")
    val (w, h, c420, off0) = header(payload)
    val ySize = w * h
    val cSize = if (c420) (w / 2) * (h / 2) else ySize
    val frameBytes = ySize + 2 * cSize
    val out = Array.newBuilder[VideoFrameStats]
    var off = off0
    var idx = 0
    while (off < payload.length) {
      // every frame begins with its own LF-terminated FRAME header line
      if (off + 5 > payload.length ||
          new String(payload, off, 5, US_ASCII) != "FRAME")
        fail(s"frame $idx: missing FRAME header at byte $off")
      off += 5
      while (off < payload.length && payload(off) != '\n') off += 1
      if (off >= payload.length) fail(s"frame $idx: unterminated FRAME header")
      off += 1
      if (off + frameBytes > payload.length)
        fail(s"frame $idx: needs $frameBytes plane bytes, " +
          s"${payload.length - off} present")
      if (idx % sampleEvery == 0) {
        var ySum = 0L
        var yPeak = 0
        var i = off
        val yEnd = off + ySize
        while (i < yEnd) {
          val v = payload(i) & 0xff
          ySum += v
          if (v > yPeak) yPeak = v
          i += 1
        }
        var uSum = 0L
        val uEnd = yEnd + cSize
        while (i < uEnd) { uSum += payload(i) & 0xff; i += 1 }
        var vSum = 0L
        val vEnd = uEnd + cSize
        while (i < vEnd) { vSum += payload(i) & 0xff; i += 1 }
        out += VideoFrameStats(idx, ySize, ySum, yPeak, uSum, vSum)
      }
      off += frameBytes // sample-then-decode: skipped frames are seeked over
      idx += 1
    }
    if (idx == 0) fail("stream contains no frames")
    out.result()
  }
}

object Y4mCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"y4m: $msg")

  /** Validated stream-header parse → (width, height, c420?, first frame
    * offset). Unknown parameter tags (F/I/A/X) are skipped per spec. */
  private def header(b: Array[Byte]): (Int, Int, Boolean, Int) = {
    var eol = 0
    while (eol < b.length && b(eol) != '\n') eol += 1
    if (eol >= b.length) fail("unterminated stream header")
    val line = new String(b, 0, eol, US_ASCII)
    val toks = line.split(' ')
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") fail("missing YUV4MPEG2 magic")
    var w = -1
    var h = -1
    var cs = "420jpeg" // the spec's default colorspace when C is absent
    toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
      (t.head, t.tail) match {
        case ('W', v) => w = scala.util.Try(v.toInt)
          .getOrElse(fail(s"malformed width '$t'"))
        case ('H', v) => h = scala.util.Try(v.toInt)
          .getOrElse(fail(s"malformed height '$t'"))
        case ('C', v) => cs = v
        case ('I', v) =>
          // interlacing: p/t/b/? store one full picture per FRAME — the
          // byte layout this decoder walks is identical, so they are
          // accepted; MIXED mode (Im) moves the interlacing decision into
          // per-frame headers whose semantics we do not implement, and
          // silently decoding it as progressive would mis-attribute
          // fields — loud-fail per the accept-or-loud-fail contract
          if (v == "m") fail(
            "mixed-mode interlacing (Im) unsupported — per-frame field " +
              "parameters change frame semantics")
          else if (v != "p" && v != "t" && v != "b" && v != "?")
            fail(s"unknown interlacing '$t'")
        case _        => () // F/A/X — irrelevant to the byte layout, skip
      }
    }
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h (W and H required)")
    val c420 = cs.startsWith("420")
    if (!c420 && cs != "444") fail(s"colorspace C$cs unsupported (444/420*)")
    // odd-width/height C420 has no spec-defined chroma geometry (the
    // mjpegtools stream spec subsamples exactly 2x2); tools disagree on
    // ceil-vs-floor rounding, so accepting would guess at plane sizes and
    // mis-align every following frame — loud-fail, never mis-decode
    if (c420 && (w % 2 != 0 || h % 2 != 0))
      fail(s"C$cs needs even dimensions, got ${w}x$h " +
        "(odd-dimension chroma rounding is tool-defined, not spec-defined)")
    (w, h, c420, eol + 1)
  }
}

/** RIFF/WAVE PCM decoder (the canonical WAVE spec: RIFF container, `fmt `
  * chunk before `data`, word-aligned chunks). Supports uncompressed
  * integer PCM, mono, 8-bit unsigned or 16-bit signed little-endian —
  * amplitude is recentered per spec (8-bit stores unsigned samples around
  * 128; 16-bit stores signed). Unknown chunks (LIST, fact, …) are skipped
  * by the chunk walk, as a conforming reader must. */
final class WavPcmCodec extends AudioCodec {
  import WavPcmCodec._

  def decodeFrames(payload: Array[Byte], windowSamples: Int,
      sampleEvery: Int): Array[AudioFrame] = {
    if (payload == null) return null
    require(windowSamples > 0 && sampleEvery > 0,
      s"wav: window $windowSamples / sampleEvery $sampleEvery must be positive")
    val pcm = parse(payload)
    val nSamples = pcm.nSamples
    val nWindows = ((nSamples + windowSamples - 1) / windowSamples).toInt
    val out = Array.newBuilder[AudioFrame]
    var w = 0
    while (w < nWindows) {
      if (w % sampleEvery == 0) {
        val start = w * windowSamples
        val end = math.min(start + windowSamples, nSamples).toInt
        var sum = 0L
        var peak = 0
        var energy = 0L
        var i = start
        while (i < end) {
          val amp = pcm.sample(i)
          sum += amp
          val a = math.abs(amp)
          if (a > peak) peak = a
          energy += amp.toLong * amp
          i += 1
        }
        out += AudioFrame(w, end - start, sum, peak, energy)
      }
      w += 1
    }
    out.result()
  }

  def samples(payload: Array[Byte]): Array[Int] = {
    if (payload == null) return null
    val pcm = parse(payload)
    val n = pcm.nSamples.toInt
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = pcm.sample(i); i += 1 }
    out
  }
}

/** Sample-domain transforms shared by every audio codec (pure integer
  * arithmetic, oracle-restatable). */
object AudioOps {

  /** 2× linear-interpolation upsample: originals at even output indices,
    * the floor-midpoint of each adjacent pair between them — length
    * 2n−1. floorDiv (not `/`) so negative midpoints round DOWN, matching
    * the oracle's floor((a+b)/2.0). */
  def upsample2x(in: Array[Int]): Array[Int] = {
    if (in == null) return null
    if (in.length == 0) return in
    val out = new Array[Int](2 * in.length - 1)
    var i = 0
    while (i < in.length - 1) {
      out(2 * i) = in(i)
      out(2 * i + 1) = Math.floorDiv(in(i) + in(i + 1), 2)
      i += 1
    }
    out(2 * i) = in(i)
    out
  }

  /** 2× decimation: every second sample, starting at 0 — length ⌈n/2⌉.
    * (A production pipeline low-pass-filters first; the decimation grid
    * is the contract pinned here.) */
  def downsample2x(in: Array[Int]): Array[Int] = {
    if (in == null) return null
    val out = new Array[Int]((in.length + 1) / 2)
    var i = 0
    while (i < out.length) { out(i) = in(2 * i); i += 1 }
    out
  }
}

object WavPcmCodec {

  /** Parsed PCM view over the payload bytes (no copy — `sample` indexes
    * straight into the data chunk). */
  final case class Pcm(bytes: Array[Byte], dataOff: Int, dataLen: Int,
      channels: Int, sampleRate: Int, bitsPerSample: Int) {
    def nSamples: Long = dataLen.toLong / (bitsPerSample / 8) / channels
    /** Recentered amplitude of mono sample `i`: 8-bit unsigned → v−128,
      * 16-bit signed LE → v. */
    def sample(i: Int): Int =
      if (bitsPerSample == 8) (bytes(dataOff + i) & 0xff) - 128
      else {
        val lo = bytes(dataOff + 2 * i) & 0xff
        val hi = bytes(dataOff + 2 * i + 1)
        (hi << 8) | lo
      }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"wav: $msg")

  def parse(b: Array[Byte]): Pcm = {
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Long = (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def tag(off: Int): String = new String(b, off, 4, US_ASCII)
    if (b.length < 12 || tag(0) != "RIFF") fail("missing RIFF magic")
    if (tag(8) != "WAVE") fail("RIFF form is not WAVE")
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    while (off + 8 <= b.length && data.isEmpty) {
      val id = tag(off)
      val size = u32(off + 4)
      if (size > Int.MaxValue || off + 8 + size > b.length)
        fail(s"chunk '$id' (size $size) overruns the file")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk is $size bytes, spec minimum is 16")
          var format = u16(off + 8)
          if (format == 0xFFFE) {
            // WAVE_FORMAT_EXTENSIBLE: the real format code is the first
            // two bytes of the 16-byte SubFormat GUID (fmt layout: 16
            // common bytes + cbSize(2) + validBits(2) + channelMask(4) +
            // SubFormat(16)); the GUID tail must be the fixed media
            // subtype suffix or the code means something else entirely
            if (size < 40) fail(
              s"extensible fmt chunk is $size bytes, needs 40")
            val cb = u16(off + 24)
            if (cb < 22) fail(s"extensible cbSize $cb, needs >= 22")
            val guidOff = off + 8 + 24
            val tail = Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00,
              0xAA, 0x00, 0x38, 0x9B, 0x71)
            var i = 0
            while (i < tail.length) {
              if ((b(guidOff + 4 + i) & 0xff) != tail(i)) fail(
                "extensible SubFormat GUID is not a media subtype")
              i += 1
            }
            if (u16(guidOff + 2) != 0) fail(
              "extensible SubFormat high bytes nonzero")
            format = u16(guidOff) // PCM subtype GUID starts 01 00
          }
          fmt = Some((format, u16(off + 10), u32(off + 12).toInt,
            u16(off + 22)))
        case "data" => data = Some((off + 8, size.toInt))
        case _      => () // LIST, fact, … — skip per spec
      }
      // chunks are word-aligned; the pad byte is not counted in the size
      off += 8 + size.toInt + (size.toInt & 1)
    }
    val (format, ch, rate, bits) =
      fmt.getOrElse(fail("no fmt chunk before data"))
    val (dOff, dLen) = data.getOrElse(fail("no data chunk"))
    if (format != 1) fail(s"compression format $format unsupported " +
      "(integer PCM only — plain format 1 or the extensible PCM subtype)")
    if (ch != 1) fail(s"$ch channels unsupported (mono only)")
    if (bits != 8 && bits != 16) fail(s"$bits-bit samples unsupported (8/16)")
    if (bits == 16 && dLen % 2 != 0) fail("odd data length for 16-bit samples")
    Pcm(b, dOff, dLen, ch, rate, bits)
  }
}

/** Magic-dispatching image decoder: P6 PPM or 24bpp BMP by file signature
  * — the formats a pure-JVM pipeline can decode from their public specs
  * without a codec library. */
final class StandardImageCodec extends ImageCodec {
  def decode(payload: Array[Byte]): ImageStats =
    if (payload == null) null
    else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
      Ppm.decode(payload)
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      Bmp.decode(payload)
    else throw new IllegalArgumentException(
      "image: unrecognized magic (P6 PPM and BM BMP supported)")

  def raster(payload: Array[Byte]): ImageRaster =
    if (payload == null) null
    else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
      Ppm.raster(payload)
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      Bmp.raster(payload)
    else throw new IllegalArgumentException(
      "image: unrecognized magic (P6 PPM and BM BMP supported)")
}

/** PPM "P6" decoder per the netpbm format spec: magic, whitespace-separated
  * decimal width / height / maxval tokens (with `#` comments legal anywhere
  * in the header), ONE whitespace byte, then `width*height*3` binary RGB
  * samples (maxval ≤ 255 → one byte per sample). */
object Ppm {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ppm: $msg")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == '\f'

  /** Validated header parse → (width, height, raster byte offset). */
  private def header(b: Array[Byte]): (Int, Int, Int) = {
    var pos = 0
    def readToken(): String = {
      while (pos < b.length && (isWs(b(pos)) || b(pos) == '#'))
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      val start = pos
      while (pos < b.length && !isWs(b(pos))) pos += 1
      if (start == pos) fail("truncated header")
      new String(b, start, pos - start, US_ASCII)
    }
    def readInt(what: String): Int = {
      val t = readToken()
      scala.util.Try(t.toInt).getOrElse(fail(s"malformed $what token '$t'"))
    }
    if (readToken() != "P6") fail("not a P6 ppm")
    val w = readInt("width")
    val h = readInt("height")
    val maxval = readInt("maxval")
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval < 1 || maxval > 255) fail(s"maxval $maxval unsupported (1..255)")
    // exactly one whitespace byte separates the header from the raster
    if (pos >= b.length || !isWs(b(pos))) fail("missing raster separator")
    val raster = pos + 1
    val need = w.toLong * h * 3
    if (b.length - raster < need)
      fail(s"raster needs $need bytes, ${b.length - raster} present")
    (w, h, raster)
  }

  def decode(b: Array[Byte]): ImageStats = {
    val (w, h, off) = header(b)
    channelStats(w, h, (px, c) => b(off + px * 3 + c) & 0xff)
  }

  /** PPM rasters are already row-major top-down RGB: one validated copy. */
  def raster(b: Array[Byte]): ImageRaster = {
    val (w, h, off) = header(b)
    val out = new Array[Byte](w * h * 3)
    System.arraycopy(b, off, out, 0, out.length)
    ImageRaster(w, h, out)
  }

  /** Shared per-channel accumulation: `at(pixelIndex, channel)` in RGB
    * order, exact integer sums/min/max. */
  private[operators] def channelStats(w: Int, h: Int,
      at: (Int, Int) => Int): ImageStats = {
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = new Array[Int](3)
    val n = w * h
    var px = 0
    while (px < n) {
      var c = 0
      while (c < 3) {
        val v = at(px, c)
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        c += 1
      }
      px += 1
    }
    ImageStats(w, h, sums(0), sums(1), sums(2),
      mins(0), mins(1), mins(2), maxs(0), maxs(1), maxs(2))
  }
}

/** BMP decoder per the Windows bitmap spec: `BM` magic, BITMAPFILEHEADER
  * (pixel-array offset at byte 10), BITMAPINFOHEADER (size ≥ 40), 24bpp
  * uncompressed, rows padded to 4-byte strides and stored bottom-up
  * (top-down when the height field is negative), pixels in BGR order. */
object Bmp {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"bmp: $msg")

  /** Validated header parse → (width, height, topDown, dataOff, stride). */
  private def header(b: Array[Byte]): (Int, Int, Boolean, Int, Int) = {
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') fail("missing BM magic")
    val dataOff = i32(10)
    val hdrSize = i32(14)
    if (hdrSize < 40) fail(s"header size $hdrSize: BITMAPINFOHEADER required")
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) fail(s"bad dimensions ${w}x$hRaw")
    if (u16(26) != 1) fail("planes must be 1")
    val bpp = u16(28)
    if (bpp != 24) fail(s"$bpp bpp unsupported (24 only)")
    if (i32(30) != 0) fail("compressed BMP unsupported (BI_RGB only)")
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
      fail("pixel array overruns the file")
    (w, h, topDown, dataOff, stride)
  }

  def decode(b: Array[Byte]): ImageStats = {
    val (w, h, topDown, dataOff, stride) = header(b)
    // row y of the image sits at stored row (h-1-y) unless top-down; the
    // global stats are row-order-invariant, but index faithfully anyway
    Ppm.channelStats(w, h, (px, c) => {
      val y = px / w
      val x = px % w
      val storedRow = if (topDown) y else h - 1 - y
      // BGR on disk → channel c (0=R,1=G,2=B) reads byte (2-c)
      b(dataOff + storedRow * stride + x * 3 + (2 - c)) & 0xff
    })
  }

  /** Normalize bottom-up BGR strided storage to top-down packed RGB. */
  def raster(b: Array[Byte]): ImageRaster = {
    val (w, h, topDown, dataOff, stride) = header(b)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val src = dataOff + storedRow * stride + x * 3
        val dst = (y * w + x) * 3
        out(dst) = b(src + 2)     // R
        out(dst + 1) = b(src + 1) // G
        out(dst + 2) = b(src)     // B
        x += 1
      }
      y += 1
    }
    ImageRaster(w, h, out)
  }
}
