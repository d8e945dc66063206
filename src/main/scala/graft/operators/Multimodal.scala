package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column operators: opaque `binary` payloads + typed metadata,
  * with REAL pure-JVM decode (RIFF/WAVE PCM audio, PPM/BMP images — see
  * [[graft.operators.MediaCodecs]]) behind pluggable codec seams. The
  * corpus payloads are genuine media binaries synthesized deterministically
  * from the document text with pure builtins (the text bytes are the PCM
  * samples / pixel raster), so the DuckDB oracle can restate every decoded
  * feature from the text column alone.
  *
  * At 100 TB the payload column lives in its own parquet column chunk, so
  * metadata-only queries never read the bytes; the decode UDF is the one
  * justified UDF shape (opaque binary → typed struct — no Column API can
  * parse a container format), constructed once on the driver and shipped
  * in the closure.
  */
object Multimodal {

  /** Synthesize a binary payload column from text (UTF-8 bytes) — an
    * opaque blob for the metadata path (m01); everything downstream treats
    * it as opaque. */
  private def withPayload(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("lang").as("tag"),
        col("n_chars").cast(LongType).as("declared_len")).as("meta"))

  // ---------------------------------------------------------------- m01
  /** Binary metadata extraction: checksum + length + magic-prefix over the
    * opaque payload, metadata struct fields projected alongside. All
    * builtins (md5 / crc32 / length / substring on binary) — the scan reads
    * only the needed column chunks. */
  def m01BinaryMeta(s: SparkSession, d: String): DataFrame =
    withPayload(Tables.documents(s, d))
      .select(
        col("doc_id"),
        md5(col("payload")).as("content_md5"),
        crc32(col("payload")).as("content_crc32"),
        length(col("payload")).as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic"),
        col("meta.origin").as("origin"),
        col("meta.declared_len").as("declared_len"))
      .orderBy("doc_id")

  val m01Sql: String =
    """SELECT doc_id, md5(text) AS content_md5,
      |  octet_length(encode(text)) AS n_bytes,
      |  source AS origin, n_chars AS declared_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m01 restricted to the oracle-expressible columns (crc32/hex have no
    * DuckDB builtin equivalent). */
  def m01BinaryMetaOracle(s: SparkSession, d: String): DataFrame =
    m01BinaryMeta(s, d).select("doc_id", "content_md5", "n_bytes",
      "origin", "declared_len").orderBy("doc_id")

  // ------------------------------------------------------- payload synth
  /** Little-endian unsigned integer field of `width` bytes — builtins
    * only: `chr` yields the code-point char, ISO-8859-1 encode maps code
    * points 0–255 to exactly that byte. */
  private def leBytes(n: Column, width: Int): Column =
    encode(concat((0 until width).map { i =>
      call_function("chr",
        pmod(floor(n / lit(math.pow(256, i))).cast(LongType), lit(256L)))
    }: _*), "ISO-8859-1")

  /** Synthesize a REAL RIFF/WAVE container from the document text: the
    * text's UTF-8 bytes are the 8-bit unsigned mono PCM samples behind a
    * canonical header (PCM format 1, mono, 8 kHz, 8-bit) with correct LE
    * length fields and the spec's word-alignment pad on odd data. Pure
    * builtins (binary-literal concat + computed LE fields), so the decoded
    * features are restatable from the text column by the DuckDB oracle. */
  private[operators] def wavPayload(text: Column): Column = {
    val data = encode(text, "UTF-8")
    val n = length(data)
    // fmt body: PCM(1), mono(1), 8000 Hz, 8000 B/s, block align 1, 8 bits
    val fmtBody = Array[Byte](1, 0, 1, 0, 0x40, 0x1f, 0, 0, 0x40, 0x1f,
      0, 0, 1, 0, 8, 0)
    concat(
      lit("RIFF".getBytes(US_ASCII)), leBytes(n + lit(36), 4),
      lit("WAVEfmt ".getBytes(US_ASCII)), leBytes(lit(16), 4), lit(fmtBody),
      lit("data".getBytes(US_ASCII)), leBytes(n, 4), data,
      when(n % 2 === 1, lit(Array[Byte](0)))
        .otherwise(lit(Array.empty[Byte])))
  }

  /** Synthesize a REAL PPM (P6) image from the document text: fixed width
    * 16, height ⌈n/48⌉ (3 bytes per pixel), raster = the text bytes padded
    * to `w*h*3` with spaces (0x20). The corpus text is pure ASCII (the m01
    * oracle's octet_length==length identity pins this), so char-indexed
    * DuckDB arithmetic equals byte-indexed raster arithmetic. */
  private[operators] def ppmPayload(text: Column): Column = {
    val n = length(encode(text, "UTF-8"))
    val h = greatest(ceil(n / lit(48.0)).cast(LongType), lit(1L))
    val header =
      encode(concat(lit("P6\n16 "), h.cast(StringType), lit("\n255\n")),
        "UTF-8")
    val raster = encode(
      call_function("rpad", text, (h * 48).cast(IntegerType), lit(" ")),
      "ISO-8859-1")
    concat(header, raster)
  }

  // ---------------------------------------------------------- codec seams
  /** Plug a production codec without touching the operators: implement
    * [[AudioCodec]] / [[ImageCodec]], put the class on BOTH the driver and
    * executor classpaths (`--jars` does both), and select it per session
    * via `spark.graft.codec.audio` / `spark.graft.codec.image`
    * (fully-qualified class name, no-arg constructor). The instance is
    * constructed once on the driver — through the context classloader, so
    * `--jars`-shipped classes resolve — and serialized into the decode
    * UDF's closure. Defaults are the real pure-JVM decoders. */
  private def loadInstance[T](cls: String): T = {
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    Class.forName(cls, true, loader).getDeclaredConstructor()
      .newInstance().asInstanceOf[T]
  }

  private def audioCodecFor(s: SparkSession): AudioCodec =
    s.conf.getOption("spark.graft.codec.audio").filter(_.nonEmpty)
      .map(loadInstance[AudioCodec]).getOrElse(new WavPcmCodec)

  private def imageCodecFor(s: SparkSession): ImageCodec =
    s.conf.getOption("spark.graft.codec.image").filter(_.nonEmpty)
      .map(loadInstance[ImageCodec]).getOrElse(new StandardImageCodec)

  private def videoCodecFor(s: SparkSession): VideoCodec =
    s.conf.getOption("spark.graft.codec.video").filter(_.nonEmpty)
      .map(loadInstance[VideoCodec]).getOrElse(new Y4mCodec)

  // ---------------------------------------------------------------- m02
  /** Audio frame features through the REAL codec: parse the WAV container
    * (magic, chunk walk, fmt validation), window the PCM stream into
    * 64-sample frames, decode every 4th (sample-then-decode — the frames
    * dropped are never decoded), and emit exact-integer frame statistics
    * with the one derived division (mean) done as a single IEEE op. */
  def m02FrameFeatures(s: SparkSession, d: String): DataFrame = {
    val codec = audioCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.decodeFrames(p, 64, 4) }
    Tables.documents(s, d)
      .select(col("doc_id"), wavPayload(col("text")).as("payload"))
      .select(col("doc_id"), explode(dec(col("payload"))).as("f"))
      .select(col("doc_id"),
        col("f.frame_idx").as("frame_idx"),
        col("f.n_samples").as("n_samples"),
        (col("f.sum_amp").cast(DoubleType) / col("f.n_samples"))
          .as("mean_amp"),
        col("f.peak_amp").as("peak_amp"),
        col("f.energy").as("energy"))
      .orderBy("doc_id", "frame_idx")
  }

  /** DuckDB restatement of m02: the data chunk is the text's bytes, 8-bit
    * PCM recenters at 128, frames are 64-sample windows with every 4th
    * kept. Integer sums aggregate exactly; mean is the same single IEEE
    * division both engines perform. */
  val m02Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |f AS (
      |  SELECT doc_id, n, text,
      |    unnest(range(0, (n + 63) // 64)) AS frame_idx
      |  FROM d),
      |s AS (
      |  SELECT doc_id, frame_idx, text,
      |    unnest(range(frame_idx * 64, least(frame_idx * 64 + 64, n))) AS pos
      |  FROM f WHERE frame_idx % 4 = 0),
      |a AS (
      |  SELECT doc_id, frame_idx,
      |    ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM s)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(COUNT(*) AS INT) AS n_samples,
      |  CAST(SUM(amp) AS DOUBLE) / COUNT(*) AS mean_amp,
      |  CAST(MAX(ABS(amp)) AS INT) AS peak_amp,
      |  CAST(SUM(amp * amp) AS BIGINT) AS energy
      |FROM a GROUP BY doc_id, frame_idx
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- m03
  /** Image statistics through the REAL codec: parse the PPM header (magic,
    * comment-tolerant token scan, dimension validation), then per-channel
    * exact-integer stats over the RGB raster; means derived by one IEEE
    * division. The same operator decodes BMP payloads via the magic
    * dispatch in [[StandardImageCodec]] (spec-covered). */
  def m03ImageStats(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.decode(p) }
    Tables.documents(s, d)
      .select(col("doc_id"), ppmPayload(col("text")).as("payload"))
      .select(col("doc_id"), dec(col("payload")).as("img"))
      .select(col("doc_id"),
        col("img.width").as("width"),
        col("img.height").as("height"),
        (col("img.r_sum").cast(DoubleType) /
          (col("img.width") * col("img.height"))).as("r_mean"),
        (col("img.g_sum").cast(DoubleType) /
          (col("img.width") * col("img.height"))).as("g_mean"),
        (col("img.b_sum").cast(DoubleType) /
          (col("img.width") * col("img.height"))).as("b_mean"),
        col("img.r_max").as("r_max"),
        col("img.g_max").as("g_max"),
        col("img.b_max").as("b_max"))
      .orderBy("doc_id")
  }

  /** DuckDB restatement of m03: raster = text padded with spaces to
    * `16*h*3`; channel c is every 3rd byte starting at c. */
  val m03Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest(ceil(length(text) / 48.0), 1) AS BIGINT) AS h
      |  FROM documents),
      |pix AS (
      |  SELECT doc_id, h, text, n,
      |    unnest(range(0, h * 48)) AS pos
      |  FROM d),
      |chan AS (
      |  SELECT doc_id, h, CAST(pos % 3 AS INT) AS c,
      |    CASE WHEN pos < n
      |      THEN ascii(substring(text, CAST(pos + 1 AS BIGINT), 1))
      |      ELSE 32 END AS v
      |  FROM pix)
      |SELECT doc_id, CAST(16 AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(SUM(CASE WHEN c = 0 THEN v END) AS DOUBLE) / (16 * h) AS r_mean,
      |  CAST(SUM(CASE WHEN c = 1 THEN v END) AS DOUBLE) / (16 * h) AS g_mean,
      |  CAST(SUM(CASE WHEN c = 2 THEN v END) AS DOUBLE) / (16 * h) AS b_mean,
      |  CAST(MAX(CASE WHEN c = 0 THEN v END) AS INT) AS r_max,
      |  CAST(MAX(CASE WHEN c = 1 THEN v END) AS INT) AS g_max,
      |  CAST(MAX(CASE WHEN c = 2 THEN v END) AS INT) AS b_max
      |FROM chan GROUP BY doc_id, h
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m04
  /** Image RESIZE through the codec seam: decode the container to its
    * normalized RGB raster, box-filter downsample 4×4 (exact floor-mean
    * blocks — the standard thumbnail/mipmap kernel, [[ImageOps.boxResize]]),
    * and emit per-channel stats plus a position-weighted checksum of the
    * RESIZED raster — so every output byte of the transform, including its
    * position, is pinned by the oracle, not just aggregate sums. One UDF
    * (opaque binary in, small struct out) per the multimodal UDF policy;
    * everything after is builtins. */
  /** Resized-raster statistics + position-weighted checksum (null payload
    * → null row, mirroring the codecs' own null policy). */
  private def resizeStats(codec: ImageCodec, p: Array[Byte])
      : (Int, Int, Long, Long, Long, Int, Int, Int, Long) = {
    val r0 = codec.raster(p)
    if (r0 == null) return null
    val r = ImageOps.boxResize(r0, 4, 4)
    var rs = 0L; var gs = 0L; var bs = 0L
    var rm = 0; var gm = 0; var bm = 0
    var ck = 0L
    var i = 0
    val n = r.rgb.length
    while (i < n) {
      val v = r.rgb(i) & 0xff
      (i % 3) match {
        case 0 => rs += v; if (v > rm) rm = v
        case 1 => gs += v; if (v > gm) gm = v
        case _ => bs += v; if (v > bm) bm = v
      }
      ck += v.toLong * (i + 1)
      i += 1
    }
    (r.width, r.height, rs, gs, bs, rm, gm, bm, ck)
  }

  def m04ImageResize(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val dec = udf { p: Array[Byte] => resizeStats(codec, p) }
    Tables.documents(s, d)
      .select(col("doc_id"), ppmPayload(col("text")).as("payload"))
      .select(col("doc_id"), dec(col("payload")).as("t"))
      .select(col("doc_id"),
        col("t._1").as("out_width"), col("t._2").as("out_height"),
        col("t._3").as("r_sum"), col("t._4").as("g_sum"),
        col("t._5").as("b_sum"),
        col("t._6").as("r_max"), col("t._7").as("g_max"),
        col("t._8").as("b_max"),
        col("t._9").as("checksum"))
      .orderBy("doc_id")
  }

  /** DuckDB restatement of m04: the input raster is text padded to 16×h×3
    * with spaces (as m03); block (bx, by) of channel c floor-averages the
    * 4×4 input block (bottom edge blocks average what exists); `checksum`
    * re-derives each resized byte's linear position ((by*ow+bx)*3+c). */
  val m04Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest(ceil(length(text) / 48.0), 1) AS BIGINT) AS h
      |  FROM documents),
      |pix AS (
      |  SELECT doc_id, h, text, n, unnest(range(0, h * 48)) AS pos
      |  FROM d),
      |v AS (
      |  SELECT doc_id, h,
      |    CAST(pos % 3 AS INT) AS c,
      |    CAST((pos // 3) % 16 AS INT) AS x,
      |    CAST(pos // 48 AS INT) AS y,
      |    CASE WHEN pos < n
      |      THEN ascii(substring(text, CAST(pos + 1 AS BIGINT), 1))
      |      ELSE 32 END AS val
      |  FROM pix),
      |blk AS (
      |  SELECT doc_id, h, c, x // 4 AS bx, y // 4 AS by,
      |    SUM(val) // COUNT(*) AS ov
      |  FROM v GROUP BY doc_id, h, c, x // 4, y // 4)
      |SELECT doc_id, CAST(4 AS INT) AS out_width,
      |  CAST((h + 3) // 4 AS INT) AS out_height,
      |  CAST(SUM(CASE WHEN c = 0 THEN ov END) AS BIGINT) AS r_sum,
      |  CAST(SUM(CASE WHEN c = 1 THEN ov END) AS BIGINT) AS g_sum,
      |  CAST(SUM(CASE WHEN c = 2 THEN ov END) AS BIGINT) AS b_sum,
      |  CAST(MAX(CASE WHEN c = 0 THEN ov END) AS INT) AS r_max,
      |  CAST(MAX(CASE WHEN c = 1 THEN ov END) AS INT) AS g_max,
      |  CAST(MAX(CASE WHEN c = 2 THEN ov END) AS INT) AS b_max,
      |  CAST(SUM(ov * ((by * 4 + bx) * 3 + c + 1)) AS BIGINT) AS checksum
      |FROM blk GROUP BY doc_id, h
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m05
  /** Synthesize a REAL YUV4MPEG2 stream from the document text: fixed
    * geometry 8×4 C444 (96 plane bytes per frame), ⌈n/96⌉ frames (min 1),
    * planes = the text bytes padded with spaces — each frame carrying its
    * spec-mandated `FRAME\n` header. Pure builtins (the per-frame split is
    * a `transform` over a frame-index `sequence`, joined in ISO-8859-1
    * string space where ASCII text is byte-exact), so the sampled frame
    * features are restatable from the text column by the DuckDB oracle. */
  private[operators] def y4mPayload(text: Column): Column = {
    val n = length(encode(text, "UTF-8"))
    val nf = greatest(ceil(n / lit(96.0)).cast(LongType), lit(1L))
    val padded =
      call_function("rpad", text, (nf * 96).cast(IntegerType), lit(" "))
    val frames = array_join(
      transform(sequence(lit(0L), nf - 1), i =>
        concat(lit("FRAME\n"),
          padded.substr((i * 96 + 1).cast(IntegerType), lit(96)))),
      "")
    encode(concat(lit("YUV4MPEG2 W8 H4 F25:1 Ip A1:1 C444\n"), frames),
      "ISO-8859-1")
  }

  /** Video FRAME-SAMPLING through the real codec: parse the YUV4MPEG2
    * container (magic, parameter scan, per-frame header walk), keep every
    * 2nd frame — skipped frames are seeked over by the container's frame
    * geometry, never decoded — and emit exact-integer per-plane frame
    * statistics. The video leg of the multimodal quartet (decode m03,
    * feature-extract m02, resize m04, frame-sample here). */
  def m05VideoFrames(s: SparkSession, d: String): DataFrame = {
    val codec = videoCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.sampleFrames(p, 2) }
    Tables.documents(s, d)
      .select(col("doc_id"), y4mPayload(col("text")).as("payload"))
      .select(col("doc_id"), explode(dec(col("payload"))).as("f"))
      .select(col("doc_id"),
        col("f.frame_idx").as("frame_idx"),
        col("f.n_pixels").as("n_pixels"),
        col("f.y_sum").as("y_sum"),
        col("f.y_peak").as("y_peak"),
        col("f.u_sum").as("u_sum"),
        col("f.v_sum").as("v_sum"))
      .orderBy("doc_id", "frame_idx")
  }

  /** DuckDB restatement of m05: frame f of the 8×4 C444 stream covers
    * padded-text bytes [f*96, f*96+96) — Y plane first 32, Cb next 32, Cr
    * last 32; every 2nd frame is sampled. Integer sums/max are exact. */
  val m05Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest((length(text) + 95) // 96, 1) AS BIGINT) AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, n, text, unnest(range(0, nf)) AS f FROM d),
      |px AS (
      |  SELECT doc_id, f, text, n, unnest(range(0, 96)) AS p
      |  FROM fr WHERE f % 2 = 0),
      |a AS (
      |  SELECT doc_id, f, p,
      |    CASE WHEN f * 96 + p < n
      |      THEN ascii(substring(text, CAST(f * 96 + p + 1 AS BIGINT), 1))
      |      ELSE 32 END AS v
      |  FROM px)
      |SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(32 AS INT) AS n_pixels,
      |  CAST(SUM(CASE WHEN p < 32 THEN v END) AS BIGINT) AS y_sum,
      |  CAST(MAX(CASE WHEN p < 32 THEN v END) AS INT) AS y_peak,
      |  CAST(SUM(CASE WHEN p >= 32 AND p < 64 THEN v END) AS BIGINT) AS u_sum,
      |  CAST(SUM(CASE WHEN p >= 64 THEN v END) AS BIGINT) AS v_sum
      |FROM a GROUP BY doc_id, f
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- m06
  /** Perceptual 64-bit dHash of an image payload: decode → area-map
    * resize to the canonical 9×8 luma grid ([[ImageOps.resizeTo]]) →
    * one bit per horizontal gradient (gray(x+1,y) > gray(x,y)) — the
    * standard difference-hash, robust to rescaling and small edits
    * because only gradient SIGNS survive the downsample. Gray is the
    * integer floor mean of R,G,B. */
  private[operators] def dHash(codec: ImageCodec, p: Array[Byte]): java.lang.Long = {
    if (p == null) return null
    val r = ImageOps.resizeTo(codec.raster(p), 9, 8)
    def gray(x: Int, y: Int): Int = {
      val o = (y * 9 + x) * 3
      ((r.rgb(o) & 0xff) + (r.rgb(o + 1) & 0xff) + (r.rgb(o + 2) & 0xff)) / 3
    }
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) h |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Image near-dup dedup via perceptual hashing — the dedup family
    * crossed into the multimodal one (what an image-corpus curation
    * pipeline runs where text corpora run d01/d03): every document's
    * genuine PPM payload is decoded, dHashed, and grouped by hash; a
    * hash held by ≥ 2 images marks a duplicate group. Scale shape: the
    * decode+hash is a narrow per-row pass (the image never leaves the
    * executor — 8 bytes of hash do); the only shuffle is the group-by on
    * the uniform 64-bit hash. Hamming-tolerant matching at scale bands
    * the 64 bits into 4×16-bit keys exactly like SimHash (d04) — same
    * machinery, swap the text fingerprint for this visual one.
    *
    * Gate (d07 pattern): 20 planted docs duplicate existing texts, so
    * their PPM payloads — and therefore their dHashes — are identical to
    * their sources'; every planted image must land in a duplicate
    * group. */
  def m06ImageDhashGate(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        col("text"))
    val all = docs.unionByName(planted)
      .select(col("doc_id"), ppmPayload(col("text")).as("img"))
    val dh = udf { p: Array[Byte] => dHash(codec, p) }
    val hashed = all.select(col("doc_id"), dh(col("img")).as("dhash"))
    val dupHashes = hashed.groupBy(col("dhash"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2).select("dhash")
    val plantedDup = hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .join(dupHashes, Seq("dhash"), "left_semi")
    hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .agg(count(lit(1)).as("n_planted"))
      .crossJoin(plantedDup.agg(count(lit(1)).as("n_planted_matched")))
      .select(col("n_planted"), col("n_planted_matched"),
        (col("n_planted") === lit(20) &&
          col("n_planted_matched") === lit(20)).as("recall_ok"))
  }

  val m06Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_planted,
      |  CAST(20 AS BIGINT) AS n_planted_matched,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- m07
  /** Perceptual 64-bit audio fingerprint: decode the PCM stream into
    * 2-sample frames ([[AudioCodec.decodeFrames]] — the same seam as m02),
    * one bit per consecutive-frame ENERGY GRADIENT (energy(i+1) >
    * energy(i)) over the first 64 deltas. This is the energy-delta sign
    * hash — the shape of the Haitsma–Kalker / Chromaprint family minus
    * the spectral transform: only gradient SIGNS survive into the hash,
    * so uniform amplitude scaling and low-level noise leave it intact
    * where absolute energies would not. Clips shorter than 65 frames
    * contribute fewer bits (high bits stay 0) — still a deterministic
    * function of the payload, which is all dedup needs. */
  private[operators] def audioFp(codec: AudioCodec, p: Array[Byte])
      : java.lang.Long = {
    if (p == null) return null
    val fr = codec.decodeFrames(p, 2, 1)
    if (fr == null) return null
    var h = 0L
    val n = math.min(fr.length - 1, 64)
    var i = 0
    while (i < n) {
      if (fr(i + 1).energy > fr(i).energy) h |= 1L << i
      i += 1
    }
    h
  }

  /** Audio near-dup dedup via perceptual fingerprinting — m06's pattern
    * in the audio modality: every document's genuine WAV payload is
    * decoded, fingerprinted, and grouped by fingerprint; a fingerprint
    * held by ≥ 2 clips marks a duplicate group. Scale shape identical to
    * m06: decode+hash is a narrow per-row pass (8 fingerprint bytes leave
    * the executor, the audio doesn't), the only shuffle is the group-by
    * on the uniform 64-bit key, and Hamming-tolerant matching bands the
    * bits 4×16 exactly like SimHash (d04).
    *
    * Gate (d07 pattern): 20 planted docs duplicate existing texts, so
    * their WAV payloads — and therefore fingerprints — are identical to
    * their sources'; every planted clip must land in a duplicate group. */
  def m07AudioFpGate(s: SparkSession, d: String): DataFrame = {
    val codec = audioCodecFor(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        col("text"))
    val all = docs.unionByName(planted)
      .select(col("doc_id"), wavPayload(col("text")).as("clip"))
    val fp = udf { p: Array[Byte] => audioFp(codec, p) }
    val hashed = all.select(col("doc_id"), fp(col("clip")).as("afp"))
    val dupFps = hashed.groupBy(col("afp"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2).select("afp")
    val plantedDup = hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .join(dupFps, Seq("afp"), "left_semi")
    hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .agg(count(lit(1)).as("n_planted"))
      .crossJoin(plantedDup.agg(count(lit(1)).as("n_planted_matched")))
      .select(col("n_planted"), col("n_planted_matched"),
        (col("n_planted") === lit(20) &&
          col("n_planted_matched") === lit(20)).as("recall_ok"))
  }

  val m07Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_planted,
      |  CAST(20 AS BIGINT) AS n_planted_matched,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- m08
  /** Perceptual video fingerprint: decode EVERY frame's stats through the
    * [[VideoCodec]] seam, quantize each frame's mean luma to a 4-bit
    * level (16 brightness cells — small per-pixel jitter inside a cell
    * leaves the code unchanged, the perceptual property), and pack the
    * per-frame codes into one 64-bit signature (frames 0–15 in their own
    * lanes; longer clips XOR-fold into lane frame%16, so any frame
    * change still perturbs the signature). The temporal complement to
    * m06's spatial dHash and m07's audio energy-gradient hash. */
  private[operators] def videoFp(codec: VideoCodec, p: Array[Byte])
      : java.lang.Long = {
    if (p == null) return null
    val fr = codec.sampleFrames(p, 1)
    if (fr == null) return null
    var h = 0L
    var i = 0
    while (i < fr.length) {
      val f = fr(i)
      // 4-bit cell of the mean luma: floor(y_sum * 16 / (256 * n_pixels))
      val cell = ((f.y_sum * 16) / (256L * f.n_pixels)).toInt & 0xf
      h ^= cell.toLong << (4 * (i % 16))
      i += 1
    }
    h
  }

  /** Video near-dup dedup via the temporal fingerprint — m06/m07's gate
    * in the video modality: every document's genuine Y4M payload decoded
    * frame-by-frame, fingerprinted, duplicate groups by signature; 8
    * hash bytes leave the executor, one uniform 64-bit group-by, 4×16
    * banding for Hamming tolerance exactly as d04. Gate (d07 pattern):
    * 20 planted docs duplicate existing texts ⇒ identical Y4M payloads ⇒
    * identical fingerprints ⇒ every planted clip in a duplicate group. */
  def m08VideoFpGate(s: SparkSession, d: String): DataFrame = {
    val codec = videoCodecFor(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        col("text"))
    val all = docs.unionByName(planted)
      .select(col("doc_id"), y4mPayload(col("text")).as("clip"))
    val fp = udf { p: Array[Byte] => videoFp(codec, p) }
    val hashed = all.select(col("doc_id"), fp(col("clip")).as("vfp"))
    val dupFps = hashed.groupBy(col("vfp"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2).select("vfp")
    val plantedDup = hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .join(dupFps, Seq("vfp"), "left_semi")
    hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .agg(count(lit(1)).as("n_planted"))
      .crossJoin(plantedDup.agg(count(lit(1)).as("n_planted_matched")))
      .select(col("n_planted"), col("n_planted_matched"),
        (col("n_planted") === lit(20) &&
          col("n_planted_matched") === lit(20)).as("recall_ok"))
  }

  val m08Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_planted,
      |  CAST(20 AS BIGINT) AS n_planted_matched,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- m09
  /** Audio RESAMPLING through the codec seam — the rate-conversion every
    * audio training pipeline runs before feature extraction (models want
    * one canonical rate): decode the WAV container to raw PCM
    * ([[AudioCodec.samples]]), then 2× linear-interpolation upsample and
    * 2× decimation ([[AudioOps]] — pure integer arithmetic, so the
    * oracle restates both grids exactly: upsample = originals at even
    * indices with floor-midpoints between, length 2n−1; downsample =
    * every second sample, length ⌈n/2⌉). Emits per-doc lengths and
    * full-stream checksums of the ACTUAL resampled arrays — a kernel
    * regression (offset, rounding, edge sample) flips the row.
    *
    * Scale shape: narrow per-row decode+transform, zero shuffle until
    * the orderBy for the deterministic dump — at 100 TB this is a
    * map-only stage like m02–m05. */
  def m09AudioResample(s: SparkSession, d: String): DataFrame = {
    val codec = audioCodecFor(s)
    val res = udf { p: Array[Byte] =>
      val in = codec.samples(p)
      if (in == null) null
      else {
        val up = AudioOps.upsample2x(in)
        val down = AudioOps.downsample2x(in)
        (in.length.toLong, up.length.toLong, down.length.toLong,
          up.map(_.toLong).sum, down.map(_.toLong).sum)
      }
    }
    Tables.documents(s, d)
      .select(col("doc_id"), res(wavPayload(col("text"))).as("r"))
      .select(col("doc_id"),
        col("r._1").as("n_samples"), col("r._2").as("n_up"),
        col("r._3").as("n_down"), col("r._4").as("up_checksum"),
        col("r._5").as("down_checksum"))
      .orderBy("doc_id")
  }

  /** m02's restatement discipline: the data chunk is the text's bytes,
    * 8-bit PCM recenters at 128; lead() builds the adjacent pairs. */
  val m09Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |a AS (
      |  SELECT doc_id, n, pos,
      |    ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM d, UNNEST(range(0, n)) AS u(pos)),
      |p AS (
      |  SELECT doc_id, n, pos, amp,
      |    lead(amp) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |  FROM a)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
      |  CAST(2 * MAX(n) - 1 AS BIGINT) AS n_up,
      |  CAST((MAX(n) + 1) // 2 AS BIGINT) AS n_down,
      |  CAST(SUM(amp) + SUM(CASE WHEN nxt IS NULL THEN 0
      |    ELSE CAST(floor((amp + nxt) / 2.0) AS BIGINT) END) AS BIGINT)
      |    AS up_checksum,
      |  CAST(SUM(CASE WHEN pos % 2 = 0 THEN amp ELSE 0 END) AS BIGINT)
      |    AS down_checksum
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m10
  /** Image AUGMENTATION through the codec seam — horizontal flip +
    * fixed-window crop ([[ImageOps.flipH]]/[[ImageOps.crop]]), the two
    * cheapest transforms every vision training pipeline applies before
    * batching. Both kernels are exact byte moves, so the oracle restates
    * them as index arithmetic on the text-synthesized raster: the flip
    * checksum weights original pixel (x, y, c) by its MIRRORED linear
    * position, and the top-left 8×8 crop (clamped to the image — part of
    * the contract) re-indexes into the crop's own geometry. A dropped
    * row, off-by-one mirror, or stride bug flips the row. Narrow
    * map-only stage, like m02–m09. */
  private def flipCropStats(codec: ImageCodec, p: Array[Byte])
      : (Long, Long, Int, Int) = {
    val r0 = codec.raster(p)
    if (r0 == null) return null
    def ck(r: ImageRaster): Long = {
      var s = 0L; var i = 0
      while (i < r.rgb.length) { s += (r.rgb(i) & 0xff).toLong * (i + 1); i += 1 }
      s
    }
    val flip = ImageOps.flipH(r0)
    val cropped = ImageOps.crop(r0, 0, 0, 8, 8)
    (ck(flip), ck(cropped), cropped.width, cropped.height)
  }

  def m10ImageAugment(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val f = udf { p: Array[Byte] => flipCropStats(codec, p) }
    Tables.documents(s, d)
      .select(col("doc_id"), f(ppmPayload(col("text"))).as("r"))
      .select(col("doc_id"),
        col("r._1").as("flip_checksum"), col("r._2").as("crop_checksum"),
        col("r._3").as("crop_w"), col("r._4").as("crop_h"))
      .orderBy("doc_id")
  }

  /** m04's restatement discipline over the same 16-wide padded raster:
    * flip weight = mirrored linear index, crop re-indexed into 8-wide
    * geometry (h < 8 clamps the window — `least(h, 8)`). */
  val m10Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest(ceil(length(text) / 48.0), 1) AS BIGINT) AS h
      |  FROM documents),
      |pix AS (
      |  SELECT doc_id, h, text, n, unnest(range(0, h * 48)) AS pos
      |  FROM d),
      |v AS (
      |  SELECT doc_id, h,
      |    CAST(pos % 3 AS INT) AS c,
      |    CAST((pos // 3) % 16 AS INT) AS x,
      |    CAST(pos // 48 AS INT) AS y,
      |    CASE WHEN pos < n
      |      THEN ascii(substring(text, CAST(pos + 1 AS BIGINT), 1))
      |      ELSE 32 END AS val
      |  FROM pix)
      |SELECT doc_id,
      |  CAST(SUM(val * ((y * 16 + 15 - x) * 3 + c + 1)) AS BIGINT)
      |    AS flip_checksum,
      |  CAST(SUM(CASE WHEN x < 8 AND y < 8
      |    THEN val * ((y * 8 + x) * 3 + c + 1) ELSE 0 END) AS BIGINT)
      |    AS crop_checksum,
      |  CAST(8 AS INT) AS crop_w,
      |  CAST(least(MAX(h), 8) AS INT) AS crop_h
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m11
  /** Video SCENE-CUT detection — the shot-boundary pass a video training
    * pipeline runs before clip selection (one training clip per shot,
    * not per fixed window): decode every frame's luma statistics through
    * the real Y4M codec, then flag frames whose mean-luma jump from the
    * previous frame exceeds a threshold (|Δy_sum| ≥ 160 on the 32-pixel
    * plane ≡ mean-luma jump ≥ 5 — picked where the corpus's frame-delta
    * distribution actually splits, ~20% of transitions). The temporal
    * window partitions BY CLIP (doc), so at 100 TB the lag never crosses
    * executors' partition boundaries and no clip-length skew exists
    * (frame counts are bounded by clip duration). Emits per-clip cut
    * count, first cut, and a cut-position checksum — a one-frame offset
    * regression in the codec's frame walk flips the row. */
  def m11SceneCuts(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codec = videoCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.sampleFrames(p, 1) }
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), y4mPayload(col("text")).as("payload"))
      .select(col("doc_id"), explode(dec(col("payload"))).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("fi"),
        col("f.y_sum").as("y_sum"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
    frames
      .withColumn("dy", abs(col("y_sum") - lag(col("y_sum"), 1).over(w)))
      .withColumn("is_cut", col("dy").isNotNull && col("dy") >= 160)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("is_cut").cast("long")).as("n_cuts"),
        coalesce(min(when(col("is_cut"), col("fi"))), lit(-1))
          .as("first_cut"),
        sum(when(col("is_cut"), col("fi")).otherwise(0)).as("cut_checksum"))
      .orderBy("doc_id")
  }

  /** m05's restatement discipline: frame f's Y plane is padded-text bytes
    * [f·96, f·96+32); the cut predicate is pure integer arithmetic. */
  val m11Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest((length(text) + 95) // 96, 1) AS BIGINT) AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, n, text, unnest(range(0, nf)) AS f FROM d),
      |px AS (SELECT doc_id, f, text, n, unnest(range(0, 32)) AS p FROM fr),
      |a AS (
      |  SELECT doc_id, f,
      |    SUM(CASE WHEN f * 96 + p < n
      |      THEN ascii(substring(text, CAST(f * 96 + p + 1 AS BIGINT), 1))
      |      ELSE 32 END) AS y_sum
      |  FROM px GROUP BY doc_id, f),
      |l AS (
      |  SELECT doc_id, f,
      |    abs(y_sum - lag(y_sum) OVER (PARTITION BY doc_id ORDER BY f))
      |      AS dy
      |  FROM a),
      |c AS (SELECT doc_id, f,
      |  (dy IS NOT NULL AND dy >= 160) AS is_cut FROM l)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
      |  CAST(COALESCE(MIN(CASE WHEN is_cut THEN f END), -1) AS INT)
      |    AS first_cut,
      |  CAST(SUM(CASE WHEN is_cut THEN f ELSE 0 END) AS BIGINT)
      |    AS cut_checksum
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m12
  /** ViT-style PATCHIFY — the tiling transform a vision-transformer data
    * pipeline applies to every image (image → non-overlapping P×P
    * patches, one token each): decode to the RGB raster, tile into 4×4
    * patches (rows past the last full patch row are dropped, the
    * standard divisible-resolution contract), and emit the patch count,
    * the byte mass inside patches, a patch-index-weighted checksum (a
    * tile mis-assignment reweights a byte and flips it), and the whole-
    * image total (pins what the tiling dropped). Narrow per-row UDF over
    * the opaque payload; zero shuffle before the output sort. */
  private def patchifyStats(codec: ImageCodec, p: Array[Byte])
      : (Int, Long, Long, Long) = {
    val r = codec.raster(p)
    if (r == null) return null
    val P = 4
    val px = r.width / P
    val py = r.height / P
    var total = 0L; var psum = 0L; var gck = 0L
    var i = 0
    while (i < r.rgb.length) {
      val v = r.rgb(i) & 0xff
      val pix = i / 3
      val x = pix % r.width
      val y = pix / r.width
      total += v
      if (y < py * P && x < px * P) {
        val idx = (y / P) * px + (x / P)
        psum += v
        gck += v.toLong * (idx + 1)
      }
      i += 1
    }
    (px * py, psum, gck, total)
  }

  def m12ImagePatchify(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val f = udf { p: Array[Byte] => patchifyStats(codec, p) }
    Tables.documents(s, d)
      .select(col("doc_id"), f(ppmPayload(col("text"))).as("r"))
      .select(col("doc_id"),
        col("r._1").as("n_patches"), col("r._2").as("patch_sum"),
        col("r._3").as("grid_checksum"), col("r._4").as("total_sum"))
      .orderBy("doc_id")
  }

  /** m10's restatement over the 16-wide padded raster: pixel (x, y) of
    * channel c is text byte 48y+3x+c; patch idx = (y/4)·4 + x/4 (width
    * 16 always tiles; rows ≥ 4·(h/4) fall outside every patch). */
  val m12Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest(ceil(length(text) / 48.0), 1) AS BIGINT) AS h
      |  FROM documents),
      |pix AS (
      |  SELECT doc_id, h, text, n, unnest(range(0, h * 48)) AS pos
      |  FROM d),
      |v AS (
      |  SELECT doc_id, h,
      |    CAST((pos // 3) % 16 AS INT) AS x,
      |    CAST(pos // 48 AS INT) AS y,
      |    CASE WHEN pos < n
      |      THEN ascii(substring(text, CAST(pos + 1 AS BIGINT), 1))
      |      ELSE 32 END AS val
      |  FROM pix)
      |SELECT doc_id,
      |  CAST(4 * (h // 4) AS INT) AS n_patches,
      |  CAST(SUM(CASE WHEN y < (h // 4) * 4 THEN val ELSE 0 END) AS BIGINT)
      |    AS patch_sum,
      |  CAST(SUM(CASE WHEN y < (h // 4) * 4
      |    THEN val * ((y // 4) * 4 + (x // 4) + 1) ELSE 0 END) AS BIGINT)
      |    AS grid_checksum,
      |  CAST(SUM(val) AS BIGINT) AS total_sum
      |FROM v GROUP BY doc_id, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m13
  /** Audio ACTIVITY SEGMENTATION (VAD shape) — the clip-extraction pass a
    * speech pipeline runs before transcription: decode every 64-sample
    * frame's energy through the real WAV codec, mark frames ≥ the energy
    * threshold (130 000 — the corpus frame-energy distribution's midline,
    * leaving ~17% of docs silent and a third multi-segment), and group
    * consecutive active frames into maximal runs with the gaps-and-islands
    * key (frame_idx − row_number over active frames — constant exactly
    * within a run). Emits per-clip frame/active counts, segment count,
    * first active frame, longest run. All windows partition BY CLIP —
    * bounded by clip length, no cross-executor adjacency, no skew. */
  /** Shared m13/m16 kernel: per-clip decoded frame activity and the
    * gaps-and-islands active runs (both clip-keyed, bounded windows). */
  private def audioActiveRuns(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val codec = audioCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.decodeFrames(p, 64, 1) }
    val fr = Tables.documents(s, d)
      .select(col("doc_id"), wavPayload(col("text")).as("payload"))
      .select(col("doc_id"), explode(dec(col("payload"))).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("fi"),
        col("f.energy").as("energy"))
      .withColumn("active", col("energy") >= 130000L)
    val wa = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
    val runs = fr.where(col("active"))
      .withColumn("grp", col("fi") - row_number().over(wa))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"), min(col("fi")).as("run_start"))
    (fr, runs)
  }

  def m13AudioSegments(s: SparkSession, d: String): DataFrame = {
    val (fr, runs) = audioActiveRuns(s, d)
    val seg = runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        max(col("run_len")).as("longest_run"),
        min(col("run_start")).as("first_active"))
    fr.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("active").cast("long")).as("n_active"))
      .join(seg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_frames"), col("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("first_active"), lit(-1)).as("first_active"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"))
      .orderBy("doc_id")
  }

  /** m02's frame-energy restatement + the same islands construction. */
  val m13Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |f AS (SELECT doc_id, n, text,
      |  unnest(range(0, (n + 63) // 64)) AS fi FROM d),
      |s AS (SELECT doc_id, fi,
      |  unnest(range(fi * 64, least(fi * 64 + 64, n))) AS pos, text FROM f),
      |a AS (SELECT doc_id, fi,
      |  ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM s),
      |e AS (SELECT doc_id, fi, SUM(amp * amp) AS energy
      |  FROM a GROUP BY doc_id, fi),
      |act AS (SELECT doc_id, fi, (energy >= 130000) AS active FROM e),
      |runs AS (
      |  SELECT doc_id,
      |    fi - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fi) AS grp,
      |    fi
      |  FROM act WHERE active),
      |r2 AS (SELECT doc_id, grp, COUNT(*) AS run_len, MIN(fi) AS run_start
      |  FROM runs GROUP BY doc_id, grp),
      |seg AS (SELECT doc_id, COUNT(*) AS n_segments,
      |    MAX(run_len) AS longest_run, MIN(run_start) AS first_active
      |  FROM r2 GROUP BY doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_frames,
      |    SUM(CASE WHEN active THEN 1 ELSE 0 END) AS n_active
      |  FROM act GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_frames AS BIGINT) AS n_frames,
      |  CAST(t.n_active AS BIGINT) AS n_active,
      |  CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
      |  CAST(COALESCE(s.first_active, -1) AS INT) AS first_active,
      |  CAST(COALESCE(s.longest_run, 0) AS BIGINT) AS longest_run
      |FROM tot t LEFT JOIN seg s ON t.doc_id = s.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- m14
  /** LETTERBOX / PILLARBOX detection (FFmpeg `cropdetect`) — the
    * geometry-normalization pass a video/image training pipeline runs
    * before resize or perceptual hashing: black bars around the content
    * poison both patch statistics and dHash-family signatures, so the
    * content bounding box must be found and reported per asset. The
    * kernel is [[ImageOps.contentBox]] — edge-inward scans for the first
    * row/column holding any pixel ≥ threshold — over the REAL decoder's
    * raster.
    *
    * Scale shape: a per-row codec UDF over the opaque binary column (the
    * m03/m10 contract — decode work stays narrow and partition-local,
    * zero shuffles; this is the workload class where a per-row kernel IS
    * the right tool). Gate plants bars of key-derived widths (including
    * zero on both axes, so the no-bar fast path is exercised) around the
    * text raster; content pixels are ≥ 32 by ASCII construction, bars
    * are 0, threshold 16 splits them with margin on both sides. */
  def m14LetterboxDetect(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val boxed = udf { (text: String, t: Int, l: Int) =>
      val bytes = text.getBytes("UTF-8")
      val h0 = math.max(1, math.ceil(bytes.length / 48.0).toInt)
      val content = java.util.Arrays.copyOf(bytes, h0 * 48)
      java.util.Arrays.fill(content, bytes.length, h0 * 48, ' '.toByte)
      val w = 16 + 2 * l
      val h = h0 + 2 * t
      val bos = new java.io.ByteArrayOutputStream(20 + w * h * 3)
      bos.write(s"P6\n$w $h\n255\n".getBytes("UTF-8"))
      val black = new Array[Byte](w * 3)
      val side = new Array[Byte](l * 3)
      var y = 0
      while (y < t) { bos.write(black); y += 1 }
      var r = 0
      while (r < h0) {
        bos.write(side); bos.write(content, r * 48, 48); bos.write(side)
        r += 1
      }
      y = 0
      while (y < t) { bos.write(black); y += 1 }
      bos.toByteArray
    }
    val det = udf { p: Array[Byte] => ImageOps.contentBox(codec.raster(p), 16) }
    Tables.documents(s, d)
      .select(col("doc_id"),
        boxed(col("text"), (col("doc_id") % 3).cast("int"),
          (col("doc_id") % 2).cast("int")).as("img"))
      .select(col("doc_id"), det(col("img")).as("b"))
      .select(col("doc_id"),
        col("b._1").as("bars_top"), col("b._2").as("bars_bottom"),
        col("b._3").as("bars_left"), col("b._4").as("bars_right"),
        col("b._5").as("content_w"), col("b._6").as("content_h"))
      .orderBy("doc_id")
  }

  val m14Sql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 3 AS INT) AS bars_top,
      |  CAST(doc_id % 3 AS INT) AS bars_bottom,
      |  CAST(doc_id % 2 AS INT) AS bars_left,
      |  CAST(doc_id % 2 AS INT) AS bars_right,
      |  CAST(16 AS INT) AS content_w,
      |  CAST(greatest(ceil(length(text) / 48.0), 1) AS INT) AS content_h
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m15
  /** KEYFRAME SELECTION per shot — the clip-curation step after m11's
    * shot-boundary pass: training pipelines keep ONE representative
    * frame per shot (thumbnailing, image-text pairing, frame-level
    * dedup), and the standard heuristic picks the shot's most salient
    * frame. Shots are the running count of m11's cut flags; within a
    * (clip, shot) partition the keyframe is the frame maximizing peak
    * luma (tie → earliest frame) — a deterministic argmax over the REAL
    * codec's per-frame stats.
    *
    * Scale shape: per-clip windows only (frame counts bounded by clip
    * duration — no corpus-sized partition), one decode pass shared with
    * the cut logic, output one row per shot. */
  def m15Keyframes(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codec = videoCodecFor(s)
    val dec = udf { p: Array[Byte] => codec.sampleFrames(p, 1) }
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), y4mPayload(col("text")).as("payload"))
      .select(col("doc_id"), explode(dec(col("payload"))).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("fi"),
        col("f.y_sum").as("y_sum"), col("f.y_peak").as("y_peak"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
    val run = Window.partitionBy(col("doc_id")).orderBy(col("fi"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val shots = frames
      .withColumn("dy", abs(col("y_sum") - lag(col("y_sum"), 1).over(w)))
      .withColumn("cut",
        (col("dy").isNotNull && col("dy") >= 160).cast("long"))
      .withColumn("shot", sum(col("cut")).over(run))
    val wk = Window.partitionBy(col("doc_id"), col("shot"))
      .orderBy(col("y_peak").desc, col("fi").asc)
    shots
      .withColumn("rk", row_number().over(wk))
      .groupBy(col("doc_id"), col("shot"))
      .agg(min(col("fi")).cast("long").as("shot_start"),
        count(lit(1)).as("n_frames"),
        min(when(col("rk") === 1, col("fi"))).cast("long").as("key_fi"),
        max(col("y_peak")).cast("int").as("key_peak"))
      .orderBy("doc_id", "shot")
  }

  /** m11's restatement extended with per-frame peak luma and the
    * running-cut shot id; the keyframe is the same (peak DESC, fi ASC)
    * argmax. */
  val m15Sql: String =
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest((length(text) + 95) // 96, 1) AS BIGINT) AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, n, text, unnest(range(0, nf)) AS f FROM d),
      |px AS (SELECT doc_id, f, text, n, unnest(range(0, 32)) AS p FROM fr),
      |a AS (
      |  SELECT doc_id, f,
      |    SUM(CASE WHEN f * 96 + p < n
      |      THEN ascii(substring(text, CAST(f * 96 + p + 1 AS BIGINT), 1))
      |      ELSE 32 END) AS y_sum,
      |    MAX(CASE WHEN f * 96 + p < n
      |      THEN ascii(substring(text, CAST(f * 96 + p + 1 AS BIGINT), 1))
      |      ELSE 32 END) AS y_peak
      |  FROM px GROUP BY doc_id, f),
      |l AS (
      |  SELECT doc_id, f, y_sum, y_peak,
      |    abs(y_sum - lag(y_sum) OVER (PARTITION BY doc_id ORDER BY f))
      |      AS dy
      |  FROM a),
      |sh AS (
      |  SELECT doc_id, f, y_peak,
      |    SUM(CASE WHEN dy IS NOT NULL AND dy >= 160 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY f
      |        ROWS UNBOUNDED PRECEDING) AS shot
      |  FROM l),
      |rk AS (
      |  SELECT doc_id, shot, f, y_peak,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id, shot
      |      ORDER BY y_peak DESC, f ASC) AS r
      |  FROM sh)
      |SELECT doc_id, CAST(shot AS BIGINT) AS shot,
      |  CAST(MIN(f) AS BIGINT) AS shot_start,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(MIN(CASE WHEN r = 1 THEN f END) AS BIGINT) AS key_fi,
      |  CAST(MAX(y_peak) AS INT) AS key_peak
      |FROM rk GROUP BY doc_id, shot ORDER BY doc_id, shot""".stripMargin

  // ---------------------------------------------------------------- m19
  /** PERCEPTUAL DCT HASH (pHash) — the frequency-domain sibling of m06's
    * gradient dHash and the kernel behind production image-dedup
    * (PhotoDNA-style): luma resampled to a 32×32 grid IN DOUBLE (area
    * average, no integer floor), 2-D DCT-II, keep the 8×8 low-frequency
    * block, one bit per AC coefficient above the median of the 63.
    * Median thresholding makes the hash invariant to any affine luma
    * scaling — PROVABLY here: an exact ×2 contrast stretch multiplies
    * every double-precision intermediate by exactly 2 (a pure exponent
    * shift — no rounding anywhere in resample or DCT), doubling every
    * coefficient AND the median, so every (coef > median) bit is
    * unchanged. m06's byte hash provably separates the same pair.
    *
    * Gate: 20 planted images are their sources' rasters contrast-
    * doubled (ASCII payload bytes ≤ 126, so ×2 never clips at 255 and
    * the doubling is exact); every planted image must pHash-collide
    * with its source while NO planted image byte-collides with
    * anything. Scale shape: decode+DCT is a narrow per-row pass (8
    * bytes leave the executor); the only shuffle is the uniform
    * 64-bit-hash group-by — d01's shape, like m06. */
  /** DCT-II basis table: DctTab(u)(x) = cos(π(2x+1)u/64), u < 8, x < 32. */
  private val DctTab: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, x) => math.cos(math.Pi * (2 * x + 1) * u / 64.0))

  private[operators] def pHash(codec: ImageCodec, p: Array[Byte]): java.lang.Long = {
    if (p == null) return null
    val r = codec.raster(p)
    // 32×32 luma in double: partition source rows/cols into 32 nearly
    // equal spans (span boundaries i*dim/32 — exact integer arithmetic)
    // and average r+g+b over each cell. No integer division anywhere.
    val lum = new Array[Double](32 * 32)
    var cy = 0
    while (cy < 32) {
      val y0 = cy * r.height / 32
      val y1 = math.max((cy + 1) * r.height / 32, y0 + 1)
      var cx = 0
      while (cx < 32) {
        val x0 = cx * r.width / 32
        val x1 = math.max((cx + 1) * r.width / 32, x0 + 1)
        var sum = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, r.height)) {
          var x = x0
          while (x < math.min(x1, r.width)) {
            val o = (y * r.width + x) * 3
            sum += (r.rgb(o) & 0xff) + (r.rgb(o + 1) & 0xff) +
              (r.rgb(o + 2) & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        lum(cy * 32 + cx) = if (n == 0) 0.0 else sum / n
        cx += 1
      }
      cy += 1
    }
    // 2-D DCT-II, low 8×8 block only (the classic pHash truncation).
    // SEPARABLE two-pass against the precomputed cosine table: rows
    // first (32×32 → 32×8), then columns (32×8 → 8×8) — ~10k multiplies
    // instead of the naive quadruple loop's 131k libm cos calls per
    // image (a 4-pass bench sweep calls this per row). Same exact
    // doubles: reassociation only splits the sum by axis, and the ×2
    // invariance argument is unchanged (every term still scales).
    val rowPass = new Array[Double](32 * 8) // [y][u]
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < 32) {
          acc += lum(y * 32 + x) * DctTab(u)(x)
          x += 1
        }
        rowPass(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 32) {
          acc += rowPass(yy * 8 + u) * DctTab(v)(yy)
          yy += 1
        }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = coef.drop(1).sorted // 63 AC coefficients, DC excluded
    val median = ac(31)
    var h = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > median) h |= 1L << (i - 1)
      i += 1
    }
    h
  }

  /** Exact ×2 contrast stretch of a P6 payload (raster bytes doubled;
    * header untouched). Caller guarantees bytes ≤ 127 so no clipping. */
  private[operators] def contrastDouble(p: Array[Byte]): Array[Byte] = {
    if (p == null) return null
    // raster starts after the 3rd '\n' ("P6\n<w> <h>\n255\n")
    var nl = 0
    var i = 0
    while (i < p.length && nl < 3) { if (p(i) == '\n') nl += 1; i += 1 }
    val out = p.clone()
    while (i < out.length) {
      out(i) = math.min((out(i) & 0xff) * 2, 255).toByte
      i += 1
    }
    out
  }

  def m19PhashGate(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val cd = udf { p: Array[Byte] => contrastDouble(p) }
    val base = docs
      .select(col("doc_id"), ppmPayload(col("text")).as("img"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        cd(ppmPayload(col("text"))).as("img"))
    val ph = udf { p: Array[Byte] => pHash(codec, p) }
    val hashed = base.unionByName(planted)
      .select(col("doc_id"), ph(col("img")).as("phash"),
        md5(col("img")).as("byte_h"))
    def dupJoin(c: String) = {
      val dups = hashed.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).select(c)
      hashed.where(col("doc_id") >= Dedup.PlantOffset)
        .join(dups, Seq(c), "left_semi")
    }
    hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .agg(count(lit(1)).as("n_planted"))
      .crossJoin(dupJoin("phash")
        .agg(count(lit(1)).as("n_phash_matched")))
      .crossJoin(dupJoin("byte_h")
        .agg(count(lit(1)).as("n_byte_matched")))
      .select(col("n_planted"), col("n_phash_matched"),
        col("n_byte_matched"),
        (col("n_planted") === 20 && col("n_phash_matched") === 20 &&
          col("n_byte_matched") === 0).as("recall_ok"))
  }

  /** Constant-gate oracle (m06's pattern): the planted invariance is
    * provable, so the expected counts are literals the driver
    * value-checks. */
  val m19Sql: String =
    """SELECT CAST(20 AS BIGINT) AS n_planted,
      |  CAST(20 AS BIGINT) AS n_phash_matched,
      |  CAST(0 AS BIGINT) AS n_byte_matched,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- m20
  /** CREST FACTOR (peak-to-RMS ratio) — the dynamic-range QC metric a
    * loudness pipeline reports next to m17's RMS (broadcast loudness
    * wars: over-compressed audio shows a LOW crest factor; raw speech a
    * high one). Peak and energy come from one pass over the recentered
    * PCM stream; rms_milli reuses m17's staged integer/isqrt form and
    * crest_milli = (10⁶·peak) div rms_milli — all integer, restated
    * verbatim by the oracle over the same byte-level amplitudes.
    *
    * Scale shape: decode is a narrow per-row pass (two longs leave the
    * executor per clip); no shuffle at all before the output sort. */
  def m20CrestFactor(s: SparkSession, d: String): DataFrame = {
    val codec = audioCodecFor(s)
    val stats = udf { p: Array[Byte] =>
      val sm = codec.samples(p)
      if (sm == null) null
      else {
        var peak = 0L
        var energy = 0L
        var i = 0
        while (i < sm.length) {
          val a = sm(i).toLong
          if (math.abs(a) > peak) peak = math.abs(a)
          energy += a * a
          i += 1
        }
        (sm.length.toLong, peak, energy)
      }
    }
    Tables.documents(s, d)
      .select(col("doc_id"),
        stats(wavPayload(col("text"))).as("st"))
      .select(col("doc_id"), col("st._1").as("n_samples"),
        col("st._2").as("peak"), col("st._3").as("energy"))
      .where(col("n_samples") > 0)
      .withColumn("rms_milli", expr(
        "CAST(floor(sqrt(CAST((1000000 * energy) div n_samples" +
          " AS DOUBLE))) AS BIGINT)"))
      .withColumn("crest_milli", expr(
        "CASE WHEN rms_milli = 0 THEN NULL" +
          " ELSE (1000000 * peak) div rms_milli END"))
      .orderBy("doc_id")
  }

  val m20Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
      |  WHERE length(text) > 0),
      |s AS (SELECT doc_id, n, unnest(range(0, n)) AS pos, text FROM d),
      |a AS (SELECT doc_id, n,
      |    ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM s),
      |e AS (SELECT doc_id, MAX(n) AS n_samples,
      |    MAX(ABS(amp)) AS peak, SUM(amp * amp) AS energy
      |  FROM a GROUP BY doc_id),
      |r AS (SELECT doc_id, n_samples, peak, energy,
      |    CAST(floor(sqrt(CAST((1000000 * energy) // n_samples
      |      AS DOUBLE))) AS BIGINT) AS rms_milli
      |  FROM e)
      |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
      |  CAST(peak AS BIGINT) AS peak, CAST(energy AS BIGINT) AS energy,
      |  rms_milli,
      |  CAST(CASE WHEN rms_milli = 0 THEN NULL
      |    ELSE (1000000 * peak) // rms_milli END AS BIGINT)
      |    AS crest_milli
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m21
  /** HISTOGRAM EQUALIZATION — the classic contrast-normalization kernel
    * (OpenCV `equalizeHist`) in its exact integer form: per image, the
    * luma histogram's CDF remaps each level to
    * ((cdf(v) − cdf_min)·255) div (n − cdf_min), stretching the
    * occupied range to [0, 255]. Unusually for an image op, the WHOLE
    * transform is value-checked: the synthetic PPM raster is the
    * document text, so the DuckDB oracle rebuilds the per-pixel lumas
    * with ascii() arithmetic, replays the same integer CDF remap, and
    * matches the checksum Σ out(v)·hist(v) — not just summary stats.
    * Flat images (one luma level) map to 0 by the n = cdf_min guard.
    *
    * Scale shape: one narrow decode+histogram pass per row (256-long
    * local array, 6 longs leave the executor); no shuffle before the
    * output sort. */
  def m21EqualizeHist(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val eq = udf { p: Array[Byte] =>
      val r = codec.raster(p)
      val n = (r.width * r.height).toLong
      val hist = new Array[Long](256)
      var i = 0
      while (i < n) {
        val o = i.toInt * 3
        val l = ((r.rgb(o) & 0xff) + (r.rgb(o + 1) & 0xff) +
          (r.rgb(o + 2) & 0xff)) / 3
        hist(l) += 1
        i += 1
      }
      var cdf = 0L
      var cdfMin = -1L
      var nIn = 0L
      var checksum = 0L
      var minOut = 256L
      var maxOut = -1L
      val outs = new java.util.HashSet[Long]()
      var v = 0
      while (v < 256) {
        if (hist(v) > 0) {
          cdf += hist(v)
          if (cdfMin < 0) cdfMin = cdf
          val out =
            if (n == cdfMin) 0L
            else ((cdf - cdfMin) * 255L) / (n - cdfMin)
          nIn += 1
          checksum += out * hist(v)
          outs.add(out)
          if (out < minOut) minOut = out
          if (out > maxOut) maxOut = out
        }
        v += 1
      }
      (n, nIn, outs.size.toLong, minOut, maxOut, checksum)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), eq(ppmPayload(col("text"))).as("e"))
      .select(col("doc_id"), col("e._1").as("n_pixels"),
        col("e._2").as("n_lumas_in"), col("e._3").as("n_lumas_out"),
        col("e._4").as("min_out"), col("e._5").as("max_out"),
        col("e._6").as("checksum"))
      .orderBy("doc_id")
  }

  val m21Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n,
      |    CAST(greatest(ceil(length(text) / 48.0), 1) AS BIGINT) AS h
      |  FROM documents),
      |pix AS (SELECT doc_id, n, h, text,
      |    unnest(range(0, h * 16)) AS pi
      |  FROM d),
      |lum AS (SELECT doc_id, h,
      |    (CASE WHEN pi * 3 < n
      |       THEN ascii(substring(text, CAST(pi * 3 + 1 AS BIGINT), 1))
      |       ELSE 32 END
      |     + CASE WHEN pi * 3 + 1 < n
      |       THEN ascii(substring(text, CAST(pi * 3 + 2 AS BIGINT), 1))
      |       ELSE 32 END
      |     + CASE WHEN pi * 3 + 2 < n
      |       THEN ascii(substring(text, CAST(pi * 3 + 3 AS BIGINT), 1))
      |       ELSE 32 END) // 3 AS l
      |  FROM pix),
      |hist AS (SELECT doc_id, MAX(h) AS h, l, COUNT(*) AS cnt
      |  FROM lum GROUP BY doc_id, l),
      |c AS (SELECT doc_id, h * 16 AS npix, l, cnt,
      |    SUM(cnt) OVER (PARTITION BY doc_id ORDER BY l) AS cdf,
      |    FIRST_VALUE(cnt) OVER (PARTITION BY doc_id ORDER BY l)
      |      AS cdf_min
      |  FROM hist),
      |o AS (SELECT doc_id, npix, l, cnt,
      |    CASE WHEN npix = cdf_min THEN 0
      |      ELSE ((cdf - cdf_min) * 255) // (npix - cdf_min) END AS outv
      |  FROM c)
      |SELECT doc_id, CAST(MAX(npix) AS BIGINT) AS n_pixels,
      |  COUNT(*) AS n_lumas_in,
      |  CAST(COUNT(DISTINCT outv) AS BIGINT) AS n_lumas_out,
      |  CAST(MIN(outv) AS BIGINT) AS min_out,
      |  CAST(MAX(outv) AS BIGINT) AS max_out,
      |  CAST(SUM(outv * cnt) AS BIGINT) AS checksum
      |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta"    -> (m01BinaryMetaOracle _),
    "m02_frame_features" -> (m02FrameFeatures _),
    "m03_image_stats"    -> (m03ImageStats _),
    "m04_image_resize"   -> (m04ImageResize _),
    "m05_video_frames"   -> (m05VideoFrames _),
    "m06_image_dhash_gate" -> (m06ImageDhashGate _),
    "m07_audio_fp_gate"  -> (m07AudioFpGate _),
    "m08_video_fp_gate"  -> (m08VideoFpGate _),
    "m09_audio_resample" -> (m09AudioResample _),
    "m10_image_augment"  -> (m10ImageAugment _),
    "m11_scene_cuts"     -> (m11SceneCuts _),
    "m12_image_patchify" -> (m12ImagePatchify _),
    "m13_audio_segments"  -> (m13AudioSegments _),
    "m14_letterbox_detect" -> (m14LetterboxDetect _),
    "m15_keyframes"        -> (m15Keyframes _),
    "m16_caption_align"    -> (m16CaptionAlign _),
    "m17_loudness"         -> (m17Loudness _),
    "m18_split_leakage_gate" -> (m18SplitLeakageGate _),
    "m19_phash_gate" -> (m19PhashGate _),
    "m20_crest_factor" -> (m20CrestFactor _),
    "m21_equalize_hist" -> (m21EqualizeHist _))

  // ---------------------------------------------------------------- m18
  /** TRAIN/VAL SPLIT LEAKAGE AUDIT for images — t27's cluster-safe
    * split discipline applied to the perceptual domain: a hash-based
    * split (t26's md5 rule) is only sound if no PERCEPTUAL duplicate
    * straddles the boundary, and doc-id hashing cannot see that — the
    * planted copies carry fresh ids, so ~20%/80% of them land opposite
    * their originals by construction. The detector is m06's dHash over
    * the REAL decoded payloads: an image leaks when its dHash also
    * appears on the other side. The oracle restates leakage through
    * TEXT equality (identical text ⇒ identical payload ⇒ identical
    * dHash), so the detector's counts — planted AND natural duplicate
    * families — are value-checked, not just verdict-gated.
    *
    * Scale shape: one decode+hash pass, ONE uniform dhash-keyed
    * self-join confined to hash groups (duplicate-family-sized
    * blocks), distinct on the leaking ids; nothing corpus². */
  def m18SplitLeakageGate(s: SparkSession, d: String): DataFrame = {
    val codec = imageCodecFor(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val planted = docs.orderBy(col("doc_id").asc).limit(20)
      .select((col("doc_id") + lit(Dedup.PlantOffset)).as("doc_id"),
        col("text"))
    val all = docs.unionByName(planted)
      .withColumn("split",
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long") % 10 < 8, "train").otherwise("val"))
    val dh = udf { p: Array[Byte] => dHash(codec, p) }
    val hashed = all.select(col("doc_id"), col("split"),
      dh(ppmPayload(col("text"))).as("dhash"),
      md5(encode(col("text"), "UTF-8")).as("pmd5"))
    def leaksBy(key: String): DataFrame = {
      val other = hashed.select(col(key), col("doc_id").as("oid"),
        col("split").as("osplit"))
      hashed.join(other, Seq(key))
        .where(col("oid") =!= col("doc_id") &&
          col("osplit") =!= col("split"))
        .select(col("doc_id")).distinct()
    }
    // exact duplicates (payload md5) — oracle-restatable via text
    // equality; perceptual (dHash) is coarser by construction, so the
    // value-checked contract is the exact counts plus the SUPERSET
    // theorem: identical payload ⇒ identical dHash ⇒ every exact leak
    // is also a perceptual leak
    val exact = leaksBy("pmd5")
    val perceptual = leaksBy("dhash")
    val missed = exact.join(perceptual, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    hashed.where(col("doc_id") >= Dedup.PlantOffset)
      .join(exact, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_planted_leaking"))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_leaking_exact"))))
      .crossJoin(broadcast(missed))
      .select(lit(20L).as("n_planted"), col("n_planted_leaking"),
        col("n_leaking_exact"),
        (col("n_missed") === 0L).as("perceptual_superset_ok"))
  }

  /** Text-equality restatement of the exact leak detector; the
    * perceptual superset theorem is restated as its literal truth. */
  val m18Sql: String =
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |pl AS (SELECT doc_id + 1000000000 AS doc_id, text FROM (
      |  SELECT doc_id, text FROM docs ORDER BY doc_id LIMIT 20)),
      |al AS (SELECT * FROM docs UNION ALL SELECT * FROM pl),
      |sp AS (SELECT doc_id, text,
      |    CASE WHEN CAST(CONCAT('0x',
      |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
      |      THEN 'train' ELSE 'val' END AS split
      |  FROM al),
      |lk AS (SELECT DISTINCT a.doc_id FROM sp a JOIN sp b
      |  ON a.text = b.text AND a.doc_id <> b.doc_id
      |    AND a.split <> b.split)
      |SELECT CAST(20 AS BIGINT) AS n_planted,
      |  CAST((SELECT COUNT(*) FROM lk WHERE doc_id >= 1000000000)
      |    AS BIGINT) AS n_planted_leaking,
      |  CAST((SELECT COUNT(*) FROM lk) AS BIGINT) AS n_leaking_exact,
      |  TRUE AS perceptual_superset_ok""".stripMargin

  // ---------------------------------------------------------------- m17
  /** LOUDNESS NORMALIZATION ANALYSIS (ffmpeg loudnorm's measurement
    * pass, RMS flavor) — the per-clip gain a speech corpus applies
    * before feature extraction so quiet and loud recordings train
    * alike: RMS amplitude from the REAL decoded samples (total sample
    * energy through the WAV codec), target 80.0 raw units, gain =
    * target/rms as integer permille. The only non-rational step is
    * `floor(sqrt(…))` — the t39 discipline: IEEE mandates sqrt
    * correctly rounded, so the integer result is bit-identical across
    * engines, unlike any ln/pow route. Silent clips report NULL gain
    * (a gain for silence is undefined, not infinite).
    *
    * One decode pass → ONE per-clip sum aggregate (map-side
    * combinable) → per-row integer arithmetic. Nothing corpus-global;
    * the gain column is exactly what a downstream `transform(samples,
    * s -> s · gain div 1000)` map consumes. */
  def m17Loudness(s: SparkSession, d: String): DataFrame = {
    val (fr, _) = audioActiveRuns(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long")
        .as("n_samples"))
    fr.groupBy(col("doc_id"))
      .agg(sum(col("energy")).as("energy"))
      .join(docs, Seq("doc_id"))
      .withColumn("rms_milli", expr(
        "CAST(floor(sqrt(CAST((1000000 * energy) div n_samples" +
          " AS DOUBLE))) AS BIGINT)"))
      .withColumn("gain_permille", expr(
        "CASE WHEN rms_milli = 0 THEN NULL" +
          " ELSE 80000000 div rms_milli END"))
      .select(col("doc_id"), col("n_samples"), col("energy"),
        col("rms_milli"), col("gain_permille"))
      .orderBy("doc_id")
  }

  /** m02/m13's amp-energy restatement, then the identical staged
    * integer/isqrt arithmetic. */
  val m17Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |s AS (SELECT doc_id, n,
      |  unnest(range(0, n)) AS pos, text FROM d),
      |a AS (SELECT doc_id, n,
      |  ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM s),
      |e AS (SELECT doc_id, MAX(n) AS n_samples, SUM(amp * amp) AS energy
      |  FROM a GROUP BY doc_id),
      |r AS (SELECT doc_id, n_samples, energy,
      |    CAST(FLOOR(SQRT(CAST((1000000 * energy) // n_samples
      |      AS DOUBLE))) AS BIGINT) AS rms_milli
      |  FROM e)
      |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples,
      |  CAST(energy AS BIGINT) AS energy,
      |  rms_milli,
      |  CAST(CASE WHEN rms_milli = 0 THEN NULL
      |    ELSE 80000000 // rms_milli END AS BIGINT) AS gain_permille
      |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m16
  /** CAPTION ↔ AUDIO-SEGMENT ALIGNMENT — the multimodal JOIN step a
    * speech/caption corpus runs after VAD (m13): each timed caption
    * window must find the activity segment backing it (a caption over
    * silence is a sync error; the per-caption best segment seeds
    * forced alignment). Per clip, captions interval-join the m13
    * active runs and keep the argmax-overlap segment (ties → earliest
    * segment), with silent clips and off-the-end captions reporting
    * (0, −1) rather than vanishing. The null-segment case is guarded
    * EXPLICITLY — both engines' least/greatest skip NULLs, so an
    * unguarded overlap formula would hallucinate full overlap on
    * silent clips.
    *
    * Scale shape: the join is clip-keyed (captions and runs of ONE
    * clip — physically bounded), the argmax is a map-side-combinable
    * max(struct(ov, −start)) per caption, no window over candidates,
    * nothing corpus-global. */
  def m16CaptionAlign(s: SparkSession, d: String): DataFrame = {
    val (fr, runs) = audioActiveRuns(s, d)
    val nFrames = fr.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"))
    val caps = nFrames.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), lit(3L))).as("cap_idx"))
      .withColumn("cap_start",
        (col("cap_idx") * 7 + col("doc_id") % 3).cast("long"))
      .withColumn("cap_end", col("cap_start") + 5L)
      .where(col("cap_start") < col("n_frames"))
      .select(col("doc_id"), col("cap_idx"), col("cap_start"),
        col("cap_end"))
    val segs = runs.select(col("doc_id"),
      col("run_start").cast("long").as("run_start"),
      (col("run_start") + col("run_len")).cast("long").as("seg_end"))
    caps.join(segs, Seq("doc_id"), "left")
      .withColumn("ov",
        when(col("run_start").isNull, lit(0L))
          .otherwise(greatest(lit(0L),
            least(col("cap_end"), col("seg_end")) -
              greatest(col("cap_start"), col("run_start")))))
      .groupBy(col("doc_id"), col("cap_idx"), col("cap_start"),
        col("cap_end"))
      .agg(max(when(col("ov") > 0,
        struct(col("ov"), (-col("run_start")).as("neg")))).as("best"))
      .select(col("doc_id"), col("cap_idx"), col("cap_start"),
        col("cap_end"),
        coalesce(col("best.ov"), lit(0L)).as("ov_frames"),
        coalesce(-col("best.neg"), lit(-1L)).as("best_seg_start"))
      .orderBy("doc_id", "cap_idx")
  }

  /** m13's frame-energy + islands restatement, extended with the caption
    * grid and the guarded interval argmax. */
  val m16Sql: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |f AS (SELECT doc_id, n, text,
      |  unnest(range(0, (n + 63) // 64)) AS fi FROM d),
      |s AS (SELECT doc_id, fi,
      |  unnest(range(fi * 64, least(fi * 64 + 64, n))) AS pos, text FROM f),
      |a AS (SELECT doc_id, fi,
      |  ascii(substring(text, CAST(pos + 1 AS BIGINT), 1)) - 128 AS amp
      |  FROM s),
      |e AS (SELECT doc_id, fi, SUM(amp * amp) AS energy
      |  FROM a GROUP BY doc_id, fi),
      |act AS (SELECT doc_id, fi, (energy >= 130000) AS active FROM e),
      |runs AS (
      |  SELECT doc_id,
      |    fi - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fi) AS grp,
      |    fi
      |  FROM act WHERE active),
      |r2 AS (SELECT doc_id, grp, COUNT(*) AS run_len, MIN(fi) AS run_start
      |  FROM runs GROUP BY doc_id, grp),
      |tot AS (SELECT doc_id, COUNT(*) AS n_frames FROM act
      |  GROUP BY doc_id),
      |cg AS (SELECT doc_id, n_frames, unnest(range(0, 4)) AS cap_idx
      |  FROM tot),
      |caps AS (SELECT doc_id, cap_idx,
      |    cap_idx * 7 + doc_id % 3 AS cap_start,
      |    cap_idx * 7 + doc_id % 3 + 5 AS cap_end
      |  FROM cg WHERE cap_idx * 7 + doc_id % 3 < n_frames),
      |ovl AS (SELECT c.doc_id, c.cap_idx, c.cap_start, c.cap_end,
      |    r.run_start,
      |    CASE WHEN r.run_start IS NULL THEN 0
      |      ELSE GREATEST(0, LEAST(c.cap_end, r.run_start + r.run_len)
      |        - GREATEST(c.cap_start, r.run_start)) END AS ov
      |  FROM caps c LEFT JOIN r2 r ON c.doc_id = r.doc_id),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, cap_idx
      |    ORDER BY ov DESC, run_start ASC) AS rn FROM ovl)
      |SELECT doc_id, CAST(cap_idx AS BIGINT) AS cap_idx,
      |  CAST(cap_start AS BIGINT) AS cap_start,
      |  CAST(cap_end AS BIGINT) AS cap_end,
      |  CAST(CASE WHEN ov > 0 THEN ov ELSE 0 END AS BIGINT) AS ov_frames,
      |  CAST(CASE WHEN ov > 0 THEN run_start ELSE -1 END AS BIGINT)
      |    AS best_seg_start
      |FROM rk WHERE rn = 1 ORDER BY doc_id, cap_idx""".stripMargin

  val oracles: Map[String, String] = Map(
    "m01_binary_meta"    -> m01Sql,
    "m02_frame_features" -> m02Sql,
    "m03_image_stats"    -> m03Sql,
    "m04_image_resize"   -> m04Sql,
    "m05_video_frames"   -> m05Sql,
    "m06_image_dhash_gate" -> m06Sql,
    "m07_audio_fp_gate"  -> m07Sql,
    "m08_video_fp_gate"  -> m08Sql,
    "m09_audio_resample" -> m09Sql,
    "m10_image_augment"  -> m10Sql,
    "m11_scene_cuts"     -> m11Sql,
    "m12_image_patchify" -> m12Sql,
    "m13_audio_segments"  -> m13Sql,
    "m14_letterbox_detect" -> m14Sql,
    "m15_keyframes"        -> m15Sql,
    "m16_caption_align"    -> m16Sql,
    "m17_loudness"         -> m17Sql,
    "m18_split_leakage_gate" -> m18Sql,
    "m19_phash_gate" -> m19Sql,
    "m20_crest_factor" -> m20Sql,
    "m21_equalize_hist" -> m21Sql)
}
