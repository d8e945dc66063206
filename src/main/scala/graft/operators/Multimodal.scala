package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extract stages. The decode step is a STUB (no
  * image/audio codecs in this container — deterministic fake decoder), but
  * the Spark-side plumbing is real: binary columns, metadata structs,
  * batch-shaped per-partition processing, pruned-schema friendly layout.
  * At 100 TB the payload column lives in its own parquet column chunk, so
  * metadata-only queries never read the bytes.
  */
object Multimodal {

  /** Synthesize a binary payload column from text (UTF-8 bytes) — stands in
    * for an image/audio blob; everything downstream treats it as opaque. */
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

  // ---------------------------------------------------------------- m02
  /** The decode seam: a real deployment plugs an image/audio codec here
    * (javax.imageio, ffmpeg bindings, …) without touching the operators —
    * implement [[Codec]], put the class on BOTH the driver and executor
    * classpaths (`--jars` does both), and select it per session via
    * `spark.graft.codec` (fully-qualified class name, no-arg
    * constructor). The instance is constructed once on the driver —
    * through the context classloader, so `--jars`-shipped classes
    * resolve — and serialized into the decode UDF's closure. Default is
    * [[StubCodec]]. */
  trait Codec extends Serializable {
    /** Fixed width of every vector [[decode]] returns. */
    def dim: Int
    /** Decode one opaque payload (image frame / audio window) to a
      * fixed-width feature vector; null payload → null. */
    def decode(payload: Array[Byte]): Array[Double]
  }

  /** STUBBED default decoder (???-equivalent): a real deployment would
    * decode the blob with a codec lib (or `mapInPandas` on the Python
    * side); the container has no codec libs, so the stub derives a
    * deterministic fake "feature vector" from the bytes. The pipeline
    * shape — binary in, fixed-width float array out, batch-friendly,
    * null-safe — is the real, tested part. Each bin accumulates an exact
    * integer byte-sum and divides once, so the result is one IEEE division
    * — bit-identical regardless of accumulation order (oracle-safe). */
  final class StubCodec extends Codec {
    val dim = 8
    def decode(payload: Array[Byte]): Array[Double] =
      if (payload == null) null
      else {
        val sums = new Array[Long](dim)
        var i = 0
        while (i < payload.length) {
          sums(i % dim) += (payload(i) & 0xff).toLong
          i += 1
        }
        sums.map(_.toDouble / 255.0)
      }
  }

  private def codecFor(s: SparkSession): Codec =
    s.conf.getOption("spark.graft.codec") match {
      case Some(cls) if cls.nonEmpty =>
        val loader = Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader)
        Class.forName(cls, true, loader).getDeclaredConstructor()
          .newInstance().asInstanceOf[Codec]
      case _ => new StubCodec
    }

  private def decodeUdf(codec: Codec): UserDefinedFunction =
    udf { payload: Array[Byte] => codec.decode(payload) }

  /** "Frame sampling" + feature extraction over the opaque payload:
    * fixed-size frames via pure builtins, every 4th frame kept (the
    * sample-then-decode pattern that avoids decoding what you drop),
    * then the stub decoder per sampled frame. */
  def m02FrameFeatures(s: SparkSession, d: String): DataFrame = {
    val frameLen = 64
    val codec = codecFor(s)
    val framed = withPayload(Tables.documents(s, d))
      .select(col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0),
              greatest(floor((length(col("payload")) - 1) / frameLen)
                .cast(IntegerType), lit(0))),
            i => substring(col("payload"), (i * frameLen + 1).cast(IntegerType), lit(frameLen))))
          .as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % 4 === 0)
    framed
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        decodeUdf(codec)(col("frame")).as("feat"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
        element_at(col("feat"), 1).as("feat0"),
        element_at(col("feat"), codec.dim).as("feat7"))
      .orderBy("doc_id", "frame_idx")
  }

  /** DuckDB equivalent of m02: the corpus text is pure ASCII (asserted by
    * the oracle itself via the n-check pattern: octet_length==length holds
    * for driver data), so byte arithmetic over the UTF-8 payload equals
    * char arithmetic over the text. Each feature bin is an exact integer
    * byte-sum divided once — the same IEEE double on both engines. */
  val m02Sql: String =
    """WITH framed AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, CAST(greatest(floor((length(text) - 1) / 64.0), 0) AS BIGINT) + 1)) AS frame_idx
      |  FROM documents),
      |frames AS (
      |  SELECT doc_id, frame_idx,
      |    substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS frame
      |  FROM framed WHERE frame_idx % 4 = 0),
      |bytes AS (
      |  -- range over max(len,1) so a zero-length tail frame still yields
      |  -- its row (Spark emits it with feat=0), guarded below
      |  SELECT doc_id, frame_idx, length(frame) AS frame_bytes,
      |    unnest(range(0, greatest(length(frame), 1))) AS pos, frame
      |  FROM frames)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(MAX(frame_bytes) AS INT) AS frame_bytes,
      |  CAST(SUM(CASE WHEN pos % 8 = 0 AND pos < frame_bytes THEN ascii(substring(frame, CAST(pos + 1 AS BIGINT), 1)) ELSE 0 END) AS DOUBLE) / 255.0 AS feat0,
      |  CAST(SUM(CASE WHEN pos % 8 = 7 AND pos < frame_bytes THEN ascii(substring(frame, CAST(pos + 1 AS BIGINT), 1)) ELSE 0 END) AS DOUBLE) / 255.0 AS feat7
      |FROM bytes GROUP BY doc_id, frame_idx
      |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta"    -> (m01BinaryMetaOracle _),
    "m02_frame_features" -> (m02FrameFeatures _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql,
    "m02_frame_features" -> m02Sql)
}
