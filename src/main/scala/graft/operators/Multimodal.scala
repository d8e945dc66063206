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
  /** STUBBED decoder (???-equivalent): a real deployment would decode the
    * blob with an image/audio codec inside this UDF (or `mapInPandas` on
    * the Python side); the container has no codec libs, so the stub derives
    * a deterministic fake "feature vector" from the bytes. The pipeline
    * shape — binary in, fixed-width float array out, batch-friendly,
    * null-safe — is the real, tested part. */
  private val FeatDim = 8
  val decodeStub: UserDefinedFunction = udf { payload: Array[Byte] =>
    if (payload == null) null
    else {
      val out = new Array[Double](FeatDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatDim) += (payload(i) & 0xff).toDouble / 255.0
        i += 1
      }
      out
    }
  }

  /** "Frame sampling" + feature extraction over the opaque payload:
    * fixed-size frames via pure builtins, every 4th frame kept (the
    * sample-then-decode pattern that avoids decoding what you drop),
    * then the stub decoder per sampled frame. */
  def m02FrameFeatures(s: SparkSession, d: String): DataFrame = {
    val frameLen = 64
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
        decodeStub(col("frame")).as("feat"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
        round(element_at(col("feat"), 1), 6).as("feat0"),
        round(element_at(col("feat"), FeatDim), 6).as("feat7"))
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta"    -> (m01BinaryMetaOracle _),
    "m02_frame_features" -> (m02FrameFeatures _))

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql)
}
