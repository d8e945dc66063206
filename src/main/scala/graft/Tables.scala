package graft

import org.apache.spark.sql.{functions, types, DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet corpus (TESTDATA.md).
  *
  * Every table is a plain parquet scan — Catalyst sees the file relation
  * directly, so filter pushdown / column pruning / partition-size planning
  * all apply. At 100 TB these would be partitioned tables; the API shape
  * (dir + name) is the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects by
    * default. Read it as a nanos long (legacy conf) and convert to a µs
    * TIMESTAMP_NTZ — same wall-clock the oracle sees (events µs-aligned). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == types.LongType)
      raw.withColumn("ts",
        functions.timestamp_micros(functions.expr("ts div 1000"))
          .cast(types.TimestampNTZType))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
