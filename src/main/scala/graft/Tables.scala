package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Plain parquet scans — no caching here, so Catalyst keeps full freedom for
  * column pruning and filter pushdown per query (the scan node is rebuilt per
  * plan; a `.cache()` would pin a materialized columnar copy and defeat
  * pushdown at 100 TB scale).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark's reader rejects without
    * the legacy nanos-as-long conf) and plain TIMESTAMP(MICROS) without a
    * UTC flag (read as TIMESTAMP_NTZ) have both shipped. Dispatch on the
    * footer schema and normalize to a session-zoned TimestampType either
    * way: raw nanos get exact integer division (a double division would
    * lose precision above 2^53 ns); NTZ micros get a cast, which is
    * value-preserving under the UTC sessions every entry point pins.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")

  /** The whole similarity/ANN surface (native [[graft.functions]]
    * expressions included) consumes `embedding` as ARRAY<FLOAT>; a
    * regeneration that ships doubles would silently break every getFloat
    * accessor (the round-4 events-ts lesson, applied proactively).
    *
    * A non-float footer FAILS LOUDLY instead of casting: the DuckDB oracles
    * read the raw parquet at its native precision, so a silent float32
    * downcast here would let near-tie top-k selections diverge from the
    * oracle while both sides look healthy (round-5 advice). If a
    * double-typed generation ever ships, the right fix is one explicit
    * normalization on BOTH sides, not a hidden one on one side.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = load(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case other => throw new IllegalStateException(
        s"embeddings.parquet ships embedding: $other; this engine's ANN surface " +
          "and its DuckDB oracles assume array<float> — normalize both sides " +
          "explicitly instead of silently casting (Tables.embeddings)")
    }
  }
}
