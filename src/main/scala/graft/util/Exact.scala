package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-determinism helpers.
  *
  * The driver hash-compares Spark results against DuckDB running equivalent
  * SQL on the same parquet files. Floating-point SUM/AVG are
  * order-of-evaluation dependent, and Spark's partition-parallel sums would
  * not reproduce DuckDB's sequential sums bit-for-bit. So every aggregated
  * measure goes through exact DECIMAL arithmetic (identical in both engines:
  * the double → decimal cast rounds the same binary value the same way) and
  * is cast back to DOUBLE at the end (exact decimal → double conversion is
  * deterministic IEEE, identical in both engines).
  *
  * DuckDB-side mirror of `dsum(x)`: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  * Mirror of `davg(x)`: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`.
  *
  * This costs ~2× vs a native double sum at scale (decimal128 adds), which is
  * the price of a bit-exact cross-engine oracle; a production deployment
  * would flip `EXACT = false` style switches per query, not per engine.
  */
object Exact {
  val S = 4 // scale: testdata monetary/quantity columns are ≤2 dp

  /** Exact sum of a double column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, S))).cast(DoubleType)

  /** Exact average (sum/count, both deterministic), returned as DOUBLE. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact product-sum like SUM(a*b) — cast each factor first. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, S)) * b.cast(DecimalType(18, S))).cast(DoubleType)

  /** long-typed sum for integer columns (DuckDB SUM(int) is HUGEINT → cast both). */
  def lsum(c: Column): Column = sum(c).cast("long")
}
