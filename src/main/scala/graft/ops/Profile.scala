package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Column profiling — the data-quality sweep a training-data pipeline runs
  * before anything else (null rates, cardinalities, ranges). One aggregation
  * pass computes every column's stats simultaneously (4 aggregates ×
  * columns in a single partial+final HashAggregate — never one job per
  * column), then unpivots to the long (column, stat…) form.
  */
object Profile {

  /** Profile the given columns of a frame: one row per column with
    * null_count, n_distinct (exact), min/max rendered as strings.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val asRows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__nulls_$c").as("null_count"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
      )
    }
    wide
      .select(explode(array(asRows: _*)).as("p"))
      .select("p.col_name", "p.null_count", "p.n_distinct", "p.min_value", "p.max_value")
      .orderBy("col_name")
  }

  /** q35 — profile of the orders table's key columns. */
  def q35(s: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(s, dir),
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))

  val q35Oracle: String =
    """SELECT * FROM (
      |  SELECT 'o_custkey' AS col_name, COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_count,
      |    COUNT(DISTINCT o_custkey) AS n_distinct,
      |    CAST(MIN(o_custkey) AS VARCHAR) AS min_value, CAST(MAX(o_custkey) AS VARCHAR) AS max_value
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_totalprice),
      |    CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
      |) ORDER BY col_name""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q35_column_profile", q35, Some(q35Oracle)),
  )
}
