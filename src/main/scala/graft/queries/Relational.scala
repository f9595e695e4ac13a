package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.util.Exact._

/** One registered query: Spark implementation + optional DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY.md §5.1): every query has a total ordering
  * (unique tiebreaker) and every floating-point aggregate goes through exact
  * decimal arithmetic (see [[graft.util.Exact]]) so the driver's hash compare
  * is bit-stable across engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Core relational operator coverage (SURVEY.md §2) expressed over the
  * driver's TPC-H-ish testdata. Each query cites the reference operator ids
  * it re-expresses (e.g. A1, J4, W2 — see SURVEY.md §2 tables).
  */
object Relational {

  /** q01 — hash group-by with multiple exact-sum measures + avg.
    * Reference ops: A1/A2 (groupBy+sum, app/etl.py:111-117), F11 arithmetic,
    * A10 avg. Physical: partial+final HashAggregate, one shuffle on the two
    * group keys; scales linearly (no skew: returnflag/linestatus are
    * low-cardinality → 6 groups, partial agg collapses almost everything
    * map-side before the exchange).
    */
  def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" > 1.0)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumProd($"l_extendedprice", lit(1) - $"l_discount").as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_quantity > 1.0
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q04 — flagship: scan → join → join → agg → top-k.
    * Reference ops: J5/J6 (inner equi joins), A6 (multi-measure agg),
    * O2 (ORDER BY … LIMIT 5 → TakeOrderedAndProject,
    * app/routes/data.py:271-298). The fact-fact join (lineitem ⋈ orders)
    * shuffles on the join key; the customer join happens AFTER aggregation so
    * it joins ~|customers| rows, not ~|lineitem| rows — at 100 TB that
    * ordering is the difference between shuffling 100 TB and shuffling GBs.
    */
  def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val revByCust = li
      .join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(dsumProd($"l_extendedprice", lit(1) - $"l_discount").as("revenue"))
    revByCust
      .join(c, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"c_mktsegment", $"revenue")
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(5)
  }

  val q04Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 5""".stripMargin

  /** q44 — the `spark.sql(...)` surface: the same Catalyst plans are
    * reachable from SQL text over registered views (S5 table scans + the
    * serving layer's SQL-string idiom, app/routes/data.py). CTE + grouped
    * decimal sum + ranked window + QUALIFY-style subquery filter, all in
    * one SQL string; the DataFrame API and SQL front ends meet in the same
    * optimizer, so every plan property asserted elsewhere holds here too.
    */
  def q44(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql("""
      WITH rev AS (
        SELECT o_orderpriority, year(o_orderdate) AS yr,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders_v GROUP BY o_orderpriority, year(o_orderdate))
      SELECT * FROM (
        SELECT yr, o_orderpriority, CAST(rev AS DOUBLE) AS revenue,
               rank() OVER (PARTITION BY yr ORDER BY rev DESC, o_orderpriority) AS rnk
        FROM rev)
      WHERE rnk <= 3
      ORDER BY yr, rnk, o_orderpriority""")
  }

  val q44Oracle: String =
    """WITH rev AS (
      |  SELECT o_orderpriority, year(o_orderdate) AS yr,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY o_orderpriority, year(o_orderdate))
      |SELECT * FROM (
      |  SELECT yr, o_orderpriority, CAST(rev AS DOUBLE) AS revenue,
      |         rank() OVER (PARTITION BY yr ORDER BY rev DESC, o_orderpriority) AS rnk
      |  FROM rev)
      |WHERE rnk <= 3
      |ORDER BY yr, rnk, o_orderpriority""".stripMargin

  /** q45 — correlated subqueries (q20 covers the uncorrelated scalar form):
    * a correlated EXISTS filter plus a correlated scalar COUNT, both
    * decorrelated by Catalyst into joins — EXISTS becomes a left-semi
    * join, the scalar count a left outer aggregate join; nothing executes
    * per-row. The oracle runs the identical SQL, so the decorrelation's
    * semantics (not just its plan) are pinned.
    */
  def q45(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c_custkey, c_name,
        (SELECT COUNT(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer_v c
      WHERE EXISTS (SELECT 1 FROM orders_v o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      ORDER BY c_custkey""")
  }

  val q45Oracle: String =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Oracle)),
    Q("q04_top5_customers", q04, Some(q04Oracle)),
    Q("q44_sql_surface", q44, Some(q44Oracle)),
    Q("q45_correlated_subqueries", q45, Some(q45Oracle)),
  )
}
