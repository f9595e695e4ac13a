package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Join coverage (SURVEY.md §2.5): left joins with null counting, computed-key
  * joins, chained dimension joins, semi/anti, scalar subqueries, CASE recodes
  * feeding a join.
  */
object Joins {

  /** q05 — left join + count-of-matches (J1/J3 left equi, app/etl.py:146-150;
    * COUNT(col) null-skipping). The probe side is filtered BEFORE the join so
    * the shuffle carries only matching candidates — at 100 TB the filter
    * pushdown (visible as PushedFilters on the orders scan) is what keeps
    * this join small.
    */
  def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
    c.join(big, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").as("n_big_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("big_total"),
      )
      .orderBy($"c_custkey")
  }

  val q05Oracle: String =
    """SELECT c_custkey, c_name,
      |  COUNT(o_orderkey) AS n_big_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS big_total
      |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
      |  ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  /** q06 — left join on COMPUTED keys (J4: app/routes/data.py:142-145 joins
    * on EXTRACT(YEAR)=year AND EXTRACT(WEEK)=week). Reproduces the
    * reference's ISO-week semantics exactly: week 1 can fall in the prior
    * calendar year (SURVEY.md §2.8), and both engines agree because
    * Spark weekofyear == DuckDB weekofyear == ISO-8601.
    */
  def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val liWeekly = Tables.lineitem(s, dir)
      .groupBy(year($"l_shipdate").as("yr"), weekofyear($"l_shipdate").as("wk"))
      .agg(dsum($"l_quantity").as("ship_qty"))
    val ordWeekly = Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("o_yr"), weekofyear($"o_orderdate").as("o_wk"))
      .agg(dsum($"o_totalprice").as("order_total"))
    liWeekly
      .join(ordWeekly, $"yr" === $"o_yr" && $"wk" === $"o_wk", "left")
      .select($"yr", $"wk", $"ship_qty", $"order_total")
      .orderBy($"yr", $"wk")
  }

  val q06Oracle: String =
    """WITH li AS (
      |  SELECT year(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS ship_qty
      |  FROM lineitem GROUP BY 1, 2),
      |ow AS (
      |  SELECT year(o_orderdate) AS o_yr, weekofyear(o_orderdate) AS o_wk,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS order_total
      |  FROM orders GROUP BY 1, 2)
      |SELECT yr, wk, ship_qty, order_total
      |FROM li LEFT JOIN ow ON yr = o_yr AND wk = o_wk
      |ORDER BY yr, wk""".stripMargin

  /** q17 — CASE/WHEN recode chain feeding a broadcast-dim join (F7: the
    * 7-branch region-name CASE at app/etl.py:81-88; J3). nation (25 rows) is
    * explicitly broadcast — the customer side never shuffles.
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.nation(s, dir).select(
      $"n_nationkey",
      when($"n_regionkey" === 0, "Africa")
        .when($"n_regionkey" === 1, "America")
        .when($"n_regionkey" === 2, "Asia")
        .when($"n_regionkey" === 3, "Europe")
        .otherwise("Other").as("region_label"),
    )
    Tables.customer(s, dir)
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"region_label")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"region_label")
  }

  val q17Oracle: String =
    """SELECT CASE WHEN n_regionkey = 0 THEN 'Africa'
      |            WHEN n_regionkey = 1 THEN 'America'
      |            WHEN n_regionkey = 2 THEN 'Asia'
      |            WHEN n_regionkey = 3 THEN 'Europe'
      |            ELSE 'Other' END AS region_label,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY region_label""".stripMargin

  /** q20 — scalar subquery on an aggregate (A7: Grafana panels 7/1,
    * `WHERE Year = (SELECT MAX(Year) …)`). The 1-row aggregate is
    * broadcast-joined against the fact — no shuffle of the big side.
    */
  def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val maxYr = o.agg(max(year($"o_orderdate")).as("max_yr"))
    o.join(broadcast(maxYr), year($"o_orderdate") === $"max_yr")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .orderBy($"o_orderstatus")
  }

  val q20Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE year(o_orderdate) = (SELECT MAX(year(o_orderdate)) FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q21 — semi/anti join pair (beyond-reference completeness: EXISTS /
    * NOT EXISTS, SURVEY.md §2.5 notes the reference has none). Two probes
    * against the same filtered build side, recombined on the group key.
    */
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
    val withBig = c.join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with_big"))
    val withoutBig = c.join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without_big"))
    withBig
      .join(withoutBig, Seq("c_mktsegment"), "full_outer")
      .select(
        $"c_mktsegment",
        coalesce($"n_with_big", lit(0L)).as("n_with_big"),
        coalesce($"n_without_big", lit(0L)).as("n_without_big"),
      )
      .orderBy($"c_mktsegment")
  }

  val q21Oracle: String =
    """WITH bigc AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |SELECT c_mktsegment,
      |  COUNT(b.o_custkey) AS n_with_big,
      |  COUNT(*) - COUNT(b.o_custkey) AS n_without_big
      |FROM customer LEFT JOIN bigc b ON c_custkey = b.o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q22 — CTE → chained dim joins → ordered limit (the data.py CTE shape:
    * A4 three-key agg + J7 chained joins + O1 sort, app/routes/data.py:124-150).
    * Aggregates the fact FIRST (to supplier×week grain), then joins the two
    * small dims — the join input is orders of magnitude smaller than the fact.
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weekly = Tables.lineitem(s, dir)
      .groupBy($"l_suppkey", year($"l_shipdate").as("yr"), weekofyear($"l_shipdate").as("wk"))
      .agg(dsum($"l_quantity").as("qty"))
    weekly
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name", $"yr", $"wk", $"qty")
      .orderBy($"qty".desc, $"s_name", $"yr", $"wk")
      .limit(50)
  }

  val q22Oracle: String =
    """WITH weekly AS (
      |  SELECT l_suppkey, year(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1, 2, 3)
      |SELECT s_name, n_name, yr, wk, qty
      |FROM weekly
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY qty DESC, s_name, yr, wk LIMIT 50""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q05_left_join_counts", q05, Some(q05Oracle)),
    Q("q06_computed_key_join", q06, Some(q06Oracle)),
    Q("q17_case_recode_join", q17, Some(q17Oracle)),
    Q("q20_scalar_subquery", q20, Some(q20Oracle)),
    Q("q21_semi_anti_join", q21, Some(q21Oracle)),
    Q("q22_cte_chained_joins", q22, Some(q22Oracle)),
  )
}
