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

  /** q53 — FULL OUTER join (the one join shape the suite lacked; LEFT is
    * q05, INNER is everywhere, SEMI/ANTI are q21): urgent-order months vs
    * return-lineitem months. The sides genuinely diverge — l_shipdate runs
    * past the last o_orderdate, so the tail months exist only on the
    * returns side and the null-padding semantics are actually exercised,
    * not vacuously true. Both inputs aggregate to month grain BEFORE the
    * join (post-agg cardinality ≈ dozens of rows), so the full-outer
    * shuffle is over month keys, never raw facts.
    */
  def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy(year($"o_orderdate").as("yr"), month($"o_orderdate").as("mon"))
      .agg(count(lit(1)).as("n_urgent"))
    val b = Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .groupBy(year($"l_shipdate").as("yr_b"), month($"l_shipdate").as("mon_b"))
      .agg(count(lit(1)).as("n_returns"))
    a.join(b, $"yr" === $"yr_b" && $"mon" === $"mon_b", "full_outer")
      .select(
        coalesce($"yr", $"yr_b").as("yr"),
        coalesce($"mon", $"mon_b").as("mon"),
        $"n_urgent", $"n_returns")
      .orderBy($"yr", $"mon")
  }

  val q53Oracle: String =
    """WITH a AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon, COUNT(*) AS n_urgent
      |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2),
      |b AS (SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mon, COUNT(*) AS n_returns
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2)
      |SELECT COALESCE(a.yr, b.yr) AS yr, COALESCE(a.mon, b.mon) AS mon,
      |  a.n_urgent, b.n_returns
      |FROM a FULL OUTER JOIN b ON a.yr = b.yr AND a.mon = b.mon
      |ORDER BY yr, mon""".stripMargin

  /** q54 — LATERAL join (Spark 4 correlated table subquery): per-region
    * top-2 nations by high-balance customer count. The lateral subquery
    * sees each outer row's r_regionkey and carries its own ORDER BY +
    * LIMIT — the "top-k per outer row" idiom that window functions express
    * with a full partition sort; Catalyst decorrelates it into a join +
    * per-group limit instead. The outer side is tiny (regions); the inner
    * aggregate reduces customers to nation grain before any per-region
    * work.
    */
  def q54(s: SparkSession, dir: String): DataFrame = {
    Tables.region(s, dir).createOrReplaceTempView("region_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT r_name, t.n_name, t.n_high
      FROM region_v r, LATERAL (
        SELECT n_name, COUNT(*) AS n_high
        FROM nation_v n JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey AND c.c_acctbal > 9000
        GROUP BY n_name
        ORDER BY n_high DESC, n_name
        LIMIT 2) t
      ORDER BY r_name, n_high DESC, n_name""")
  }

  val q54Oracle: String =
    """SELECT r_name, t.n_name, t.n_high
      |FROM region r, LATERAL (
      |  SELECT n_name, COUNT(*) AS n_high
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey AND c.c_acctbal > 9000
      |  GROUP BY n_name
      |  ORDER BY n_high DESC, n_name
      |  LIMIT 2) t
      |ORDER BY r_name, n_high DESC, n_name""".stripMargin

  /** q55 — RECURSIVE CTE (Spark 4): a data-driven monthly calendar spine
    * from min to max order month, left-joined to urgent-order rollups so
    * empty months still appear — the warehouse gap-fill complement to
    * q41's window-based forward fill. The recursion is depth = #months
    * (bounded by the data's time span, not its volume); each step is a
    * one-row frame, and the spine join is a broadcast against the
    * pre-aggregated month rollup. DuckDB runs the identical recursion, so
    * the fixpoint semantics (anchor + step + termination) are oracle-pinned.
    */
  def q55(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql("""
      WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi FROM orders_v),
      months(mon, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE mon < hi),
      m AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon, COUNT(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
            FROM orders_v WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2)
      SELECT date_format(months.mon, 'yyyy-MM') AS month, COALESCE(m.n, 0) AS n_orders,
        COALESCE(m.total, 0.0) AS total_urgent
      FROM months LEFT JOIN m ON year(months.mon) = m.yr AND month(months.mon) = m.mon
      ORDER BY month""")
  }

  val q55Oracle: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
      |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi FROM orders),
      |months(mon, hi) AS (
      |  SELECT lo, hi FROM bounds
      |  UNION ALL
      |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE mon < hi),
      |m AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon, COUNT(*) AS n,
      |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2)
      |SELECT strftime(months.mon, '%Y-%m') AS month, COALESCE(m.n, 0) AS n_orders,
      |  COALESCE(m.total, 0.0) AS total_urgent
      |FROM months LEFT JOIN m ON year(months.mon) = m.yr AND month(months.mon) = m.mon
      |ORDER BY month""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q05_left_join_counts", q05, Some(q05Oracle)),
    Q("q06_computed_key_join", q06, Some(q06Oracle)),
    Q("q17_case_recode_join", q17, Some(q17Oracle)),
    Q("q20_scalar_subquery", q20, Some(q20Oracle)),
    Q("q21_semi_anti_join", q21, Some(q21Oracle)),
    Q("q22_cte_chained_joins", q22, Some(q22Oracle)),
    Q("q53_full_outer_join", q53, Some(q53Oracle)),
    Q("q54_lateral_topk", q54, Some(q54Oracle)),
    Q("q55_recursive_calendar", q55, Some(q55Oracle)),
  )
}
