package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Aggregation coverage (SURVEY.md §2.4): grand totals, multi-key group-by,
  * distinct, weekly rollup, rollup-with-subtotals, conditional aggregates.
  */
object Aggregates {

  /** q02 — full-table grand totals (A2/A3: app/routes/data.py:95-114).
    * Single-stage partial+final agg, no group keys → one row; at scale the
    * partial agg reduces each task to one row before the 1-row exchange.
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      dsum($"l_quantity").as("sum_qty"),
      countDistinct($"l_orderkey").as("n_orders"),
      // dates emitted as ISO strings: the one representation every engine
      // and the driver's hash agree on (parquet date32 vs duckdb DATE differ
      // once they reach pandas)
      date_format(min($"l_shipdate"), "yyyy-MM-dd").as("min_ship"),
      date_format(max($"l_shipdate"), "yyyy-MM-dd").as("max_ship"),
    )
  }

  val q02Oracle: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
      |  strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
      |FROM lineitem""".stripMargin

  /** q10 — yearly rollup with ratio-of-counts and conditional sum
    * (A11: README.md:16-24 CFR = deaths/cases×100; F11 arithmetic).
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("total_price"),
        count(when($"o_orderpriority" === "1-URGENT", lit(1))).as("n_urgent"),
        sum(when($"o_orderpriority" === "1-URGENT", $"o_totalprice".cast("decimal(18,4)")))
          .cast("double").as("urgent_price"),
      )
      .withColumn("pct_urgent", lit(100.0) * $"n_urgent" / $"n_orders")
      .orderBy($"yr")
  }

  val q10Oracle: String =
    """SELECT year(o_orderdate) AS yr,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS urgent_price,
      |  100.0 * COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) / COUNT(*) AS pct_urgent
      |FROM orders GROUP BY year(o_orderdate) ORDER BY yr""".stripMargin

  /** q11 — per-group average / min / max (A10: README.md:9-12). */
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_mktsegment")
      .agg(
        davg($"c_acctbal").as("avg_bal"),
        min($"c_acctbal").as("min_bal"),
        max($"c_acctbal").as("max_bal"),
        count(lit(1)).as("n_customers"),
      )
      .orderBy($"c_mktsegment")
  }

  val q11Oracle: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
      |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
      |  COUNT(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q12 — distinct projection for dimension dedup (A13: app/etl.py:80,95). */
  def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  val q12Oracle: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey
      |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** q18 — weekly tumbling rollup on event time (A1/F2: app/etl.py:111-117
    * `date_trunc('week')` Monday-start). The batch twin of the streaming
    * version in [[graft.streaming.Streams]].
    */
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("week", $"ts"), "yyyy-MM-dd").as("week_start"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum($"value").as("total_value"),
        countDistinct($"user_id").as("n_users"),
      )
      .orderBy($"week_start")
  }

  val q18Oracle: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY week_start""".stripMargin

  /** q25 — ROLLUP with subtotal rows (beyond-reference completeness; Spark
    * `rollup` ≡ DuckDB GROUP BY ROLLUP). Subtotal nulls are recoded to 'ALL'
    * so the output is deterministic and engine-comparable.
    */
  def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup(year($"o_orderdate").as("yr"), $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .select(
        coalesce($"yr".cast("string"), lit("ALL")).as("yr_label"),
        coalesce($"o_orderstatus", lit("ALL")).as("status_label"),
        $"n_orders", $"total_price",
      )
      .orderBy($"yr_label", $"status_label")
  }

  val q25Oracle: String =
    """SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr_label,
      |  COALESCE(o_orderstatus, 'ALL') AS status_label,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
      |ORDER BY yr_label, status_label""".stripMargin

  /** q26 — JSON field extraction + agg over it (events.props is a JSON blob;
    * the reference's JSON surface is its REST serializer, data.py:14-48 —
    * here re-expressed as an engine-side JSON path read).
    */
  def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(lsum($"k").as("sum_k"), count($"k").as("n_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q26Oracle: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(json_extract(props, '$.k') AS INT)) AS n_k,
      |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q30 — sketch aggregation: HyperLogLog++ approximate distinct counts
    * evaluated against the exact counts. The raw HLL estimates are
    * engine-specific, so the gated output carries what IS cross-engine
    * checkable: the exact counts (oracle recomputes them) and a ≤5%
    * relative-error bound per sketch as a boolean the oracle pins to TRUE
    * — the sketch's quality is enforced inside the driver's gate, not just
    * in AggregatesSpec. At 100 TB the sketch is the only affordable form:
    * a fixed-size buffer per group vs a full distinct shuffle.
    */
  def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", 0.02).as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"props", 0.02).as("approx_props"),
        countDistinct($"props").as("exact_props"),
      )
      .select($"event_type", $"exact_users", $"exact_props",
        (abs($"approx_users".cast("double") / $"exact_users" - 1.0) <= 0.05)
          .as("hll_users_ok"),
        (abs($"approx_props".cast("double") / $"exact_props" - 1.0) <= 0.05)
          .as("hll_props_ok"))
      .orderBy($"event_type")
  }

  val q30Oracle: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  count(DISTINCT props) AS exact_props,
      |  TRUE AS hll_users_ok,
      |  TRUE AS hll_props_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q33 — exact percentiles (beyond-reference completeness: linear-
    * interpolated quantiles, Spark `percentile` ≡ DuckDB `quantile_cont`).
    * Exact percentile sorts per group — fine at low group cardinality; the
    * 100 TB path is `approx_percentile` (t-digest sketch), same shape as
    * q30's HLL.
    */
  def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_quantity", lit(0.25)).as("p25"),
        percentile($"l_quantity", lit(0.5)).as("p50"),
        percentile($"l_quantity", lit(0.75)).as("p75"),
        percentile($"l_extendedprice", lit(0.9)).as("price_p90"),
      )
      .orderBy($"l_returnflag")
  }

  val q33Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9) AS price_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q50 — the q26 JSON aggregation through Spark 4's VARIANT type:
    * `parse_json` once into the binary-encoded variant, then typed
    * `variant_get` paths. At 100 TB this is the semi-structured scale
    * path — parse once, shred to binary, every downstream path access is
    * a byte-offset lookup instead of a re-parse (get_json_object re-parses
    * the string per call). Same answer as the string path by construction;
    * the oracle is the plain JSON extraction.
    */
  def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", parse_json($"props").as("v"))
      .select($"event_type", try_variant_get($"v", "$.k", "int").as("k"))
      .groupBy($"event_type")
      .agg(
        lsum($"k").as("sum_k"),
        count($"k").as("n_k"),
        countDistinct($"k").as("n_distinct_k"),
      )
      .orderBy($"event_type")
  }

  val q50Oracle: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(json_extract(props, '$.k') AS INT)) AS n_k,
      |  COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_distinct_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q46 — t-digest quantile sketch evaluated against the exact quantiles,
    * the q30 pattern applied to percentiles: the gated output carries the
    * exact per-group medians/p90s (oracle recomputes them via
    * quantile_cont) plus a ≤5% relative-error bound on the
    * `approx_percentile` sketch pinned TRUE — sketch quality enforced
    * inside the driver's gate. At 100 TB the sketch is the only affordable
    * form: a fixed-size centroid buffer per group that merges
    * associatively (partial agg map-side), vs the exact form's full
    * per-group sort. q33 is the exact baseline; this is its scale path.
    */
  def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.5)).as("p50_exact"),
        percentile($"l_extendedprice", lit(0.9)).as("p90_exact"),
        approx_percentile($"l_extendedprice", lit(0.5), lit(1000)).as("p50_approx"),
        approx_percentile($"l_extendedprice", lit(0.9), lit(1000)).as("p90_approx"),
        count(lit(1)).as("n_rows"),
      )
      .select($"l_returnflag", $"p50_exact", $"p90_exact", $"n_rows",
        (abs($"p50_approx" / $"p50_exact" - 1.0) <= 0.05).as("p50_ok"),
        (abs($"p90_approx" / $"p90_exact" - 1.0) <= 0.05).as("p90_ok"))
      .orderBy($"l_returnflag")
  }

  val q46Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS p50_exact,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_exact,
      |  COUNT(*) AS n_rows,
      |  TRUE AS p50_ok,
      |  TRUE AS p90_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q34 — pivot (long → wide): per-year order totals by status. Spark's
    * `pivot` with explicit values compiles to the same conditional
    * aggregation the oracle spells out — no second pass to discover pivot
    * values (the distinct-scan a valueless pivot would need at 100 TB).
    */
  def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy($"yr")
  }

  val q34Oracle: String =
    """SELECT year(o_orderdate) AS yr,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS total_p
      |FROM orders GROUP BY year(o_orderdate) ORDER BY yr""".stripMargin

  /** q36 — array aggregation: sorted distinct collect per group, rendered
    * as a JSON string (nested values reach the driver's hash compare as a
    * plain deterministic scalar; collect_set order is engine-internal, the
    * sort makes it canonical).
    */
  def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_mktsegment")
      .agg(
        concat(lit("[\""),
          concat_ws("\",\"", array_sort(collect_set($"n_name"))),
          lit("\"]")).as("nations_json"),
        countDistinct($"n_name").as("n_nations"),
      )
      .orderBy($"c_mktsegment")
  }

  val q36Oracle: String =
    """SELECT c_mktsegment,
      |  '["' || array_to_string(list_sort(list(DISTINCT n_name)), '","') || '"]' AS nations_json,
      |  COUNT(DISTINCT n_name) AS n_nations
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q39 — CUBE with an explicit grouping_id (completes the grouping-sets
    * family next to q25's ROLLUP): all four (status, priority) subtotal
    * combinations in one pass. Spark and DuckDB/Postgres share the
    * GROUPING bitmask convention (bit = 1 ⇔ column aggregated away), so
    * gid is itself part of the cross-engine check. One shuffle; the
    * grouping-set expansion happens map-side before the exchange.
    */
  def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("total_price"),
      )
      .select(
        $"gid",
        coalesce($"o_orderstatus", lit("ALL")).as("status_label"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority_label"),
        $"n_orders", $"total_price",
      )
      .orderBy($"gid", $"status_label", $"priority_label")
  }

  val q39Oracle: String =
    """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  COALESCE(o_orderstatus, 'ALL') AS status_label,
      |  COALESCE(o_orderpriority, 'ALL') AS priority_label,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status_label, priority_label""".stripMargin

  /** q68 — explicit GROUPING SETS (closes the grouping algebra next to
    * q25's ROLLUP and q39's CUBE): the independent-subtotals shape
    * ((status), (priority), ()) that NEITHER rollup nor cube expresses —
    * two one-dimensional margins plus the grand total, without the
    * cross-product cells. Spark's Dataset.groupingSets (4.0+) and DuckDB's
    * GROUP BY GROUPING SETS share the GROUPING bitmask convention
    * (bit = 1 ⇔ column aggregated away — q39's cross-engine treatment),
    * so gid is itself part of the check. Scale shape: one shuffle; the
    * grouping-set expansion replicates each input row once per set
    * MAP-SIDE before the partial aggregate, so the exchange carries
    * |sets| × group-cardinality partial rows, never |sets| × input.
    */
  def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("total_price"),
      )
      .select(
        $"gid",
        coalesce($"o_orderstatus", lit("ALL")).as("status_label"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority_label"),
        $"n_orders", $"total_price",
      )
      .orderBy($"gid", $"status_label", $"priority_label")
  }

  val q68Oracle: String =
    """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  COALESCE(o_orderstatus, 'ALL') AS status_label,
      |  COALESCE(o_orderpriority, 'ALL') AS priority_label,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, status_label, priority_label""".stripMargin

  /** q43 — conditional aggregation (SQL FILTER clause semantics as
    * when()-guarded aggregates): per priority, total counts next to
    * filtered counts / filtered exact sums / filtered distinct counts in
    * ONE pass over the table — the idiom that replaces N separate filtered
    * scans with a single partial+final aggregate.
    */
  def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
        dsum(when($"o_totalprice" > 200000.0, $"o_totalprice")).as("high_value_total"),
        countDistinct(when($"o_orderstatus" === "F", $"o_custkey")).as("n_finished_custs"),
      )
      .orderBy($"o_orderpriority")
  }

  val q43Oracle: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |    FILTER (WHERE o_totalprice > 200000.0) AS DOUBLE) AS high_value_total,
      |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F') AS n_finished_custs
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q02_global_totals", q02, Some(q02Oracle)),
    Q("q10_yearly_rollup", q10, Some(q10Oracle)),
    Q("q11_avg_by_segment", q11, Some(q11Oracle)),
    Q("q12_distinct_dims", q12, Some(q12Oracle)),
    Q("q18_weekly_rollup", q18, Some(q18Oracle)),
    Q("q25_rollup_subtotals", q25, Some(q25Oracle)),
    Q("q26_json_extract_agg", q26, Some(q26Oracle)),
    Q("q30_approx_distinct", q30, Some(q30Oracle)),
    Q("q33_percentiles", q33, Some(q33Oracle)),
    Q("q34_pivot", q34, Some(q34Oracle)),
    Q("q36_array_agg_json", q36, Some(q36Oracle)),
    Q("q39_cube_grouping", q39, Some(q39Oracle)),
    Q("q43_conditional_agg", q43, Some(q43Oracle)),
    Q("q68_grouping_sets", q68, Some(q68Oracle)),
    Q("q46_approx_quantile", q46, Some(q46Oracle)),
    Q("q50_variant_json", q50, Some(q50Oracle)),
  )
}
