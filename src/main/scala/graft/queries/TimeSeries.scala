package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact

/** Time-series densification — the regularization step every downstream
  * consumer of an irregular event stream needs (forecasting features like
  * ml01's lag panel, day-over-day dashboards, training curricula keyed by
  * calendar position all assume one row per (series, day), but real fact
  * streams have silent days).
  */
object TimeSeries {

  /** ts01 — gap-fill over a generated date spine: per-region daily order
    * series densified to EVERY calendar day in the global date range, with
    * count zero-fill, last-observation-carried-forward revenue, and an
    * explicit gap marker.
    *
    * Scale shape: the facts collapse to (region, day) grain BEFORE the
    * spine appears — the raw scan partial-aggregates map-side and nothing
    * event-cardinality crosses the wire. The spine itself is dims × days
    * (5 regions × ~2,400 days here; at 100 TB it is still only
    * series × days — spines are METADATA-sized, generated, never scanned),
    * built from one broadcast 1-row bounds relation and one `sequence`
    * explode, so the left join probes an already-aggregated relation of
    * the same grain. The carry-forward window is partition-local per
    * region. Revenue goes through [[Exact]] decimals, so the forward-fill
    * propagates bit-identical doubles in both engines.
    */
  def ts01(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("day"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
    val reg = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    val daily = o
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("day"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("rev"))
    val bounds = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = reg.select(col("r_name"))
      .crossJoin(broadcast(bounds))
      .select(col("r_name"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val ffill = Window.partitionBy(col("r_name")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq("r_name", "day"), "left")
      .select(
        col("r_name").as("region"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        last(col("rev"), ignoreNulls = true).over(ffill).as("revenue_ff"),
        col("n").isNull.as("is_gap"))
      .orderBy(col("region"), col("day"))
  }

  val ts01Oracle: String =
    """WITH o AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey, o_totalprice FROM orders),
      |daily AS (
      |  SELECT r_name, day, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM o
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, day),
      |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
      |spine AS (
      |  SELECT r_name, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM region, bounds)
      |SELECT r_name AS region, strftime(s.day, '%Y-%m-%d') AS day,
      |  COALESCE(n, 0) AS n_orders,
      |  last_value(rev IGNORE NULLS) OVER (
      |    PARTITION BY r_name ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS revenue_ff,
      |  (n IS NULL) AS is_gap
      |FROM spine s LEFT JOIN daily USING (r_name, day)
      |ORDER BY region, day""".stripMargin

  /** ts02 — LINEAR INTERPOLATION over the ts01 spine: gap days get the
    * straight-line value between the surrounding observations instead of
    * ts01's stale carry-forward — the estimator time-series features
    * (ml01's lags), charting, and resampling actually want on interior
    * gaps.
    *
    * All arithmetic is integer-exact: revenue lives in CENTS (each
    * o_totalprice is exact at 2 decimals, so the per-day sum is an exact
    * BIGINT) and the lerp is the weight form
    * `(v0·(d1−d) + v1·(d−d0)) div (d1−d0)` whose numerator is a
    * non-negative combination — truncating `div` and DuckDB's `//` agree
    * there, the same positivity argument pr01's fixed-point scores rely
    * on. No double ever appears, so the gate is hash-exact by
    * construction.
    *
    * Scale shape: identical to ts01 (facts collapse to series×day grain
    * map-side; the spine is metadata-sized; the bracketing
    * last/first-observation windows are partition-local per series). The
    * interior/edge split is explicit: days before the first or after the
    * last observation have no bracket and surface kind='edge' with NULL —
    * silently extrapolating is how dashboards lie.
    */
  def ts02(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("day"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
    val reg = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    val daily = o
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val bounds = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = reg.select(col("r_name"))
      .crossJoin(broadcast(bounds))
      .select(col("r_name"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val back = Window.partitionBy(col("r_name")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("r_name")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    spine
      .join(daily, Seq("r_name", "day"), "left")
      .select(col("r_name"), col("day"), col("cents"),
        last(col("cents"), ignoreNulls = true).over(back).as("v0"),
        last(obsDay, ignoreNulls = true).over(back).as("d0"),
        first(col("cents"), ignoreNulls = true).over(fwd).as("v1"),
        first(obsDay, ignoreNulls = true).over(fwd).as("d1"))
      .select(
        col("r_name").as("region"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        when(col("cents").isNotNull, lit("obs"))
          .when(col("v0").isNotNull && col("v1").isNotNull, lit("lerp"))
          .otherwise(lit("edge")).as("kind"),
        when(col("cents").isNotNull, col("cents"))
          .when(col("v0").isNotNull && col("v1").isNotNull,
            expr("""(v0 * datediff(d1, day) + v1 * datediff(day, d0))
                    div datediff(d1, d0)"""))
          .otherwise(lit(null).cast("long")).as("cents"))
      .orderBy(col("region"), col("day"))
  }

  val ts02Oracle: String =
    """WITH o AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey, o_totalprice FROM orders),
      |daily AS (
      |  SELECT r_name, day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM o
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, day),
      |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
      |spine AS (
      |  SELECT r_name, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM region, bounds),
      |br AS (
      |  SELECT r_name, s.day, cents,
      |    last_value(cents IGNORE NULLS) OVER (
      |      PARTITION BY r_name ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS v0,
      |    last_value(CASE WHEN cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
      |      PARTITION BY r_name ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS d0,
      |    first_value(cents IGNORE NULLS) OVER (
      |      PARTITION BY r_name ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
      |    first_value(CASE WHEN cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER (
      |      PARTITION BY r_name ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d1
      |  FROM spine s LEFT JOIN daily USING (r_name, day))
      |SELECT r_name AS region, strftime(day, '%Y-%m-%d') AS day,
      |  CASE WHEN cents IS NOT NULL THEN 'obs'
      |       WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN 'lerp'
      |       ELSE 'edge' END AS kind,
      |  CASE WHEN cents IS NOT NULL THEN cents
      |       WHEN v0 IS NOT NULL AND v1 IS NOT NULL
      |         THEN (v0 * (d1 - day) + v1 * (day - d0)) // (d1 - d0)
      |       ELSE NULL END AS cents
      |FROM br
      |ORDER BY region, day""".stripMargin

  /** ts03 — CUSUM CHANGEPOINT detection (Page 1954; the offline single
    * level-shift estimator, Pettitt-style argmax form): per series — the
    * monthly order count of each order priority — locate the month where
    * the cumulative deviation from the series mean peaks. With
    * d_i = x_i − mean, the cusum c_t = Σ_{i≤t} d_i rises while the level
    * is above the long-run mean and falls while below, so argmax_t |c_t|
    * is the maximum-likelihood single-shift location; the output row per
    * series carries that month, the peak magnitude, and the mean level on
    * each side. The LEVEL-SHIFT monitor (did the pipeline's mix change on
    * a date?) that q56's pointwise z-score outliers cannot express — a
    * regime change never puts any single point 3σ out.
    *
    * INTEGER-EXACT across engines: means are ratios, so everything is
    * scaled by n (c_t·n = n·cumsum_t − t·S over BIGINT counts — exact in
    * both engines; argmax over exact integers ⇒ identical changepoint),
    * and the side means are published in milli-units via BIGINT floor
    * division. Ties break to the earliest month (rank orders by
    * |c|·n DESC, t ASC — both deterministic integers).
    *
    * Scale shape: the fact collapses to (series, month) grain in one
    * partial-aggregated groupBy — everything after runs at series×months
    * cardinality (metadata-sized, the ts01 spine argument). The windows
    * partition by series; no global sort, no self-join: cumulative sum +
    * per-series totals + one rank pick the argmax in a single pass over
    * the tiny grain.
    */
  def ts03(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.orders(s, dir)
      .groupBy(
        col("o_orderpriority").as("priority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("x"))
    val series = Window.partitionBy(col("priority"))
    val ordered = series.orderBy(col("month"))
    val cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = monthly
      .withColumn("n", count(lit(1)).over(series))
      .withColumn("total", sum(col("x")).over(series))
      .withColumn("t", row_number().over(ordered).cast("long"))
      .withColumn("cum", sum(col("x")).over(cum))
      // c_t scaled by n: n·cum_t − t·S (exact BIGINT); c_n = 0 by identity,
      // so the t = n row never wins over any true deviation
      .withColumn("cn", col("n") * col("cum") - col("t") * col("total"))
      .filter(col("t") < col("n"))
      .withColumn("absc", abs(col("cn")))
    val pick = scored
      .withColumn("rk", row_number().over(
        series.orderBy(col("absc").desc, col("t"))))
      .filter(col("rk") === 1)
    pick.select(
        col("priority"),
        col("n").as("n_months"),
        col("t").as("cp_idx"),
        date_format(col("month"), "yyyy-MM-dd").as("cp_month"),
        col("absc").as("max_abs_cusum_xn"),
        expr("(cum * 1000) div t").as("mean_before_milli"),
        expr("((total - cum) * 1000) div (n - t)").as("mean_after_milli"))
      .orderBy(col("priority"))
  }

  val ts03Oracle: String =
    """WITH monthly AS (
      |  SELECT o_orderpriority AS priority,
      |    date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY priority, month),
      |scored AS (
      |  SELECT priority, month, x,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
      |    CAST(SUM(x) OVER w AS BIGINT) AS total,
      |    CAST(row_number() OVER (PARTITION BY priority ORDER BY month) AS BIGINT) AS t,
      |    CAST(SUM(x) OVER (PARTITION BY priority ORDER BY month
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM monthly
      |  WINDOW w AS (PARTITION BY priority)),
      |dev AS (
      |  SELECT *, abs(n * cum - t * total) AS absc
      |  FROM scored WHERE t < n),
      |pick AS (
      |  SELECT *, row_number() OVER (PARTITION BY priority
      |    ORDER BY absc DESC, t) AS rk
      |  FROM dev)
      |SELECT priority, n AS n_months, t AS cp_idx,
      |  strftime(month, '%Y-%m-%d') AS cp_month,
      |  absc AS max_abs_cusum_xn,
      |  (cum * 1000) // t AS mean_before_milli,
      |  ((total - cum) * 1000) // (n - t) AS mean_after_milli
      |FROM pick WHERE rk = 1 ORDER BY priority""".stripMargin

  def all: Seq[Q] = Seq(
    Q("ts01_gap_fill", ts01, Some(ts01Oracle)),
    Q("ts02_linear_interp", ts02, Some(ts02Oracle)),
    Q("ts03_cusum_changepoint", ts03, Some(ts03Oracle)),
  )
}
