package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.util.Exact._

/** Window-function coverage (SURVEY.md §2.6): lag deltas, last-row-per-group
  * (DISTINCT ON), max_by, lead / rank / running-sum frames, per-group
  * min-max scaling. Every window is PARTITIONED — no global
  * `Window.orderBy` without partitioning anywhere (the reference's
  * single-partition W1 window, app/etl.py:101, is explicitly NOT reproduced;
  * at 100 TB a global window funnels the whole table through one task).
  */
object Windows {

  /** q07 — per-partition lag delta (W2: app/etl.py:122-124 lag of
    * TOTAL_VACCINATIONS per country; W4: Grafana per-region yearly delta).
    * Agg to (event_type, day) grain first, then lag within event_type.
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(dsum($"value").as("day_value"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("prev_value", lag($"day_value", 1).over(w))
      .withColumn("delta", $"day_value" - $"prev_value")
      .orderBy($"event_type", $"day")
  }

  val q07Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, day_value,
      |  lag(day_value, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_value,
      |  day_value - lag(day_value, 1) OVER (PARTITION BY event_type ORDER BY day) AS delta
      |FROM daily ORDER BY event_type, day""".stripMargin

  /** q08 — latest-row-per-group via row_number (A8/W5: the Postgres
    * `DISTINCT ON (country) … ORDER BY year DESC` at app/routes/data.py:344-349,
    * rewritten as the reference-independent window idiom). Total order inside
    * the window (orderdate DESC, orderkey DESC) makes ties deterministic.
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("latest_date"), $"o_totalprice")
      .orderBy($"o_custkey")
  }

  val q08Oracle: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date, o_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** q09 — last-value-per-group then re-aggregate (A9: README.md:1-3 "sum of
    * last Cumulative_cases per country"), implemented with `max_by` over a
    * (date, key) struct — one agg pass, no window sort, no shuffle beyond the
    * two group-bys. The oracle expresses the same semantics via row_number,
    * proving implementation-independence.
    */
  def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val latest = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(max_by($"o_totalprice", struct($"o_orderdate", $"o_orderkey")).as("latest_price"))
    latest
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(dsum($"latest_price").as("sum_latest_price"), count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  val q09Oracle: String =
    """WITH latest AS (
      |  SELECT o_custkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_latest_price,
      |  COUNT(*) AS n_customers
      |FROM latest JOIN customer ON o_custkey = c_custkey
      |WHERE rn = 1 GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q23 — analytic suite: row_number, lead, rank-with-ties, running sum over
    * a ROWS frame (W3 + beyond-reference lead/rank; the running sum is the
    * scaled analog of the ML sliding lookback W6). Running sum is exact
    * decimal inside the frame, cast to double at the end.
    */
  def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wTotal = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wTies  = Window.partitionBy($"o_custkey").orderBy($"o_orderdate")
    Tables.orders(s, dir)
      .filter($"o_custkey" < 50)
      .withColumn("rn", row_number().over(wTotal))
      .withColumn("next_price", lead($"o_totalprice", 1).over(wTotal))
      .withColumn("date_rank", rank().over(wTies))
      .withColumn("dense_date_rank", dense_rank().over(wTies))
      .withColumn("quartile", ntile(4).over(wTotal))
      .withColumn("pct_rank", percent_rank().over(wTotal))
      .withColumn("cume", cume_dist().over(wTotal))
      .withColumn("first_price", first($"o_totalprice")
        .over(wTotal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("second_price", nth_value($"o_totalprice", 2)
        .over(wTotal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("running_total",
        sum($"o_totalprice".cast(DecimalType(18, 4)))
          .over(wTotal.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice", $"rn", $"next_price", $"date_rank", $"dense_date_rank",
        $"quartile", $"pct_rank", $"cume", $"first_price", $"second_price",
        $"running_total")
      .orderBy($"o_custkey", $"rn")
  }

  val q23Oracle: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice,
      |  row_number() OVER w AS rn,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  rank() OVER wd AS date_rank,
      |  dense_rank() OVER wd AS dense_date_rank,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  nth_value(o_totalprice, 2) OVER wf AS second_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER wf AS DOUBLE) AS running_total
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wd AS (PARTITION BY o_custkey ORDER BY o_orderdate),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, rn""".stripMargin

  /** q24 — per-group min-max scaling (the reference's per-country
    * MinMaxScaler, predict_france_with_model.py:68-69, §2.9 — as a window,
    * no MLlib fit needed, fully distributed). Same double formula in both
    * engines → bit-identical.
    */
  def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
    Tables.events(s, dir)
      .withColumn("min_v", min($"value").over(w))
      .withColumn("max_v", max($"value").over(w))
      .withColumn("scaled",
        when($"max_v" === $"min_v", lit(0.0))
          .otherwise(($"value" - $"min_v") / ($"max_v" - $"min_v")))
      .select($"event_id", $"event_type", $"value", $"scaled")
      .orderBy($"event_id")
  }

  val q24Oracle: String =
    """SELECT event_id, event_type, value,
      |  CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.0
      |       ELSE (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
      |  END AS scaled
      |FROM events WINDOW w AS (PARTITION BY event_type)
      |ORDER BY event_id""".stripMargin

  /** q40 — event-time RANGE frame: per-user trailing-7-day rolling count and
    * exact rolling sum (completes the frame family: q23/q24 cover ROWS and
    * unbounded frames; this is the value-based sliding window). The frame
    * key is epoch MICROSECONDS as int64 in both engines — a seconds cast
    * would truncate and diverge on sub-second timestamps. RANGE frames are
    * tie-safe by construction (all peer rows share one frame), so the
    * result is deterministic without any tiebreaker in the window order.
    * One exchange on user_id + per-partition sort — the same shape as any
    * partitioned window; no state beyond the in-flight frame.
    */
  def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-sevenDaysUs, 0)
    Tables.events(s, dir)
      .select(
        $"user_id", $"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        count(lit(1)).over(w).as("n_7d"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
          .cast("double").as("sum_7d"),
      )
      .orderBy($"user_id", $"event_id")
  }

  val q40Oracle: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  COUNT(*) OVER w AS n_7d,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** q41 — time-series gap fill: sparse daily high-value totals joined onto
    * a generated calendar spine per series, missing days forward-filled
    * with `last(..., ignoreNulls)` (the fill-forward every time-series
    * pipeline needs; the reference's weekly tables assume dense weeks).
    * Scale shape: the spine explode is bounded by span × series (never
    * row-scale), the left join hashes on (series, day) post-aggregation
    * cardinality, and the fill is one partitioned window — no driver-side
    * date loop anywhere.
    */
  def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cached: both the spine-bounds aggregate and the left join read this
    // relation — uncached, the events scan + aggregation runs twice
    val daily = graft.util.Eager.cached(Tables.events(s, dir)
      .filter($"value" > 300.0)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("day_value")))
    val spine = daily.groupBy($"event_type")
      .agg(min($"day").as("mn"), max($"day").as("mx"))
      .select($"event_type", explode(sequence($"mn", $"mx")).as("day"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type",
        date_format($"day", "yyyy-MM-dd").as("day_s"),
        $"n_events".isNull.cast("int").as("is_gap"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        last($"day_value", ignoreNulls = true).over(w).as("ffill_value"))
      .orderBy($"event_type", $"day_s")
  }

  val q41Oracle: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
      |  FROM events WHERE value > 300.0 GROUP BY 1, 2),
      |b AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
      |spine AS (SELECT event_type,
      |  CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day FROM b)
      |SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day_s,
      |  CAST(d.n_events IS NULL AS INT) AS is_gap,
      |  COALESCE(d.n_events, 0) AS n_events,
      |  last_value(d.day_value IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
      |FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
      |ORDER BY s.event_type, day_s""".stripMargin

  /** q42 — distribution ranks (completes the ranking family next to q23's
    * row_number/lead/rank): ntile quartiles, percent_rank, cume_dist over
    * customer balances per market segment. percent_rank/cume_dist are pure
    * functions of the ordering key (ties share a value); ntile splits ties
    * by ROW order, so the window orders by a unique (acctbal, custkey) pair
    * to stay deterministic cross-engine.
    */
  def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy($"c_mktsegment", $"c_acctbal", $"c_custkey")
  }

  val q42Oracle: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q07_window_lag_delta", q07, Some(q07Oracle)),
    Q("q08_latest_per_group", q08, Some(q08Oracle)),
    Q("q09_maxby_lastvalue", q09, Some(q09Oracle)),
    Q("q23_analytic_suite", q23, Some(q23Oracle)),
    Q("q24_minmax_scale", q24, Some(q24Oracle)),
    Q("q40_rolling_range_frame", q40, Some(q40Oracle)),
    Q("q41_gap_fill_ffill", q41, Some(q41Oracle)),
    Q("q42_distribution_ranks", q42, Some(q42Oracle)),
  )
}
