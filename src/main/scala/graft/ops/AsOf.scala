package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.5 notes the
  * reference has none either; this is beyond-reference completeness for
  * time-series pipelines). Composed from built-ins per the §4 preference
  * order (compose > custom plan): tag both sides, union, and carry the most
  * recent right-side row forward with an ignore-nulls `last` over a
  * running ROWS frame.
  *
  * Scale shape: ONE shuffle (the window partition on the key) — same cost
  * as a single groupBy; never a range/theta join. The right row "travels"
  * inside the sort, so memory per key is O(1) beyond the sort itself.
  * Semantics: for each left row, the right row with the greatest
  * `rightTs <= leftTs` (equal timestamps match, like DuckDB ASOF, because
  * right rows sort before left rows at equal ts); left rows with no prior
  * right row keep nulls (LEFT ASOF).
  */
object AsOf {

  /** @param left      probe side (each row gets its as-of match)
    * @param right     reference side (latest row at-or-before the probe ts)
    * @param key       equi key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param rightCols columns of `right` to carry (renamed as given)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
  ): DataFrame = {
    val collisions = left.columns.toSet.intersect(rightCols.toSet) - key
    require(collisions.isEmpty,
      s"asofJoin: rename right columns that collide with left: ${collisions.mkString(", ")}")
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts
      .withColumns(rightCols.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val rightTagged = {
      val base = right
        .select((Seq(key, rightTs) ++ rightCols).distinct.map(col): _*)
        .withColumn("__ts", col(rightTs))
      (if (rightCols.contains(rightTs)) base else base.drop(rightTs))
        .withColumn("__side", lit(0))
        .withColumns(left.columns.filterNot(_ == key)
          .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    }
    val unioned = leftTagged.unionByName(rightTagged)
    // carried right cols break sort ties so duplicate (key, ts) right rows
    // resolve deterministically (greatest carried tuple wins)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts") +: col("__side") +: rightCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1) // keep probe rows only
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** q31 — for each purchase event, the user's most recent signup at or
    * before it (the canonical sessionless attribution query). Oracle:
    * DuckDB's NATIVE `ASOF LEFT JOIN` — two independent formulations of the
    * operator must agree row-for-row.
    */
  def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("signup_ts"), $"event_id".as("signup_id"))
    asofJoin(purchases, signups, key = "user_id",
      leftTs = "ts", rightTs = "signup_ts", rightCols = Seq("signup_ts", "signup_id"))
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        $"value",
        date_format($"asof_signup_ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        $"asof_signup_id".as("signup_id"),
      )
      .orderBy($"event_id")
  }

  val q31Oracle: String =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  p.value,
      |  strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_time,
      |  s.signup_id
      |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts AS signup_ts, event_id AS signup_id
      |                FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
      |ORDER BY p.event_id""".stripMargin

  /** Mirror of [[asofJoin]] in the FORWARD direction: for each left row,
    * the right row with the SMALLEST `rightTs >= leftTs` (equal
    * timestamps match — right rows sort after left rows at equal ts, and
    * the forward frame starts at the current row). Duplicate (key, ts)
    * right rows resolve to the smallest carried tuple (the ascending-sort
    * dual of backward's greatest-wins rule).
    *
    * Same scale shape as backward: one union, one per-key window — the
    * operator never builds the range-join pair universe.
    */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
  ): DataFrame = {
    val collisions = left.columns.toSet.intersect(rightCols.toSet) - key
    require(collisions.isEmpty,
      s"asofJoinForward: rename right columns that collide with left: ${collisions.mkString(", ")}")
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0)) // left sorts before right at equal ts
      .withColumns(rightCols.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
    val rightTagged = {
      val base = right
        .select((Seq(key, rightTs) ++ rightCols).distinct.map(col): _*)
        .withColumn("__ts", col(rightTs))
      (if (rightCols.contains(rightTs)) base else base.drop(rightTs))
        .withColumn("__side", lit(1))
        .withColumns(left.columns.filterNot(_ == key)
          .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    }
    val unioned = leftTagged.unionByName(rightTagged)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts") +: col("__side") +: rightCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", first(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** Staleness bound for [[q61]] in days (pandas `merge_asof(tolerance=…)`
    * semantics: match the latest prior row, then REJECT it if it is older
    * than the bound — a feature pipeline must not join a quote/profile
    * that was stale at event time).
    */
  val ToleranceDays = 30

  /** q61 — TOLERANCE-BOUNDED as-of: q31's attribution join, but a signup
    * more than [[ToleranceDays]] days before the purchase no longer
    * attributes it (both match columns null out TOGETHER — a half-matched
    * row would be worse than no match). The match itself is unchanged —
    * tolerance filters the one matched row per the pandas contract, it
    * does not fall back to an older-but-in-window row (there is none:
    * backward as-of already picked the newest).
    */
  def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("signup_ts"), $"event_id".as("signup_id"))
    val fresh = datediff(to_date($"ts"), to_date($"asof_signup_ts")) <= ToleranceDays
    asofJoin(purchases, signups, key = "user_id",
      leftTs = "ts", rightTs = "signup_ts", rightCols = Seq("signup_ts", "signup_id"))
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        when(fresh, date_format($"asof_signup_ts", "yyyy-MM-dd HH:mm:ss"))
          .as("signup_time"),
        when(fresh, $"asof_signup_id").as("signup_id"),
        when(fresh, datediff(to_date($"ts"), to_date($"asof_signup_ts")))
          .cast("long").as("stale_days"),
      )
      .orderBy($"event_id")
  }

  val q61Oracle: String =
    s"""SELECT p.event_id, p.user_id,
       |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       |  CASE WHEN date_diff('day', CAST(s.signup_ts AS DATE), CAST(p.ts AS DATE)) <= $ToleranceDays
       |       THEN strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') END AS signup_time,
       |  CASE WHEN date_diff('day', CAST(s.signup_ts AS DATE), CAST(p.ts AS DATE)) <= $ToleranceDays
       |       THEN s.signup_id END AS signup_id,
       |  CASE WHEN date_diff('day', CAST(s.signup_ts AS DATE), CAST(p.ts AS DATE)) <= $ToleranceDays
       |       THEN CAST(date_diff('day', CAST(s.signup_ts AS DATE), CAST(p.ts AS DATE)) AS BIGINT)
       |  END AS stale_days
       |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
       |ASOF LEFT JOIN (SELECT user_id, ts AS signup_ts, event_id AS signup_id
       |                FROM events WHERE event_type = 'signup') s
       |  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
       |ORDER BY p.event_id""".stripMargin

  /** q62 — FORWARD as-of: for each signup, the user's FIRST purchase at
    * or after it (time-to-activation — the mirror business question of
    * q31's attribution). Oracle: DuckDB native ASOF with the inequality
    * reversed — again two independent formulations of the operator
    * agreeing row-for-row.
    */
  def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val signups = events.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    asofJoinForward(signups, purchases, key = "user_id",
      leftTs = "ts", rightTs = "purchase_ts",
      rightCols = Seq("purchase_ts", "purchase_value"))
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        date_format($"asof_purchase_ts", "yyyy-MM-dd HH:mm:ss").as("first_purchase_time"),
        $"asof_purchase_value".as("purchase_value"),
        datediff(to_date($"asof_purchase_ts"), to_date($"ts"))
          .cast("long").as("days_to_convert"),
      )
      .orderBy($"event_id")
  }

  val q62Oracle: String =
    """SELECT sg.event_id, sg.user_id,
      |  strftime(sg.ts, '%Y-%m-%d %H:%M:%S') AS signup_time,
      |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS first_purchase_time,
      |  p.purchase_value,
      |  CAST(date_diff('day', CAST(sg.ts AS DATE), CAST(p.purchase_ts AS DATE)) AS BIGINT)
      |    AS days_to_convert
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') sg
      |ASOF LEFT JOIN (SELECT user_id, ts AS purchase_ts, value AS purchase_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON sg.user_id = p.user_id AND sg.ts <= p.purchase_ts
      |ORDER BY sg.event_id""".stripMargin

  /** q63 — q31's attribution query through the NATIVE as-of operator
    * ([[org.apache.spark.sql.graft.AsOfJoinPlan]]: custom LogicalPlan +
    * Strategy + SparkPlan — the §4 ladder's rung (c)) instead of the
    * composed union+window form. Same output, same DuckDB native-ASOF
    * oracle as q31 — three independent formulations of the operator
    * (composed, custom physical, DuckDB) must agree row-for-row. The
    * native plan shuffles each side once on its own key and streams a
    * merge walk; the composed plan shuffles the UNION of both sides into
    * one window — at 100 TB the native form moves strictly less data and
    * never null-pads the probe side.
    */
  def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    // right side fully aliased: disjoint names AND fresh attribute ids
    // (same-source self-join), per AsOfJoinPlan.asof's contract
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id".as("s_user_id"), $"ts".as("signup_ts"),
        $"event_id".as("signup_id"))
    org.apache.spark.sql.graft.AsOfJoinPlan
      .asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user_id",
        leftTs = "ts", rightTs = "signup_ts")
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        $"value",
        date_format($"signup_ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        $"signup_id",
      )
      .orderBy($"event_id")
  }

  /** q64 — q62's conversion-lag query through the native operator's
    * FORWARD direction (first right row at-or-after the probe ts; the
    * forward walk needs no candidate copy — the lookahead row IS the
    * match). Same DuckDB forward-ASOF oracle as q62: composed-forward,
    * native-forward, and DuckDB must agree row-for-row.
    */
  def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val signups = events.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"ts".as("purchase_ts"),
        $"value".as("purchase_value"))
    org.apache.spark.sql.graft.AsOfJoinPlan
      .asof(signups, purchases,
        leftKey = "user_id", rightKey = "p_user_id",
        leftTs = "ts", rightTs = "purchase_ts", forward = true)
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        date_format($"purchase_ts", "yyyy-MM-dd HH:mm:ss").as("first_purchase_time"),
        $"purchase_value",
        datediff(to_date($"purchase_ts"), to_date($"ts"))
          .cast("long").as("days_to_convert"),
      )
      .orderBy($"event_id")
  }

  /** q65/q66's staleness bound in MICROSECONDS (30 days) — unlike q61's
    * calendar-day datediff form, the native operator's tolerance is a
    * duration in the time column's underlying integer units (the pandas
    * `merge_asof(tolerance=Timedelta(...))` contract), enforced INSIDE the
    * exec's merge walk.
    */
  val ToleranceUs: Long = 30L * 86400L * 1000000L

  /** q65 — q63's native attribution join with the tolerance enforced
    * INSIDE the operator ([[org.apache.spark.sql.graft.AsOfJoinPlan]]
    * `tolerance`): a signup more than 30 days (in event-time micros)
    * before the purchase never leaves the exec — the matched columns
    * emerge nulled TOGETHER, no post-join CASE needed. Oracle: DuckDB
    * native ASOF + an epoch_us delta guard — independent duration
    * semantics (q61 gates the calendar-day variant through the composed
    * form; this gates the duration variant through the native one).
    */
  def q65(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id".as("s_user_id"), $"ts".as("signup_ts"),
        $"event_id".as("signup_id"))
    org.apache.spark.sql.graft.AsOfJoinPlan
      .asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user_id",
        leftTs = "ts", rightTs = "signup_ts",
        tolerance = Some(ToleranceUs))
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        $"value",
        date_format($"signup_ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        $"signup_id",
        (unix_micros($"ts") - unix_micros($"signup_ts")).as("lag_us"),
      )
      .orderBy($"event_id")
  }

  val q65Oracle: String =
    s"""SELECT p.event_id, p.user_id,
       |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       |  p.value,
       |  CASE WHEN epoch_us(p.ts) - epoch_us(s.signup_ts) <= $ToleranceUs
       |       THEN strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') END AS signup_time,
       |  CASE WHEN epoch_us(p.ts) - epoch_us(s.signup_ts) <= $ToleranceUs
       |       THEN s.signup_id END AS signup_id,
       |  CASE WHEN epoch_us(p.ts) - epoch_us(s.signup_ts) <= $ToleranceUs
       |       THEN epoch_us(p.ts) - epoch_us(s.signup_ts) END AS lag_us
       |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
       |ASOF LEFT JOIN (SELECT user_id, ts AS signup_ts, event_id AS signup_id
       |                FROM events WHERE event_type = 'signup') s
       |  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
       |ORDER BY p.event_id""".stripMargin

  /** q66 — CONVERSION WINDOW through the native FORWARD direction with
    * in-operator tolerance: each signup's first purchase within 30 days
    * (event-time micros); later purchases never attribute. The canonical
    * growth-analytics query — q64's join with the window enforced where
    * the state lives.
    */
  def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val signups = events.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"ts".as("purchase_ts"),
        $"value".as("purchase_value"))
    org.apache.spark.sql.graft.AsOfJoinPlan
      .asof(signups, purchases,
        leftKey = "user_id", rightKey = "p_user_id",
        leftTs = "ts", rightTs = "purchase_ts",
        forward = true, tolerance = Some(ToleranceUs))
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        date_format($"purchase_ts", "yyyy-MM-dd HH:mm:ss").as("first_purchase_time"),
        $"purchase_value",
        (unix_micros($"purchase_ts") - unix_micros($"ts")).as("lag_us"),
      )
      .orderBy($"event_id")
  }

  val q66Oracle: String =
    s"""SELECT sg.event_id, sg.user_id,
       |  strftime(sg.ts, '%Y-%m-%d %H:%M:%S') AS signup_time,
       |  CASE WHEN epoch_us(p.purchase_ts) - epoch_us(sg.ts) <= $ToleranceUs
       |       THEN strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') END AS first_purchase_time,
       |  CASE WHEN epoch_us(p.purchase_ts) - epoch_us(sg.ts) <= $ToleranceUs
       |       THEN p.purchase_value END AS purchase_value,
       |  CASE WHEN epoch_us(p.purchase_ts) - epoch_us(sg.ts) <= $ToleranceUs
       |       THEN epoch_us(p.purchase_ts) - epoch_us(sg.ts) END AS lag_us
       |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') sg
       |ASOF LEFT JOIN (SELECT user_id, ts AS purchase_ts, value AS purchase_value
       |                FROM events WHERE event_type = 'purchase') p
       |  ON sg.user_id = p.user_id AND sg.ts <= p.purchase_ts
       |ORDER BY sg.event_id""".stripMargin

  /** q67 — NEAREST-direction native as-of (pandas `direction='nearest'`):
    * each purchase aligned to its temporally CLOSEST signup — before or
    * after — within the 30-day bound; equal distances resolve backward.
    * Completes merge_asof parity: backward (q63), forward (q64), nearest
    * (q67), each with in-operator tolerance (q65/q66/q67). The oracle has
    * no native nearest, so it derives it INDEPENDENTLY from two DuckDB
    * ASOF joins (backward + forward per purchase) and picks the smaller
    * epoch_us delta with the same tie rule — a different decomposition of
    * the same semantics, which is what makes the hash match meaningful.
    */
  def q67(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id".as("s_user_id"), $"ts".as("signup_ts"),
        $"event_id".as("signup_id"))
    org.apache.spark.sql.graft.AsOfJoinPlan
      .asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user_id",
        leftTs = "ts", rightTs = "signup_ts",
        tolerance = Some(ToleranceUs), nearest = true)
      .select(
        $"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        date_format($"signup_ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
        $"signup_id",
        abs(unix_micros($"ts") - unix_micros($"signup_ts")).as("delta_us"),
      )
      .orderBy($"event_id")
  }

  val q67Oracle: String =
    s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |s AS (SELECT user_id AS s_uid, ts AS s_ts, event_id AS s_id
       |      FROM events WHERE event_type = 'signup'),
       |b AS (SELECT p.event_id, s.s_ts AS b_ts, s.s_id AS b_id
       |      FROM p ASOF LEFT JOIN s ON p.user_id = s.s_uid AND p.ts >= s.s_ts),
       |f AS (SELECT p.event_id, s.s_ts AS f_ts, s.s_id AS f_id
       |      FROM p ASOF LEFT JOIN s ON p.user_id = s.s_uid AND p.ts <= s.s_ts),
       |x AS (SELECT p.event_id, p.user_id, p.ts, b.b_ts, b.b_id, f.f_ts, f.f_id,
       |        epoch_us(p.ts) - epoch_us(b.b_ts) AS db,
       |        epoch_us(f.f_ts) - epoch_us(p.ts) AS df
       |      FROM p JOIN b USING (event_id) JOIN f USING (event_id)),
       |y AS (SELECT event_id, user_id, ts,
       |        CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
       |             THEN b_ts ELSE f_ts END AS n_ts,
       |        CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
       |             THEN b_id ELSE f_id END AS n_id,
       |        CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
       |             THEN db ELSE df END AS nd
       |      FROM x)
       |SELECT event_id, user_id,
       |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       |  CASE WHEN nd <= $ToleranceUs
       |       THEN strftime(n_ts, '%Y-%m-%d %H:%M:%S') END AS signup_time,
       |  CASE WHEN nd <= $ToleranceUs THEN n_id END AS signup_id,
       |  CASE WHEN nd <= $ToleranceUs THEN nd END AS delta_us
       |FROM y ORDER BY event_id""".stripMargin

  /** q70/q71 — STRING-KEYED as-of (the UUID/device-id shape: entity keys
    * arrive as opaque strings, the single most common production key type
    * the long-backed primitive walk can't serve). Same attribution
    * semantics as q31/q63 with the entity key rendered as a string id;
    * q70 runs the composed union+window form, q71 the native operator's
    * UTF8String walk ([[org.apache.spark.sql.graft.AsOfJoinPlan]]
    * doExecuteStringKey: keys read as UTF8String views by ordinal,
    * compared monomorphically — no interpreted expression eval per probe).
    * Both gate against the same DuckDB native-ASOF oracle on the same
    * string key: three independent formulations again.
    */
  private def stringKeyedSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", concat(lit("u"), $"user_id").as("uid"), $"ts", $"value")
    val signups = events.filter($"event_type" === "signup")
      .select(concat(lit("u"), $"user_id").as("s_uid"), $"ts".as("signup_ts"),
        $"event_id".as("signup_id"))
    (purchases, signups)
  }

  private def stringKeyedShape(joined: DataFrame): DataFrame = {
    val s = joined.sparkSession
    import s.implicits._
    joined.select(
      $"event_id", $"uid",
      date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
      $"value",
      date_format($"signup_ts", "yyyy-MM-dd HH:mm:ss").as("signup_time"),
      $"signup_id",
    ).orderBy($"event_id")
  }

  def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (purchases, signups) = stringKeyedSides(s, dir)
    stringKeyedShape(
      asofJoin(purchases, signups.withColumnRenamed("s_uid", "uid"), key = "uid",
        leftTs = "ts", rightTs = "signup_ts",
        rightCols = Seq("signup_ts", "signup_id"))
        .withColumnRenamed("asof_signup_ts", "signup_ts")
        .withColumnRenamed("asof_signup_id", "signup_id"))
  }

  def q71(s: SparkSession, dir: String): DataFrame = {
    val (purchases, signups) = stringKeyedSides(s, dir)
    stringKeyedShape(
      org.apache.spark.sql.graft.AsOfJoinPlan.asof(purchases, signups,
        leftKey = "uid", rightKey = "s_uid",
        leftTs = "ts", rightTs = "signup_ts"))
  }

  val q70Oracle: String =
    """SELECT p.event_id, p.uid,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  p.value,
      |  strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_time,
      |  s.signup_id
      |FROM (SELECT event_id, 'u' || CAST(user_id AS VARCHAR) AS uid, ts, value
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT 'u' || CAST(user_id AS VARCHAR) AS uid,
      |                       ts AS signup_ts, event_id AS signup_id
      |                FROM events WHERE event_type = 'signup') s
      |  ON p.uid = s.uid AND p.ts >= s.signup_ts
      |ORDER BY p.event_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q31_asof_join", q31, Some(q31Oracle)),
    Q("q61_asof_tolerance", q61, Some(q61Oracle)),
    Q("q62_asof_forward", q62, Some(q62Oracle)),
    Q("q63_asof_native", q63, Some(q31Oracle)),
    Q("q64_asof_native_forward", q64, Some(q62Oracle)),
    Q("q65_asof_native_tolerance", q65, Some(q65Oracle)),
    Q("q66_asof_native_window", q66, Some(q66Oracle)),
    Q("q67_asof_native_nearest", q67, Some(q67Oracle)),
    Q("q70_asof_string_composed", q70, Some(q70Oracle)),
    Q("q71_asof_string_native", q71, Some(q70Oracle)),
  )
}
