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

  def all: Seq[Q] = Seq(
    Q("q31_asof_join", q31, Some(q31Oracle)),
  )
}
