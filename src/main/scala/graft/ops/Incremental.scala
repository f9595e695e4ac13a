package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.queries.Q

/** Incremental materialized-view maintenance: keep a rollup current by
  * merging PARTIAL aggregation states instead of recomputing from the full
  * fact history. The state per group is (decimal sum, count) — both
  * associative and commutative, so merging the base state with a delta
  * batch's state is algebraically identical to aggregating base ∪ delta
  * from scratch, at the cost of scanning only the delta. This is the same
  * partial/final split Spark's own HashAggregate performs inside one query,
  * lifted across queries/days: the 100 TB pattern where the nightly fact
  * load touches the rollup in O(delta), not O(history).
  *
  * Decimal (not double) partials are what make the merge EXACT: decimal
  * addition is associative, so any split of the history into batches —
  * including none — produces bit-identical merged sums, which is also why
  * the DuckDB oracle can simply recompute the whole rollup in one pass.
  */
object Incremental {

  private val S = DecimalType(18, 4)

  /** Partial weekly-rollup state of one event batch: group keys + mergeable
    * (sum, count). Kept in decimal — the merge stays exact.
    */
  def weeklyPartial(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("week", col("ts")).as("week"),
        col("event_type"))
      .agg(
        sum(col("value").cast(S)).as("sum_part"),
        count(lit(1)).as("n_part"),
      )

  /** Merge any number of partial states into the final rollup form. */
  def mergeWeekly(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(col("week"), col("event_type"))
      .agg(
        sum(col("sum_part")).cast("double").as("total_value"),
        sum(col("n_part")).cast(LongType).as("n_events"),
      )
      .select(
        date_format(col("week"), "yyyy-MM-dd").as("week_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("week_start"), col("event_type"))

  /** mv01 — the maintenance cycle end-to-end: materialize the base state
    * (history before the split date), compute the delta batch's state (the
    * "new day" of facts), merge. The gate pins that the merged view equals
    * the full recompute the oracle performs — i.e. the incremental path
    * loses nothing. The split is a fixed date so the query is
    * deterministic; in production it's the load watermark, and the base
    * partial lives as a table (here it's recomputed because the gate is a
    * single query — the TOPOLOGY under test is partial-merge, which is
    * split-invariant by construction and additionally spec-checked across
    * different split points).
    */
  def mv01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val split = lit("2024-01-16").cast("timestamp")
    val base = weeklyPartial(ev.filter($"ts" < split))
    val delta = weeklyPartial(ev.filter($"ts" >= split))
    mergeWeekly(base, delta)
  }

  val mv01Oracle: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""".stripMargin

  def all: Seq[Q] = Seq(
    Q("mv01_incremental_rollup", mv01, Some(mv01Oracle)),
  )
}
