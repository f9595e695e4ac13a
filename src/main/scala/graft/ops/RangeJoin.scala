package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Binned range join — the scalable form of an interval/theta join
  * (beyond-reference completeness; SURVEY.md §2.5 notes the reference has
  * no range joins).
  *
  * A naive |a.ts − b.ts| ≤ w self-join is a per-key cartesian that Catalyst
  * can only plan as a nested loop. Binning each event into ⌊epoch/w⌋ and
  * probing the three neighboring bins turns it into an EQUI join on
  * (key, bin) — hash-joinable, shuffle-bounded by bin occupancy — followed
  * by the exact residual filter. Every qualifying pair lands in exactly one
  * probed (bin_a_probe == bin_b) combination, so no dedup pass is needed.
  */
object RangeJoin {

  val WindowMinutes = 30

  /** q32 — pairs of same-user events within ±30 minutes. Oracle: the naive
    * BETWEEN theta join in DuckDB — the binned rewrite must reproduce it
    * row-for-row.
    */
  def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = WindowMinutes * 60L // bin width in seconds
    val e = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"ts", unix_micros($"ts").as("us"))
    val a = e.select($"event_id".as("a_id"), $"user_id", $"us".as("a_us"),
      explode(array((-1 to 1).map(d => floor($"us" / 1000000L / w) + d): _*)).as("bin"))
    val b = e.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"us".as("b_us"),
      floor($"us" / 1000000L / w).as("bin"))
    a.join(b, Seq("bin"), "inner")
      .filter($"user_id" === $"b_user" && $"a_id" < $"b_id" &&
        abs($"b_us" - $"a_us") <= w * 1000000L)
      .select($"a_id", $"b_id", $"user_id",
        abs($"b_us" - $"a_us").as("abs_diff_us"))
      .orderBy($"a_id", $"b_id")
  }

  val q32Oracle: String =
    s"""SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       |  abs(epoch_us(b.ts) - epoch_us(a.ts)) AS abs_diff_us
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id AND a.event_id < b.event_id
       |  AND b.ts BETWEEN a.ts - INTERVAL $WindowMinutes MINUTE
       |               AND a.ts + INTERVAL $WindowMinutes MINUTE
       |ORDER BY a_id, b_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q32_range_join_binned", q32, Some(q32Oracle)),
  )
}
