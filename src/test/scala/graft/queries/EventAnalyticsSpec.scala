package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class EventAnalyticsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("q51 cohort retention: offset-0 cell equals cohort size, cells never exceed it") {
    val rows = EventAnalytics.q51(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val cohortSize = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val cw = r.getAs[String]("cohort_week")
      assert(r.getAs[Int]("week_offset") >= 0)
      assert(cohortSize.contains(cw), s"cohort $cw missing its offset-0 cell")
      assert(r.getAs[Long]("n_users") <= cohortSize(cw),
        s"retained > cohort size at $cw+${r.getAs[Int]("week_offset")}")
    }
    // every user is in exactly one cohort: offset-0 cells sum to user count
    val nUsers = Tables.events(spark, sfSmoke).select($"user_id").distinct().count()
    assert(cohortSize.values.sum == nUsers)
  }

  test("q52 funnel: step counts are monotone non-increasing and step order is strict") {
    val rows = EventAnalytics.q52(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq.toString)
    // strict-order semantics: a user counted at step 2 has a click AFTER
    // their first view (recompute one user end-to-end)
    val ev = Tables.events(spark, sfSmoke)
      .select($"user_id", $"event_type", $"ts").collect()
      .groupBy(_.getAs[Long]("user_id"))
    val progressed = ev.filter { case (_, rs) =>
      val views = rs.filter(_.getString(1) == "view").map(_.getTimestamp(2).getTime)
      val clicks = rs.filter(_.getString(1) == "click").map(_.getTimestamp(2).getTime)
      views.nonEmpty && clicks.exists(_ > views.min)
    }
    assert(counts(1) == progressed.size)
  }

  test("q58 paths: counts match a driver-side trigram recompute") {
    import spark.implicits._
    val rows = EventAnalytics.q58(spark, sfSmoke).collect()
    assert(rows.length == 10)
    // driver-side oracle over the same grain: per-user (ts, event_id)
    // ordered event types, sliding windows of 3
    val byUser = Tables.events(spark, sfSmoke)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expected = byUser.values.flatMap { rs =>
      rs.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .map(_.getString(3)).sliding(3).filter(_.length == 3)
        .map(_.mkString(" > "))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = expected.toSeq.sortBy { case (p2, n) => (-n, p2) }.take(10)
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq == top)
    // descending, total-ordered output
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
