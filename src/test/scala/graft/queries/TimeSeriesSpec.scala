package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("ts01 densifies every region to the full global day range") {
    val rows = TimeSeries.ts01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    val regions = rows.map(_._1).distinct
    assert(regions.length == 5)
    // one row per (region, day) over the identical contiguous day span
    val perRegion = rows.groupBy(_._1)
    val spans = perRegion.values.map(rs => (rs.map(_._2).min, rs.map(_._2).max, rs.length))
    assert(spans.toSet.size == 1, "all regions share one spine")
    val (lo, hi, n) = spans.head
    assert(n == java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(lo), java.time.LocalDate.parse(hi)) + 1)
    // gap rows are exactly the zero-count rows, and gaps exist at this SF
    rows.foreach { case (_, _, cnt, _, gap) => assert(gap == (cnt == 0L)) }
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

  test("ts01 forward-fill carries the last observed revenue across gaps") {
    val rows = TimeSeries.ts01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    rows.groupBy(_._1).values.foreach { rs =>
      var lastSeen: Option[Double] = None
      rs.sortBy(_._2).foreach { case (reg, day, cnt, rev, gap) =>
        if (!gap) {
          assert(rev.isDefined, s"$reg $day: observed day must carry its revenue")
          lastSeen = rev
        } else {
          assert(rev == lastSeen, s"$reg $day: gap must carry the previous value")
        }
      }
    }
    // before any observation the fill is null (no fabrication)
    val firstDays = rows.groupBy(_._1).values.map(_.sortBy(_._2))
      .filter(_.head._5).map(_.head)
    firstDays.foreach { case (_, _, _, rev, _) => assert(rev.isEmpty) }
  }
}
