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

  test("ts02 lerp values sit on the integer segment between their brackets") {
    val rows = TimeSeries.ts02(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(rows.exists(_._3 == "lerp") && rows.exists(_._3 == "obs"))
    def day(s: String) = java.time.LocalDate.parse(s).toEpochDay
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      val obs = sorted.filter(_._3 == "obs")
        .map(r => day(r._2) -> r._4.get)
      sorted.foreach {
        case (reg, d, "lerp", Some(v)) =>
          val t = day(d)
          val (d0, v0) = obs.filter(_._1 < t).maxBy(_._1)
          val (d1, v1) = obs.filter(_._1 > t).minBy(_._1)
          // exact truncating-div lerp, and the value is inside the bracket
          assert(v == (v0 * (d1 - t) + v1 * (t - d0)) / (d1 - d0),
            s"$reg $d: lerp value off the integer segment")
          assert(v >= math.min(v0, v1) && v <= math.max(v0, v1))
        case (reg, d, "edge", v) =>
          assert(v.isEmpty, s"$reg $d: edge must not fabricate a value")
          val t = day(d)
          assert(obs.forall(_._1 > t) || obs.forall(_._1 < t),
            s"$reg $d: edge rows exist only outside the observed bracket")
        case (_, _, "obs", v) => assert(v.isDefined)
        case other => fail(s"unexpected row $other")
      }
    }
  }

  test("ts03 cusum changepoint matches a plain-Scala exact recompute per series") {
    import org.apache.spark.sql.functions._
    val got = TimeSeries.ts03(spark, sfSmoke).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    assert(got.nonEmpty)
    // recompute the (priority, month, count) grain independently and run
    // the scaled-cusum argmax in exact Long arithmetic on the driver
    val monthly = graft.Tables.orders(spark, sfSmoke)
      .groupBy(col("o_orderpriority").as("p"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    monthly.groupBy(_._1).foreach { case (p, rows) =>
      val series = rows.sortBy(_._2).map(t => (t._2, t._3))
      val n = series.length.toLong
      val total = series.map(_._2).sum
      var cum = 0L
      val devs = series.zipWithIndex.dropRight(1).map { case ((m, x), i) =>
        cum += x
        val t = i + 1L
        (math.abs(n * cum - t * total), t, m, cum)
      }
      val (absc, t, m, cumAt) = devs.minBy { case (a, t, _, _) => (-a, t) }
      val r = got(p)
      assert(r.getAs[Long]("n_months") == n, p)
      assert(r.getAs[Long]("cp_idx") == t, p)
      assert(r.getAs[String]("cp_month") == m, p)
      assert(r.getAs[Long]("max_abs_cusum_xn") == absc, p)
      assert(r.getAs[Long]("mean_before_milli") == (cumAt * 1000L) / t, p)
      assert(r.getAs[Long]("mean_after_milli")
        == ((total - cumAt) * 1000L) / (n - t), p)
    }
    // the t = n row (cusum identically 0) must never be selected
    got.values.foreach(r =>
      assert(r.getAs[Long]("cp_idx") < r.getAs[Long]("n_months")))
  }
}
