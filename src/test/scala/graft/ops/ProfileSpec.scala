package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {

  test("dq01 expectations: integrity checks pass, the tight threshold reports violations") {
    val rows = Dq.byName(Profile.dq01(spark, sfSmoke))
    // structural integrity of the star schema holds on the testdata
    Seq("customer_pk_unique", "orders_fk_customer", "lineitem_fk_orders",
      "orders_totalprice_positive", "lineitem_discount_unit_range",
      "events_value_nonnull", "documents_nchars_consistent").foreach { name =>
      val r = rows(name)
      assert(r._3, s"$name should pass")
      assert(r._1 == 0L, s"$name should have 0 violations, got ${r._1}")
    }
    // the deliberately tight check must demonstrate violation REPORTING
    val tight = rows("lineitem_discount_le_5pct")
    assert(!tight._3, "tight threshold should fail on this data")
    assert(tight._1 > 0L && tight._1 < tight._2,
      s"violations ${tight._1} should be a proper subset of ${tight._2} rows")
  }

  test("q48 winsorization clips ~5% on each tail and never widens the sum") {
    import graft.util.Exact.dsum
    import org.apache.spark.sql.functions._
    val rows = Profile.q48(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val raw = graft.Tables.lineitem(spark, sfSmoke)
      .groupBy(col("l_returnflag")).agg(dsum(col("l_extendedprice")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val lowFrac = r.getAs[Long]("n_clipped_low").toDouble / n
      val highFrac = r.getAs[Long]("n_clipped_high").toDouble / n
      assert(lowFrac > 0.0 && lowFrac <= 0.06, s"low $lowFrac")
      assert(highFrac > 0.0 && highFrac <= 0.06, s"high $highFrac")
      // clipping a right-skewed-or-symmetric tail pulls the sum toward the
      // body; at minimum it must differ from the raw sum
      assert(r.getAs[Double]("sum_winsorized") != raw(r.getString(0)))
    }
  }

  test("q56 z-score outliers: integer predicate agrees with a float recompute") {
    import spark.implicits._
    val rows = Profile.q56(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == graft.Tables.events(spark, sfSmoke).count())
    // recompute one group with plain double arithmetic; |z| > 3 is rare
    // enough that exact-integer and float forms agree away from the margin
    val grp = rows.head.getAs[String]("event_type")
    val vals = graft.Tables.events(spark, sfSmoke)
      .filter($"event_type" === grp)
      .select(org.apache.spark.sql.functions.round($"value" * 100).cast("long"))
      .collect().map(_.getLong(0))
    val mean = vals.sum.toDouble / vals.length
    val variance = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
    val floatOutliers = vals.count(v => math.abs(v - mean) > 3 * math.sqrt(variance))
    assert(rows.head.getAs[Long]("n_outliers") == floatOutliers)
  }

  test("fkCheck counts orphans when the parent side is truncated") {
    import spark.implicits._
    val customer = graft.Tables.customer(spark, sfSmoke)
    val orders = graft.Tables.orders(spark, sfSmoke)
    // drop half the customers -> some orders must orphan
    val truncated = customer.filter($"c_custkey" % 2 === 0)
    val r = Profile.fkCheck("orphans", orders, "o_custkey", truncated, "c_custkey")
      .collect().head
    val nViol = r.getAs[Long]("n_violations")
    assert(nViol > 0L && !r.getAs[Boolean]("passed"))
    assert(r.getAs[Long]("n_checked") == orders.count())
  }

  test("dq02 drift: shares are ppm-normalized, counts partition the windows, range filter pushes down") {
    import spark.implicits._
    val df = Profile.dq02(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10, s"${rows.length} bins")
    // each window's shares sum to 1e6 up to per-bin half-ulp rounding
    def ppmSum(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(math.abs(ppmSum("ref_ppm") - 1000000L) <= rows.length / 2 + 1)
    assert(math.abs(ppmSum("cur_ppm") - 1000000L) <= rows.length / 2 + 1)
    // bin counts partition each window exactly (nothing dropped or doubled)
    val orders = graft.Tables.orders(spark, sfSmoke)
    val nRef = orders.filter($"o_orderdate" < "1998-01-01").count()
    val nCur = orders.filter($"o_orderdate" >= "1999-01-01").count()
    assert(rows.map(_.getAs[Long]("ref_count")).sum == nRef)
    assert(rows.map(_.getAs[Long]("cur_count")).sum == nCur)
    // drift is the |Δ| of the reported shares, bin by bin
    rows.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") ==
        math.abs(r.getAs[Long]("cur_ppm") - r.getAs[Long]("ref_ppm")))
    }
    // the window predicate is date-literal range, so it must reach the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [Or(LessThan(o_orderdate"), plan)
  }

  test("gv02 k-anonymity histogram partitions the table and flags below-k classes") {
    val rows = Profile.gv02(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    // histogram covers every customer exactly once
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == graft.Tables.customer(spark, sfSmoke).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") ==
        r.getAs[Long]("class_size") * r.getAs[Long]("n_classes"))
      assert(r.getAs[Boolean]("below_k") ==
        (r.getAs[Long]("class_size") < Profile.AnonK))
    }
    // the direct class recompute agrees with the histogram's row accounting
    val direct = graft.Tables.customer(spark, sfSmoke)
      .groupBy(org.apache.spark.sql.functions.col("c_nationkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("c_acctbal") / 1000.0))
      .count().collect().map(_.getAs[Long]("count"))
    assert(direct.sum == total && direct.length ==
      rows.map(_.getAs[Long]("n_classes")).sum)
  }

  test("gv03 l-diversity histogram: l bounded by the segment domain, rows partition the table") {
    import org.apache.spark.sql.functions._
    val rows = Profile.gv03(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val cust = graft.Tables.customer(spark, sfSmoke)
    val nSegs = cust.select(col("c_mktsegment")).distinct().count()
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1 && l <= nSegs)
      assert(r.getAs[Boolean]("below_l") == (l < Profile.DiversityL))
    }
    // n_rows over the histogram partitions the customer table exactly
    assert(rows.map(_.getAs[Long]("n_rows")).sum == cust.count())
    // direct recompute: distinct-sensitive-count per (nat, band) class
    val direct = cust.groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0))
      .agg(countDistinct(col("c_mktsegment")).as("l")).collect()
      .groupBy(_.getAs[Long]("l")).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getAs[Long]("l") -> r.getAs[Long]("n_classes")).toMap
      == direct)
  }

  test("gv04 t-closeness: tvd in [0, 1e6] ppm, zero iff class mirrors the global mix, flag consistent") {
    import org.apache.spark.sql.functions._
    val rows = Profile.gv04(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("tvd_ppm")
      assert(t >= 0 && t <= 1000000L)
      assert(r.getAs[Boolean]("above_t") == (t > Profile.ClosenessTppm))
    }
    // driver-side exact recompute on the smoke table (small by design)
    val cust = graft.Tables.customer(spark, sfSmoke)
      .select(col("c_nationkey").cast("long").as("nat"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"),
        col("c_mktsegment").as("seg"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val bigN = cust.length.toLong
    val global = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val want = cust.groupBy(t => (t._1, t._2)).map { case ((nat, band), ms) =>
      val n = ms.length.toLong
      val cellCount = ms.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val num = global.map { case (seg, g) =>
        math.abs(cellCount.getOrElse(seg, 0L) * bigN - n * g)
      }.sum
      (nat, band) -> (num * 1000000L) / (2L * n * bigN)
    }
    val got = rows.map(r => (r.getAs[Long]("nat"), r.getAs[Long]("band"))
      -> r.getAs[Long]("tvd_ppm")).toMap
    assert(got == want)
  }
}

private object Dq {
  /** (n_violations, n_checked, passed) keyed by check_name. */
  def byName(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map { r =>
      r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"),
          r.getAs[Boolean]("passed")))
    }.toMap
}
