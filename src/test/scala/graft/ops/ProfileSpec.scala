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
