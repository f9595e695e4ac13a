package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AggregatesSpec extends AnyFunSuite with SparkSpec {

  test("approx_percentile (t-digest) stays within 10% of the exact percentile") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = graft.Tables.lineitem(spark, sfSmoke)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.5)).as("exact"),
        approx_percentile($"l_extendedprice", lit(0.5), lit(1000)).as("approx"),
      ).collect()
    rows.foreach { r =>
      val exact = r.getDouble(1)
      val approx = r.getDouble(2)
      assert(math.abs(approx - exact) / exact < 0.1, s"$exact vs $approx")
    }
  }

  test("q46 quantile sketch bounds hold and exact quantiles match q33's form") {
    val rows = Aggregates.q46(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"${r.getString(0)}: p50 sketch off by >5%")
      assert(r.getAs[Boolean]("p90_ok"), s"${r.getString(0)}: p90 sketch off by >5%")
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p90_exact"))
    }
  }

  test("q30 sketch estimates stay within 5% of exact distinct counts") {
    val rows = Aggregates.q30(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_users_ok"),
        s"${r.getString(0)}: users sketch off by >5% of ${r.getAs[Long]("exact_users")}")
      assert(r.getAs[Boolean]("hll_props_ok"),
        s"${r.getString(0)}: props sketch off by >5% of ${r.getAs[Long]("exact_props")}")
    }
  }
}
