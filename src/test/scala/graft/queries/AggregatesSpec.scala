package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AggregatesSpec extends AnyFunSuite with SparkSpec {

  test("q30 sketch estimates stay within 5% of exact distinct counts") {
    val rows = Aggregates.q30(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
