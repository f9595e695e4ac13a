package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class JoinsSpec extends AnyFunSuite with SparkSpec {

  test("q53 full outer: both null-padded sides appear, keys never null") {
    val rows = Joins.q53(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("yr")) && !r.isNullAt(r.fieldIndex("mon")))
    }
    // l_shipdate extends past the last o_orderdate, so returns-only months
    // must exist (the full-outer's right-side padding is exercised)
    val returnsOnly = rows.count(_.isNullAt(rows.head.fieldIndex("n_urgent")))
    assert(returnsOnly > 0, "expected months with returns but no urgent orders")
  }

  test("q54 lateral top-k: at most 2 nations per region, counts non-increasing within region") {
    val rows = Joins.q54(spark, sfSmoke).collect()
    val byRegion = rows.groupBy(_.getString(0))
    assert(byRegion.nonEmpty)
    byRegion.foreach { case (region, rs) =>
      assert(rs.length <= 2, s"$region returned ${rs.length} nations")
      val counts = rs.map(_.getLong(2))
      assert(counts.sorted.reverse.toSeq == counts.toSeq, s"$region not ranked")
    }
  }

  test("q55 recursive calendar: contiguous month spine spanning the order range") {
    val rows = Joins.q55(spark, sfSmoke).collect()
    val months = rows.map(_.getString(0))
    assert(months.toSet.size == months.length) // one row per month
    // contiguity: every consecutive pair is exactly one month apart
    val ym = months.map { m => val Array(y, mo) = m.split("-"); y.toInt * 12 + mo.toInt }
    ym.toSeq.sliding(2).foreach { case Seq(p, n) => assert(n == p + 1, s"gap at $p -> $n") }
    // spine rows with no urgent orders (if any) still carry zeros, not nulls
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getLong(1) >= 0L)
    }
  }
}
