package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IncrementalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq

  test("partial-merge rollup is split-invariant and matches the one-shot aggregate") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val oneShot = rows(Incremental.mergeWeekly(Incremental.weeklyPartial(ev)))
    assert(oneShot.nonEmpty)
    // two different split points → identical merged view, bit-for-bit
    for (split <- Seq("2024-01-08", "2024-01-23")) {
      val s = org.apache.spark.sql.functions.lit(split).cast("timestamp")
      val merged = rows(Incremental.mergeWeekly(
        Incremental.weeklyPartial(ev.filter($"ts" < s)),
        Incremental.weeklyPartial(ev.filter($"ts" >= s))))
      assert(merged == oneShot, s"split at $split diverged")
    }
    // three-way split (two "daily loads" after the base) also converges
    val (a, b) = (org.apache.spark.sql.functions.lit("2024-01-10").cast("timestamp"),
      org.apache.spark.sql.functions.lit("2024-01-20").cast("timestamp"))
    val threeWay = rows(Incremental.mergeWeekly(
      Incremental.weeklyPartial(ev.filter($"ts" < a)),
      Incremental.weeklyPartial(ev.filter($"ts" >= a && $"ts" < b)),
      Incremental.weeklyPartial(ev.filter($"ts" >= b))))
    assert(threeWay == oneShot)
  }

  test("merging an empty delta is a no-op") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val base = Incremental.weeklyPartial(ev)
    val emptyDelta = Incremental.weeklyPartial(ev.limit(0))
    assert(rows(Incremental.mergeWeekly(base, emptyDelta)) ==
      rows(Incremental.mergeWeekly(base)))
  }
}
