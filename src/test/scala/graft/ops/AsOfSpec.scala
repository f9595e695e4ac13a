package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest at-or-before right row per key; no match -> null") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05"), 100.0),
      (2L, 10L, ts("2024-01-01 10:00:10"), 101.0), // equal-ts quote matches
      (3L, 10L, ts("2024-01-01 09:59:00"), 99.0),  // before any quote → null
      (4L, 20L, ts("2024-01-01 10:00:07"), 55.0),
    ).toDF("trade_id", "sym", "t_ts", "price")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L),
      (10L, ts("2024-01-01 10:00:10"), 2L),
      (20L, ts("2024-01-01 10:00:06"), 3L),
      (30L, ts("2024-01-01 10:00:00"), 4L), // key never probed
    ).toDF("sym", "q_ts", "quote_id")

    val out = AsOf.asofJoin(trades, quotes, key = "sym",
      leftTs = "t_ts", rightTs = "q_ts", rightCols = Seq("q_ts", "quote_id"))
      .orderBy($"trade_id")
      .collect()
      .map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[java.lang.Long]("asof_quote_id")))
      .toMap

    assert(out(1L) == Some(1L)) // 10:00:05 → quote @10:00:00
    assert(out(2L) == Some(2L)) // equal ts matches (ASOF >=)
    assert(out(3L) == None)     // no quote at-or-before
    assert(out(4L) == Some(3L))
    assert(out.size == 4)       // all probe rows kept
  }

  test("asof join keeps every probe row exactly once") {
    val n = 50
    val probes = (1 to n).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 10:00:${i % 60}%02d"), 0.0))
      .toDF("trade_id", "sym", "t_ts", "price")
    val refs = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("sym", "q_ts", "quote_id")
    val out = AsOf.asofJoin(probes, refs, "sym", "t_ts", "q_ts", Seq("quote_id"))
    assert(out.count() == n)
    assert(out.filter($"asof_quote_id" === 7L).count() == n)
  }

  test("forward asof picks earliest at-or-after right row; equal ts matches; no later -> null") {
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // equal-ts right exists -> match it
      (2L, "a", ts("2024-01-01 11:00:00")), // between rights -> next one
      (3L, "a", ts("2024-01-01 23:00:00")), // after all rights -> null
      (4L, "b", ts("2024-01-01 00:00:00")), // key with no rights -> null
    ).toDF("id", "k", "lts")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 100L),
      ("a", ts("2024-01-01 12:00:00"), 200L),
      ("a", ts("2024-01-01 09:00:00"), 50L), // earlier than every probe: never chosen
    ).toDF("k", "rts", "rid")
    val got = AsOf.asofJoinForward(left, right, "k", "lts", "rts", Seq("rts", "rid"))
      .select($"id", $"asof_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }
}
