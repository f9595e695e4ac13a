package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native as-of operator (custom LogicalPlan + Strategy + SparkPlan)
  * must agree row-for-row with the composed union+window form on real
  * data, handle every edge the composed form handles on crafted fixtures,
  * and plan as one shuffle per side (never a cartesian). Value-level
  * parity with DuckDB's native ASOF is the q63 driver gate.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native == composed on the events table, row for row") {
    val native = graft.ops.AsOf.q63(spark, sfSmoke).collect().toSeq
    val composed = graft.ops.AsOf.q31(spark, sfSmoke).collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("edge semantics: no-match nulls, equal-ts match, dup right rows, null keys/times") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // before any right row -> nulls
      (2L, "a", ts("2024-01-02 10:00:00")), // equal ts -> matches
      (3L, "a", ts("2024-01-03 10:00:00")), // two right rows at same ts -> greatest tuple
      (4L, "b", ts("2024-01-05 10:00:00")), // key with no right rows -> nulls
      (5L, null, ts("2024-01-05 10:00:00")), // null key -> nulls
      (6L, "c", null), // null time -> nulls
      (7L, "c", ts("2024-01-09 10:00:00")), // later match after null-ts row
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-02 10:00:00"), 100L),
      ("a", ts("2024-01-03 09:00:00"), 200L),
      ("a", ts("2024-01-03 09:00:00"), 300L), // duplicate (key, ts): 300 wins
      (null, ts("2024-01-01 00:00:00"), 400L), // null right key: never matches
      ("c", null, 500L), // null right time: never matches
      ("c", ts("2024-01-08 00:00:00"), 600L),
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .orderBy($"id")
      .select($"id", $"v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(
      1L -> -1L, 2L -> 100L, 3L -> 300L, 4L -> -1L, 5L -> -1L, 6L -> -1L, 7L -> 600L))
  }

  test("left rows keep their own columns; right columns nullable in output") {
    val left = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(("z", ts("2023-01-01 00:00:00"), 1L)).toDF("rk", "rt", "v")
    val df = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
    assert(df.columns.toSeq == Seq("id", "k", "t", "rk", "rt", "v"))
    assert(df.schema("v").nullable)
    val row = df.collect()(0)
    assert(row.getLong(0) == 1L && row.isNullAt(5))
  }

  test("plan: AsOfJoinExec with one hash exchange per side, no cartesian") {
    val events = graft.Tables.events(spark, sfSmoke)
    val l = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val r = events.filter($"event_type" === "signup")
      .select($"user_id".as("su"), $"ts".as("st"))
    val df = AsOfJoinPlan.asof(l, r, "user_id", "su", "ts", "st")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix — the node prints as AsOfJoin
    assert(plan.contains("AsOfJoin"), s"native exec not planned:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join shape:\n$plan")
    assert("hashpartitioning\\(user_id".r.findFirstIn(plan).isDefined &&
      "hashpartitioning\\(su".r.findFirstIn(plan).isDefined,
      s"expected one hash exchange per side on its key:\n$plan")
    // per-side sorts on (key, time) inserted by EnsureRequirements
    assert("Sort \\[user_id#\\d+L? ASC".r.findFirstIn(plan).isDefined &&
      "Sort \\[su#\\d+L? ASC".r.findFirstIn(plan).isDefined,
      s"expected per-side (key, time) sorts:\n$plan")
    // the physical node really is ours: collecting from the sparkPlan
    // (pre-adaptive) tree finds the exec instance
    val execs = df.queryExecution.sparkPlan.collect { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty, "AsOfJoinExec missing from the physical plan tree")
  }

  test("native shuffles less data than the composed union+window form") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffledBytes(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
        case q: QueryStageExec => q +: walk(q.plan)
        case other => other +: other.children.flatMap(walk)
      }
      val sizes = walk(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike => s.metrics("dataSize").value
      }
      assert(sizes.nonEmpty, "no shuffle metric found")
      sizes.sum
    }
    val events = graft.Tables.events(spark, sfSmoke)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val composed = shuffledBytes(graft.ops.AsOf.asofJoin(
      purchases,
      events.filter($"event_type" === "signup")
        .select($"user_id", $"ts".as("signup_ts"), $"event_id".as("signup_id")),
      key = "user_id", leftTs = "ts", rightTs = "signup_ts",
      rightCols = Seq("signup_ts", "signup_id")))
    val native = shuffledBytes(org.apache.spark.sql.graft.AsOfJoinPlan.asof(
      purchases,
      events.filter($"event_type" === "signup")
        .select($"user_id".as("s_user_id"), $"ts".as("signup_ts"),
          $"event_id".as("signup_id")),
      leftKey = "user_id", rightKey = "s_user_id",
      leftTs = "ts", rightTs = "signup_ts"))
    assert(native > 0 && composed > 0)
    // the composed form unions both sides into one window partition with
    // null-padded columns; the native form shuffles each side at its own
    // width — strictly less bytes on the wire
    assert(native < composed,
      s"native shuffled $native bytes, composed $composed — expected native smaller")
    // same assertion on STRING keys (the q70/q71 gated pair's shape): the
    // UTF8String walk must keep the wire advantage, not just the wall win
    val uidPurchases = events.filter($"event_type" === "purchase")
      .select($"event_id", concat(lit("u"), $"user_id").as("uid"), $"ts", $"value")
    val composedStr = shuffledBytes(graft.ops.AsOf.asofJoin(
      uidPurchases,
      events.filter($"event_type" === "signup")
        .select(concat(lit("u"), $"user_id").as("uid"),
          $"ts".as("signup_ts"), $"event_id".as("signup_id")),
      key = "uid", leftTs = "ts", rightTs = "signup_ts",
      rightCols = Seq("signup_ts", "signup_id")))
    val nativeStr = shuffledBytes(org.apache.spark.sql.graft.AsOfJoinPlan.asof(
      uidPurchases,
      events.filter($"event_type" === "signup")
        .select(concat(lit("u"), $"user_id").as("s_uid"),
          $"ts".as("signup_ts"), $"event_id".as("signup_id")),
      leftKey = "uid", rightKey = "s_uid",
      leftTs = "ts", rightTs = "signup_ts"))
    assert(nativeStr > 0 && nativeStr < composedStr,
      s"string keys: native shuffled $nativeStr bytes, composed $composedStr")
  }

  test("forward direction: native == composed on events; edge fixtures correct") {
    val native = graft.ops.AsOf.q64(spark, sfSmoke).collect().toSeq
    val composed = graft.ops.AsOf.q62(spark, sfSmoke).collect().toSeq
    assert(native.nonEmpty && native == composed)
    // crafted edges: at-or-after, equal-ts match, dup rows -> smallest wins
    val left = Seq(
      (1L, "a", ts("2024-01-02 10:00:00")), // equal ts -> matches
      (2L, "a", ts("2024-01-04 00:00:00")), // after all right rows -> nulls
      (3L, "a", ts("2024-01-03 00:00:00")), // two rows at same ts -> smallest v
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-02 10:00:00"), 100L),
      ("a", ts("2024-01-03 09:00:00"), 300L),
      ("a", ts("2024-01-03 09:00:00"), 200L), // duplicate (key, ts): 200 wins
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt", forward = true)
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 100L, 2L -> -1L, 3L -> 200L))
  }

  test("edge semantics on long-backed keys — the specialized primitive walk") {
    // same edges as the string-key test, but BIGINT keys + TIMESTAMP times
    // take the no-boxing primitive path (string keys take the UTF8String
    // walk, decimal keys the generic one — all paths must agree)
    val left = Seq(
      (1L, Option(10L), Option(ts("2024-01-01 10:00:00"))), // before any right row -> nulls
      (2L, Option(10L), Option(ts("2024-01-02 10:00:00"))), // equal ts -> matches
      (3L, Option(10L), Option(ts("2024-01-03 10:00:00"))), // dup right ts -> greatest tuple
      (4L, Option(20L), Option(ts("2024-01-05 10:00:00"))), // key with no right rows -> nulls
      (5L, None, Option(ts("2024-01-05 10:00:00"))), // null key -> nulls
      (6L, Option(30L), None), // null time -> nulls
      (7L, Option(30L), Option(ts("2024-01-09 10:00:00"))), // later match after null-ts row
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option(10L), Option(ts("2024-01-02 10:00:00")), 100L),
      (Option(10L), Option(ts("2024-01-03 09:00:00")), 200L),
      (Option(10L), Option(ts("2024-01-03 09:00:00")), 300L), // duplicate (key, ts): 300 wins
      (None: Option[Long], Option(ts("2024-01-01 00:00:00")), 400L), // null right key
      (Option(30L), None: Option[Timestamp], 500L), // null right time
      (Option(30L), Option(ts("2024-01-08 00:00:00")), 600L),
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .orderBy($"id")
      .select($"id", $"v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(
      1L -> -1L, 2L -> 100L, 3L -> 300L, 4L -> -1L, 5L -> -1L, 6L -> -1L, 7L -> 600L))
    // forward over the same fixture: first at-or-after
    val fwd = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt", forward = true)
      .orderBy($"id")
      .select($"id", $"v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(fwd == Map(
      1L -> 100L, 2L -> 100L, 3L -> -1L, 4L -> -1L, 5L -> -1L, 6L -> -1L, 7L -> -1L))
  }

  test("right side carrying a map column plans and runs (unorderable excluded from tiebreak)") {
    // before the round-11 fix requiredChildOrdering demanded an ascending
    // sort on EVERY remaining right column — a map column failed at
    // planning time with "cannot be used in an ordering"
    val left = Seq((1L, "a", ts("2024-01-02 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 00:00:00"), Map("x" -> 1L)))
      .toDF("rk", "rt", "props")
    val row = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt").collect()(0)
    assert(row.getLong(0) == 1L)
    assert(row.getMap[String, Long](5) == Map("x" -> 1L))
  }

  test("elimination: a parent referencing no right column bypasses the join") {
    val events = graft.Tables.events(spark, sfSmoke)
    val l = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val r = events.filter($"event_type" === "signup")
      .select($"user_id".as("su"), $"ts".as("st"))
    // left-only projection: the join must vanish from the optimized plan
    val leftOnly = AsOfJoinPlan.asof(l, r, "user_id", "su", "ts", "st")
      .select($"event_id", $"user_id")
    val optimized = leftOnly.queryExecution.optimizedPlan
    assert(!optimized.exists(_.isInstanceOf[org.apache.spark.sql.graft.AsOfJoin]),
      s"as-of join not eliminated:\n$optimized")
    assert(leftOnly.count() == l.count(), "elimination changed cardinality")
    // count(*) likewise collapses (the bench regime): no exec in the plan
    val counted = AsOfJoinPlan.asof(l, r, "user_id", "su", "ts", "st")
      .groupBy().count()
    assert(!counted.queryExecution.optimizedPlan
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.AsOfJoin]),
      "count(*) over as-of join should not pay for the join")
    // but a right-column reference KEEPS the join
    val withRight = AsOfJoinPlan.asof(l, r, "user_id", "su", "ts", "st")
      .select($"event_id", $"st")
    assert(withRight.queryExecution.optimizedPlan
      .exists(_.isInstanceOf[org.apache.spark.sql.graft.AsOfJoin]),
      "join wrongly eliminated while a right column is referenced")
  }

  test("column pruning reaches through the custom node; tiebreak runs over kept columns") {
    import org.apache.spark.sql.graft.AsOfJoin
    val left = Seq((1L, "a", ts("2024-01-02 00:00:00"))).toDF("id", "k", "t")
    // duplicate (key, time) right rows: the tiebreak must stay correct
    // over whatever columns survive pruning
    val right = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L, 9L, 1L),
      ("a", ts("2024-01-01 00:00:00"), 2L, 0L, 2L),
    ).toDF("rk", "rt", "va", "vx", "vb")
    // Catalyst's generic ColumnPruning (not a custom rule) narrows the
    // right side to key/time + referenced columns — the 100 TB shuffle-
    // width win — for ANY referenced subset, middles included
    val pruned = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .select($"id", $"va")
    val prunedJoin = pruned.queryExecution.optimizedPlan
      .collect { case j: AsOfJoin => j }
    assert(prunedJoin.nonEmpty, "join vanished — elimination fired instead of pruning")
    assert(prunedJoin.head.right.output.map(_.name) == Seq("rk", "rt", "va"),
      s"expected right side pruned to kept columns, got ${prunedJoin.head.right.output.map(_.name)}")
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L))) // greatest kept tuple wins
    // referencing only the LAST column prunes the middle one too; the
    // winner is the greatest under the kept (rk, rt, vb) order
    val lastOnly = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .select($"id", $"vb")
    val lastJoin = lastOnly.queryExecution.optimizedPlan
      .collect { case j: AsOfJoin => j }
    assert(lastJoin.nonEmpty)
    assert(lastJoin.head.right.output.map(_.name) == Seq("rk", "rt", "vb"),
      s"expected middle column pruned too: ${lastJoin.head.right.output.map(_.name)}")
    assert(lastOnly.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  test("tolerance: nearest match nulled when stale, boundary inclusive, on BOTH walk paths") {
    val tol = Some(60L * 1000000L) // 60 s in micros
    def check(left: org.apache.spark.sql.DataFrame,
        right: org.apache.spark.sql.DataFrame): Unit = {
      val back = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt",
        tolerance = tol)
        .select($"id", $"v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // 1: equal ts (0 s) match; 2,3: newest prior is 240/210 s stale ->
      // null; 4: exactly 60 s -> inclusive match; 5: 330 s -> null;
      // 6: 30 s fresh -> match
      assert(back == Map(1L -> 100L, 2L -> -1L, 3L -> -1L, 4L -> 100L,
        5L -> -1L, 6L -> 200L), s"backward: $back")
      val fwd = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt",
        forward = true, tolerance = tol)
        .select($"id", $"v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // 1: equal ts match; 2: 30 s ahead fresh; 3: exactly 60 s inclusive;
      // 4: 210 s ahead stale -> null; 5,6: nothing at-or-after -> null
      assert(fwd == Map(1L -> 100L, 2L -> 200L, 3L -> 200L, 4L -> -1L,
        5L -> -1L, 6L -> -1L), s"forward: $fwd")
    }
    // rights at 10:00:00 (v=100) and 10:04:30 (v=200); probes:
    // 10:00:00, 10:04:00, 10:03:30, 10:01:00, 10:10:00, 10:05:00
    val times = Seq("10:00:00", "10:04:00", "10:03:30", "10:01:00",
      "10:10:00", "10:05:00")
    def lts(i: Int) = ts(s"2024-01-01 ${times(i - 1)}")
    val rts1 = ts("2024-01-01 10:00:00")
    val rts2 = ts("2024-01-01 10:04:30")
    // primitive path: BIGINT keys
    check(
      (1L to 6L).map(i => (i, 10L, lts(i.toInt))).toDF("id", "k", "t"),
      Seq((10L, rts1, 100L), (10L, rts2, 200L)).toDF("rk", "rt", "v"))
    // UTF8String path: STRING keys, same shape
    check(
      (1L to 6L).map(i => (i, "a", lts(i.toInt))).toDF("id", "k", "t"),
      Seq(("a", rts1, 100L), ("a", rts2, 200L)).toDF("rk", "rt", "v"))
    // fully generic path: DECIMAL keys (neither long-backed nor string)
    check(
      (1L to 6L).map(i => (i, BigDecimal(10), lts(i.toInt))).toDF("id", "k", "t"),
      Seq((BigDecimal(10), rts1, 100L), (BigDecimal(10), rts2, 200L))
        .toDF("rk", "rt", "v"))
  }

  test("nearest direction: smaller |Δt| wins, ties go backward, tolerance on the chosen delta, both paths") {
    def check(left: org.apache.spark.sql.DataFrame,
        right: org.apache.spark.sql.DataFrame): Unit = {
      def run(tol: Option[Long]) =
        AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt",
          tolerance = tol, nearest = true)
          .select($"id", $"v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // rights at 10:00:00 (v=100) and 10:04:30 (v=200)
      // 1: 10:02:00 -> back 120 s vs fwd 150 s -> 100
      // 2: 10:02:30 -> back 150 s vs fwd 120 s -> 200
      // 3: 10:02:15 -> 135 s both -> tie -> BACKWARD -> 100
      // 4: 09:00:00 -> no earlier row -> forward 3600 s -> 100
      // 5: 11:00:00 -> no later row -> backward 3330 s -> 200
      assert(run(None) == Map(1L -> 100L, 2L -> 200L, 3L -> 100L,
        4L -> 100L, 5L -> 200L), s"unbounded: ${run(None)}")
      // 130 s bound: 1 and 2 stay (120 s), 3 drops (chosen 135 s), the
      // distant 4/5 drop — never replaced by the other (farther) side
      assert(run(Some(130L * 1000000L)) == Map(1L -> 100L, 2L -> 200L,
        3L -> -1L, 4L -> -1L, 5L -> -1L), s"bounded: ${run(Some(130000000L))}")
    }
    val times = Seq("10:02:00", "10:02:30", "10:02:15", "09:00:00", "11:00:00")
    def lts(i: Int) = ts(s"2024-01-01 ${times(i - 1)}")
    val rts1 = ts("2024-01-01 10:00:00")
    val rts2 = ts("2024-01-01 10:04:30")
    check( // primitive path: BIGINT keys
      (1L to 5L).map(i => (i, 10L, lts(i.toInt))).toDF("id", "k", "t"),
      Seq((10L, rts1, 100L), (10L, rts2, 200L)).toDF("rk", "rt", "v"))
    check( // UTF8String path: STRING keys
      (1L to 5L).map(i => (i, "a", lts(i.toInt))).toDF("id", "k", "t"),
      Seq(("a", rts1, 100L), ("a", rts2, 200L)).toDF("rk", "rt", "v"))
    check( // fully generic path: DECIMAL keys
      (1L to 5L).map(i => (i, BigDecimal(10), lts(i.toInt))).toDF("id", "k", "t"),
      Seq((BigDecimal(10), rts1, 100L), (BigDecimal(10), rts2, 200L))
        .toDF("rk", "rt", "v"))
  }

  test("nearest agrees with a brute-force reference across a randomized fixture") {
    val rnd = new scala.util.Random(11)
    val keys = Vector(1L, 2L, 3L, 4L)
    val lrows = (1L to 200L).map(i =>
      (i, keys(rnd.nextInt(4)), ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    val rrows = (1L to 80L).map(i =>
      (keys(rnd.nextInt(4)), ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i))
    val got = AsOfJoinPlan.asof(
      lrows.toDF("id", "k", "t"), rrows.toDF("rk", "rt", "v"),
      "k", "rk", "t", "rt", nearest = true)
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = lrows.map { case (id, k, t) =>
      val same = rrows.filter(_._1 == k)
      val back = same.filter(!_._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption
      val fwd = same.filter(!_._2.before(t))
        .sortBy(r => (r._2.getTime, r._3)).headOption
      id -> ((back, fwd) match {
        case (None, None) => -1L
        case (Some(b), None) => b._3
        case (None, Some(f)) => f._3
        case (Some(b), Some(f)) =>
          if (t.getTime - b._2.getTime <= f._2.getTime - t.getTime) b._3 else f._3
      })
    }.toMap
    assert(got == want)
  }

  test("edge semantics on decimal keys — the fully generic interpreted walk") {
    // DECIMAL keys are neither long-backed nor strings, so this is the one
    // fixture that still routes through doExecuteGeneric after the
    // UTF8String specialization — same edges, same expected map
    def d(v: Long) = BigDecimal(v)
    val left = Seq(
      (1L, Option(d(10)), Option(ts("2024-01-01 10:00:00"))),
      (2L, Option(d(10)), Option(ts("2024-01-02 10:00:00"))),
      (3L, Option(d(10)), Option(ts("2024-01-03 10:00:00"))),
      (4L, Option(d(20)), Option(ts("2024-01-05 10:00:00"))),
      (5L, None: Option[BigDecimal], Option(ts("2024-01-05 10:00:00"))),
      (6L, Option(d(30)), None: Option[Timestamp]),
      (7L, Option(d(30)), Option(ts("2024-01-09 10:00:00"))),
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option(d(10)), Option(ts("2024-01-02 10:00:00")), 100L),
      (Option(d(10)), Option(ts("2024-01-03 09:00:00")), 200L),
      (Option(d(10)), Option(ts("2024-01-03 09:00:00")), 300L),
      (None: Option[BigDecimal], Option(ts("2024-01-01 00:00:00")), 400L),
      (Option(d(30)), None: Option[Timestamp], 500L),
      (Option(d(30)), Option(ts("2024-01-08 00:00:00")), 600L),
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .orderBy($"id").select($"id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(
      1L -> -1L, 2L -> 100L, 3L -> 300L, 4L -> -1L, 5L -> -1L, 6L -> -1L, 7L -> 600L))
  }

  test("tolerance with a non-long-backed time type fails loudly") {
    val left = Seq((1L, "a", "x")).toDF("id", "k", "t")
    val right = Seq(("a", "w", 1L)).toDF("rk", "rt", "v")
    val e = intercept[Throwable] {
      AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt",
        tolerance = Some(10L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("long-backed")), s"got: ${messages(e)}")
  }

  test("mixed keys interleave correctly across a larger generated fixture") {
    // brute-force reference on 300 left x 120 right rows across 6 keys
    val rnd = new scala.util.Random(7)
    val keys = Vector("k0", "k1", "k2", "k3", "k4", "k5")
    val lrows = (1L to 300L).map(i =>
      (i, keys(rnd.nextInt(6)), ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00")))
    val rrows = (1L to 120L).map(i =>
      (keys(rnd.nextInt(6)), ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"), i))
    val left = lrows.toDF("id", "k", "t")
    val right = rrows.toDF("rk", "rt", "v")
    val got = AsOfJoinPlan.asof(left, right, "k", "rk", "t", "rt")
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = lrows.map { case (id, k, t) =>
      val matches = rrows.filter(rr => rr._1 == k && !rr._2.after(t))
      // greatest (rt, then remaining cols = v) wins — the exec's tiebreak
      id -> (if (matches.isEmpty) -1L
             else matches.maxBy(rr => (rr._2.getTime, rr._3))._3)
    }.toMap
    assert(got == want)
  }
}
