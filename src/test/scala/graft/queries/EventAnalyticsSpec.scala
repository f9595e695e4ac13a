package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class EventAnalyticsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("q51 cohort retention: offset-0 cell equals cohort size, cells never exceed it") {
    val rows = EventAnalytics.q51(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val cohortSize = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val cw = r.getAs[String]("cohort_week")
      assert(r.getAs[Int]("week_offset") >= 0)
      assert(cohortSize.contains(cw), s"cohort $cw missing its offset-0 cell")
      assert(r.getAs[Long]("n_users") <= cohortSize(cw),
        s"retained > cohort size at $cw+${r.getAs[Int]("week_offset")}")
    }
    // every user is in exactly one cohort: offset-0 cells sum to user count
    val nUsers = Tables.events(spark, sfSmoke).select($"user_id").distinct().count()
    assert(cohortSize.values.sum == nUsers)
  }

  test("q52 funnel: step counts are monotone non-increasing and step order is strict") {
    val rows = EventAnalytics.q52(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq.toString)
    // strict-order semantics: a user counted at step 2 has a click AFTER
    // their first view (recompute one user end-to-end)
    val ev = Tables.events(spark, sfSmoke)
      .select($"user_id", $"event_type", $"ts").collect()
      .groupBy(_.getAs[Long]("user_id"))
    val progressed = ev.filter { case (_, rs) =>
      val views = rs.filter(_.getString(1) == "view").map(_.getTimestamp(2).getTime)
      val clicks = rs.filter(_.getString(1) == "click").map(_.getTimestamp(2).getTime)
      views.nonEmpty && clicks.exists(_ > views.min)
    }
    assert(counts(1) == progressed.size)
  }

  test("q58 paths: counts match a driver-side trigram recompute") {
    import spark.implicits._
    val rows = EventAnalytics.q58(spark, sfSmoke).collect()
    assert(rows.length == 10)
    // driver-side oracle over the same grain: per-user (ts, event_id)
    // ordered event types, sliding windows of 3
    val byUser = Tables.events(spark, sfSmoke)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expected = byUser.values.flatMap { rs =>
      rs.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .map(_.getString(3)).sliding(3).filter(_.length == 3)
        .map(_.mkString(" > "))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = expected.toSeq.sortBy { case (p2, n) => (-n, p2) }.take(10)
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq == top)
    // descending, total-ordered output
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q59 sessionize: sessions match a driver-side gaps-and-islands recompute") {
    import spark.implicits._
    val rows = EventAnalytics.q59(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // driver-side recompute: sort each user's (us, event_id), split at gaps
    val byUser = Tables.events(spark, sfSmoke)
      .select($"user_id", $"event_id", $"event_type",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = byUser.toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._2))
      val sessions = ordered.tail.scanLeft(Seq(ordered.head)) { (cur, e) =>
        if (e._4 - cur.last._4 > EventAnalytics.SessionGapUs) Seq(e) else cur :+ e
      }.filter(s => s.nonEmpty)
      // scanLeft emits every prefix; keep only each session's FINAL state
      val finals = sessions.zipWithIndex.collect {
        case (s2, i) if i == sessions.length - 1 || sessions(i + 1).length == 1 => s2
      }
      finals.zipWithIndex.map { case (s2, i) =>
        (uid, i + 1L, s2.head._4, s2.last._4, s2.last._4 - s2.head._4,
          s2.length.toLong, s2.map(_._3).distinct.length.toLong)
      }
    }.sortBy(t => (t._1, t._2))
    assert(rows.toSeq == expected)
    // sanity: at least one user has >1 session and one session has >1 event
    assert(rows.exists(_._2 > 1L))
    assert(rows.exists(_._6 > 1L))
  }

  test("ep01 patterns: planted sessions land in exactly the right buckets") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // one calendar-day session per user:
    //  u1: signup > click > purchase        → signup_then_purchase + clean
    //  u2: error > purchase                 → purchase, but NOT clean
    //  u3: purchase > error                 → clean (error only after)
    //  u4: view                             → bounce
    //  u5: purchase > signup                → purchase before signup: clean only
    val ev = Seq(
      (1L, t(1), 10L, "signup"), (1L, t(2), 11L, "click"), (1L, t(3), 12L, "purchase"),
      (2L, t(1), 20L, "error"), (2L, t(2), 21L, "purchase"),
      (3L, t(1), 30L, "purchase"), (3L, t(2), 31L, "error"),
      (4L, t(1), 40L, "view"),
      (5L, t(1), 50L, "purchase"), (5L, t(2), 51L, "signup"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.sessionPatterns(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "bounce" -> 1L, // u4
      "clean_purchase" -> 3L, // u1, u3, u5
      "signup_then_purchase" -> 1L, // u1
    ))
  }

  test("ep02 variable-length patterns: quantifier runs, restarts, back-to-back matches") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def row(u: Long, m: Int, id: Long, et: String) = (u, t(m), id, et)
    val ev = Seq(
      // u1: signup > view > view > purchase           → 1 match, b=2
      row(1L, 1, 10L, "signup"), row(1L, 2, 11L, "view"),
      row(1L, 3, 12L, "view"), row(1L, 4, 13L, "purchase"),
      // u2: signup > purchase                         → B+ needs ≥1: NO match
      row(2L, 1, 20L, "signup"), row(2L, 2, 21L, "purchase"),
      // u3: signup > view > error > purchase          → error breaks the run: NO match
      row(3L, 1, 30L, "signup"), row(3L, 2, 31L, "view"),
      row(3L, 3, 32L, "error"), row(3L, 4, 33L, "purchase"),
      // u4: signup > view > signup > click > purchase → restart on 2nd A: 1 match, b=1
      row(4L, 1, 40L, "signup"), row(4L, 2, 41L, "view"),
      row(4L, 3, 42L, "signup"), row(4L, 4, 43L, "click"),
      row(4L, 5, 44L, "purchase"),
      // u5: two back-to-back matches (b=1, then b=3)  → n=2, total=4, max=3
      row(5L, 1, 50L, "signup"), row(5L, 2, 51L, "click"),
      row(5L, 3, 52L, "purchase"), row(5L, 4, 53L, "signup"),
      row(5L, 5, 54L, "view"), row(5L, 6, 55L, "click"),
      row(5L, 7, 56L, "view"), row(5L, 8, 57L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.variablePatterns(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((1L, 2L, 2L)),
      4L -> ((1L, 1L, 1L)),
      5L -> ((2L, 4L, 3L)),
    ), s"got $out")
  }

  test("ep03 bounded repetition: run thresholds, resets, back-to-back, longest run") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def row(u: Long, m: Int, id: Long, et: String) = (u, t(m), id, et)
    val ev = Seq(
      // u1: error > error > purchase                  → 1 match, run=2
      row(1L, 1, 10L, "error"), row(1L, 2, 11L, "error"), row(1L, 3, 12L, "purchase"),
      // u2: error > purchase                          → run 1 < 2: NO match
      row(2L, 1, 20L, "error"), row(2L, 2, 21L, "purchase"),
      // u3: error > error > view > purchase           → view resets: NO match
      row(3L, 1, 30L, "error"), row(3L, 2, 31L, "error"),
      row(3L, 3, 32L, "view"), row(3L, 4, 33L, "purchase"),
      // u4: e>e>e>purchase then e>e>purchase          → n=2, max_run=3
      row(4L, 1, 40L, "error"), row(4L, 2, 41L, "error"),
      row(4L, 3, 42L, "error"), row(4L, 4, 43L, "purchase"),
      row(4L, 5, 44L, "error"), row(4L, 6, 45L, "error"),
      row(4L, 7, 46L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.boundedRepetitionPatterns(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((1L, 2L)), 4L -> ((2L, 3L))), s"got $out")
  }

  test("ep03 agrees with an independent in-memory automaton on real events") {
    val events = graft.Tables.events(spark, sfSmoke)
    val got = EventAnalytics.boundedRepetitionPatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val raw = events.selectExpr("user_id", "CAST(ts AS DATE) AS day",
        "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    val want = raw.groupBy(e => (e._1, e._2)).flatMap { case (key, rows) =>
      val seq = rows.sortBy(e => (e._3.getTime, e._4)).map(_._5)
      var run = 0L; var n = 0L; var mx = 0L
      seq.foreach {
        case "error" => run += 1
        case "purchase" =>
          if (run >= 2) { n += 1; mx = math.max(mx, run) }
          run = 0
        case _ => run = 0
      }
      if (n > 0) Some(key -> ((n, mx))) else None
    }.toMap
    assert(got == want)
  }

  test("ep04 overlapping alphabet: greedy closer, inner signups absorbed, skip past last row") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def row(u: Long, m: Int, id: Long, et: String) = (u, t(m), id, et)
    val ev = Seq(
      // u1: signup > view > purchase                      → 1 match, len 3
      row(1L, 1, 10L, "signup"), row(1L, 2, 11L, "view"), row(1L, 3, 12L, "purchase"),
      // u2: signup > view > purchase > view > purchase    → GREEDY absorbs the
      // inner purchase: ONE match to the LAST purchase, len 5 (a disjoint-
      // alphabet formulation would stop at the first and find two)
      row(2L, 1, 20L, "signup"), row(2L, 2, 21L, "view"), row(2L, 3, 22L, "purchase"),
      row(2L, 4, 23L, "view"), row(2L, 5, 24L, "purchase"),
      // u3: signup > view > error > purchase              → error breaks; the
      // purchase lands while idle: NO match
      row(3L, 1, 30L, "signup"), row(3L, 2, 31L, "view"),
      row(3L, 3, 32L, "error"), row(3L, 4, 33L, "purchase"),
      // u4: signup > purchase > signup > view > purchase > error → the inner
      // signup is a W token, not a restart: ONE match [1..5], len 5 — the
      // skip-mode distinguisher (SKIP TO NEXT ROW would also match [3..5])
      row(4L, 1, 40L, "signup"), row(4L, 2, 41L, "purchase"),
      row(4L, 3, 42L, "signup"), row(4L, 4, 43L, "view"),
      row(4L, 5, 44L, "purchase"), row(4L, 6, 45L, "error"),
      // u5: purchase > view > signup                      → armed at 3, no
      // purchase after: NO match (idle purchases never count)
      row(5L, 1, 50L, "purchase"), row(5L, 2, 51L, "view"), row(5L, 3, 52L, "signup"),
      // u6: two matches separated by error                → n=2, total 5, max 3
      row(6L, 1, 60L, "signup"), row(6L, 2, 61L, "view"), row(6L, 3, 62L, "purchase"),
      row(6L, 4, 63L, "error"), row(6L, 5, 64L, "signup"), row(6L, 6, 65L, "purchase"),
      // u7: signup > signup > purchase                    → LEFTMOST start
      // wins: one match from the FIRST signup, len 3
      row(7L, 1, 70L, "signup"), row(7L, 2, 71L, "signup"), row(7L, 3, 72L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.skipPastLastRowPatterns(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((1L, 3L, 3L)),
      2L -> ((1L, 5L, 5L)),
      4L -> ((1L, 5L, 5L)),
      6L -> ((2L, 5L, 3L)),
      7L -> ((1L, 3L, 3L)),
    ), s"got $out")
  }

  /** ep04's semantics owner, in memory: one forward pass, arm at the first
    * idle signup, purchases record their position, a non-W token or
    * end-of-session commits [armed..lastPurchase] when a purchase was seen.
    * Written independently of both the Spark regex and the DuckDB CTE —
    * the third formulation in the cross-check triangle.
    */
  private def skipPastLastAutomaton(seq: Seq[String]): (Long, Long, Long) = {
    val W = Set("view", "click", "purchase", "signup")
    var armed = 0; var lastc = 0
    var n = 0L; var tot = 0L; var mx = 0L
    def commit(): Unit = if (armed > 0 && lastc > 0) {
      val len = (lastc - armed + 1).toLong
      n += 1; tot += len; mx = math.max(mx, len)
    }
    seq.zipWithIndex.foreach { case (t, i0) =>
      val pos = i0 + 1
      if (armed > 0) {
        if (t == "purchase") lastc = pos
        else if (!W.contains(t)) { commit(); armed = 0; lastc = 0 }
      } else if (t == "signup") { armed = pos; lastc = 0 }
    }
    commit()
    (n, tot, mx)
  }

  test("ep04 SKIP TO NEXT ROW would disagree — the gate really pins the skip mode") {
    // same single pass but restarting from match-start + 1 after each
    // match (overlapping matches allowed): on the u4 sequence the inner
    // signup yields a second, overlapping match
    def skipToNextRow(seq: Seq[String]): Long = {
      val W = Set("view", "click", "purchase", "signup")
      var n = 0L
      var start = 0
      while (start < seq.length) {
        if (seq(start) == "signup") {
          var lastc = 0
          var j = start + 1
          while (j < seq.length && W.contains(seq(j))) {
            if (seq(j) == "purchase") lastc = j
            j += 1
          }
          if (lastc > 0) n += 1
        }
        start += 1
      }
      n
    }
    val u4 = Seq("signup", "purchase", "signup", "view", "purchase", "error")
    assert(skipToNextRow(u4) == 2L)
    assert(skipPastLastAutomaton(u4)._1 == 1L,
      "past-last-row must see ONE match where to-next-row sees two")
  }

  test("ep04 agrees with an independent in-memory automaton on real events") {
    val events = graft.Tables.events(spark, sfSmoke)
    val got = EventAnalytics.skipPastLastRowPatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val raw = events.selectExpr("user_id", "CAST(ts AS DATE) AS day",
        "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    val want = raw.groupBy(e => (e._1, e._2)).flatMap { case (key, rows) =>
      val seq = rows.sortBy(e => (e._3.getTime, e._4)).map(_._5).toSeq
      val (n, tot, mx) = skipPastLastAutomaton(seq)
      if (n > 0) Some(key -> ((n, tot, mx))) else None
    }.toMap
    assert(want.nonEmpty, "no matching session at this SF — fixture too small")
    assert(got == want)
  }

  test("ep05 overlapping matches: every signup before the block's last purchase fires") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def row(u: Long, m: Int, id: Long, et: String) = (u, t(m), id, et)
    // the ep04 fixture verbatim — the pair (ep04, ep05) must agree on
    // u1/u2/u3/u5/u6 and differ EXACTLY on u4 and u7 (inner signups)
    val ev = Seq(
      row(1L, 1, 10L, "signup"), row(1L, 2, 11L, "view"), row(1L, 3, 12L, "purchase"),
      row(2L, 1, 20L, "signup"), row(2L, 2, 21L, "view"), row(2L, 3, 22L, "purchase"),
      row(2L, 4, 23L, "view"), row(2L, 5, 24L, "purchase"),
      row(3L, 1, 30L, "signup"), row(3L, 2, 31L, "view"),
      row(3L, 3, 32L, "error"), row(3L, 4, 33L, "purchase"),
      row(4L, 1, 40L, "signup"), row(4L, 2, 41L, "purchase"),
      row(4L, 3, 42L, "signup"), row(4L, 4, 43L, "view"),
      row(4L, 5, 44L, "purchase"), row(4L, 6, 45L, "error"),
      row(5L, 1, 50L, "purchase"), row(5L, 2, 51L, "view"), row(5L, 3, 52L, "signup"),
      row(6L, 1, 60L, "signup"), row(6L, 2, 61L, "view"), row(6L, 3, 62L, "purchase"),
      row(6L, 4, 63L, "error"), row(6L, 5, 64L, "signup"), row(6L, 6, 65L, "purchase"),
      row(7L, 1, 70L, "signup"), row(7L, 2, 71L, "signup"), row(7L, 3, 72L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.skipToNextRowPatterns(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((1L, 3L, 3L)),
      2L -> ((1L, 5L, 5L)), // one signup: greedy still closes at the LAST purchase
      4L -> ((2L, 8L, 5L)), // inner signup fires its own overlapping match [3..5]
      6L -> ((2L, 5L, 3L)),
      7L -> ((2L, 5L, 3L)), // both signups match: [1..3] and [2..3]
    ), s"got $out")
  }

  test("ep05 agrees with an independent in-memory scanner on real events") {
    val events = graft.Tables.events(spark, sfSmoke)
    val got = EventAnalytics.skipToNextRowPatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val W = Set("view", "click", "purchase", "signup")
    val raw = events.selectExpr("user_id", "CAST(ts AS DATE) AS day",
        "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    val want = raw.groupBy(e => (e._1, e._2)).flatMap { case (key, rows) =>
      val seq = rows.sortBy(e => (e._3.getTime, e._4)).map(_._5).toIndexedSeq
      // per signup s: scan its W-run for the last purchase after s
      val lens = seq.indices.filter(seq(_) == "signup").flatMap { s =>
        var j = s + 1; var lastp = -1
        while (j < seq.length && W.contains(seq(j))) {
          if (seq(j) == "purchase") lastp = j
          j += 1
        }
        if (lastp > s) Some((lastp - s + 1).toLong) else None
      }
      if (lens.nonEmpty) Some(key -> ((lens.size.toLong, lens.sum, lens.max)))
      else None
    }.toMap
    assert(want.nonEmpty, "no matching session at this SF — fixture too small")
    assert(got == want)
  }

  test("ep04/ep05 algebra on real events: same sessions, equal max, to-next-row dominates") {
    // The two skip modes are provably related per session:
    //  - SAME matching-session set: a past-last-row match's opener is a
    //    signup before its block's last purchase, which fires in
    //    to-next-row too; conversely any to-next-row match implies such a
    //    signup exists, and the past-last-row scan must commit at least
    //    one match in that block;
    //  - EQUAL max_len: each block's longest match in BOTH modes runs
    //    from the block's first armed signup to its last purchase;
    //  - DOMINANCE: past-last-row matches are a subset of to-next-row's,
    //    so n_matches and total_len can only grow.
    // A violation of any of these means one side's semantics drifted.
    val events = graft.Tables.events(spark, sfSmoke)
    val past = EventAnalytics.skipPastLastRowPatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val next = EventAnalytics.skipToNextRowPatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(past.nonEmpty)
    assert(past.keySet == next.keySet,
      s"session sets differ: only-past=${past.keySet -- next.keySet} " +
        s"only-next=${next.keySet -- past.keySet}")
    past.foreach { case (key, (n4, tot4, max4)) =>
      val (n5, tot5, max5) = next(key)
      assert(max4 == max5, s"$key: max_len $max4 vs $max5")
      assert(n4 <= n5 && tot4 <= tot5, s"$key: ($n4,$tot4) !<= ($n5,$tot5)")
    }
  }

  test("ep02 agrees with an independent in-memory automaton on real events") {
    val events = graft.Tables.events(spark, sfSmoke)
    val got = EventAnalytics.variablePatterns(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute-force automaton over the raw rows (mirrors the DuckDB
    // recursive-CTE oracle, written independently in Scala)
    val raw = events.selectExpr("user_id", "CAST(ts AS DATE) AS day",
        "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    val want = raw.groupBy(e => (e._1, e._2)).flatMap { case (key, rows) =>
      val seq = rows.sortBy(e => (e._3.getTime, e._4)).map(_._5)
      var s = 0; var b = 0L; var n = 0L; var tot = 0L; var mx = 0L
      seq.foreach {
        case "signup" => s = 1; b = 0
        case t if s == 1 && (t == "view" || t == "click") => b += 1
        case "purchase" if s == 1 && b >= 1 =>
          n += 1; tot += b; mx = math.max(mx, b); s = 0; b = 0
        case _ => s = 0; b = 0
      }
      if (n > 0) Some(key -> ((n, tot, mx))) else None
    }.toMap
    assert(want.nonEmpty, "no matching session at this SF — fixture too small")
    assert(got == want)
  }
}
