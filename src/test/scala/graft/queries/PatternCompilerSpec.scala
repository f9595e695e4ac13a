package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The pattern compiler against the bespoke ep family: each hand-written
  * query re-expressed through its spec must be IDENTICAL (after mapping
  * the originals' run-length metrics to the compiler's uniform
  * matched-rows metric), on real events and on the crafted fixtures that
  * pin the tricky semantics (greedy absorption, skip-mode divergence,
  * quantifier bounds, restart rules).
  */
class PatternCompilerSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import PatternCompiler._

  private def eventsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    // one user, one day; ts strictly increasing so (ts, event_id) ordering
    // equals the given sequence order
    rows.zipWithIndex.map { case ((uid, tpe), i) =>
      (uid, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, tpe)
    }.toDF("user_id", "ts", "event_id", "event_type")
  }

  private def rowsOf(df: DataFrame): Seq[(Long, String, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

  test("compiled ep02 == bespoke ep02 on sf0.001 (run-length metric mapped)") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val bespoke = EventAnalytics.variablePatterns(ev)
      .select(col("user_id"), col("day"), col("n_matches"),
        // matched rows = b-run + opener + closer per match
        (col("total_b") + col("n_matches") * 2).as("total_len"),
        (col("max_b") + 2).as("max_len"))
    val compiled = compile(ep02Spec)(ev)
    assert(compiled.collect().toSeq == bespoke.collect().toSeq)
    assert(compiled.count() > 0, "fixture SF produced no ep02 matches")
  }

  test("compiled ep03 == bespoke ep03 on sf0.001 (openerless length mapped)") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val bespoke = EventAnalytics.boundedRepetitionPatterns(ev)
      .select(col("user_id"), col("day"), col("n_matches"), col("max_run"))
    val compiled = compile(ep03Spec)(ev)
      .select(col("user_id"), col("day"), col("n_matches"),
        (col("max_len") - 1).as("max_run"))
    assert(compiled.collect().toSeq == bespoke.collect().toSeq)
  }

  test("compiled ep04 == bespoke ep04 on sf0.001 (same metric)") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val bespoke = EventAnalytics.skipPastLastRowPatterns(ev)
    val compiled = compile(ep04Spec)(ev)
    assert(compiled.collect().toSeq == bespoke.collect().toSeq)
    assert(compiled.count() > 0, "fixture SF produced no ep04 matches")
  }

  test("compiled ep05 == bespoke ep05 on sf0.001 (same metric)") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val bespoke = EventAnalytics.skipToNextRowPatterns(ev)
    val compiled = compile(ep05Spec)(ev)
    assert(compiled.collect().toSeq == bespoke.collect().toSeq)
  }

  test("skip-mode divergence fixture: PAST LAST ROW 1 match, TO NEXT ROW 2") {
    // signup view signup view purchase error — the inner signup is a real
    // alternative start: to-next-row matches both signups, past-last-row
    // commits once at the purchase (the ep04/ep05 distinguisher)
    val ev = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "signup",
      1L -> "view", 1L -> "purchase", 1L -> "error"))
    assert(rowsOf(compile(ep04Spec)(ev)) ==
      Seq((1L, "2024-01-01", 1L, 5L, 5L)))
    assert(rowsOf(compile(ep05Spec)(ev)) ==
      Seq((1L, "2024-01-01", 2L, 8L, 5L)))
  }

  test("greedy absorption: the match closes at the LAST purchase of the run") {
    // signup purchase view purchase error: one match spanning to the
    // second purchase (4 rows), not the first (2)
    val ev = eventsOf(Seq(1L -> "signup", 1L -> "purchase", 1L -> "view",
      1L -> "purchase", 1L -> "error"))
    assert(rowsOf(compile(ep04Spec)(ev)) ==
      Seq((1L, "2024-01-01", 1L, 4L, 4L)))
  }

  test("ep06 quantifier bound: signup needs >= 2 W tokens before the closer") {
    // block: signup view purchase  → run 1 < 2: excluded under ep06
    //        signup view click purchase → run 2: matches, len 4
    val short = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "purchase"))
    assert(rowsOf(compile(ep06Spec)(short)).isEmpty)
    val ok = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "click",
      1L -> "purchase"))
    assert(rowsOf(compile(ep06Spec)(ok)) == Seq((1L, "2024-01-01", 1L, 4L, 4L)))
    // and under TO NEXT ROW the bound applies per signup: the inner signup
    // (1 W token to the purchase) is excluded while the outer matches
    val mixed = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "signup",
      1L -> "view", 1L -> "purchase"))
    assert(rowsOf(compile(ep06Spec)(mixed)) == Seq((1L, "2024-01-01", 1L, 5L, 5L)))
    // ep05 (no bound) sees both
    assert(rowsOf(compile(ep05Spec)(mixed)) == Seq((1L, "2024-01-01", 2L, 8L, 5L)))
  }

  test("disjoint-class restart rule: a mid-run opener restarts the match") {
    // signup view signup view purchase: ep02 semantics — the second signup
    // restarts, so ONE match of run length 1 (rows 3): matches the bespoke
    // regex (leftmost match consumes >signup>view> then fails at signup,
    // scan resumes and finds the second signup's match)
    val ev = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "signup",
      1L -> "view", 1L -> "purchase"))
    val bespoke = EventAnalytics.variablePatterns(ev)
      .select(col("user_id"), col("day"), col("n_matches"),
        (col("total_b") + col("n_matches") * 2).as("total_len"),
        (col("max_b") + 2).as("max_len"))
    val compiled = compile(ep02Spec)(ev)
    assert(compiled.collect().toSeq == bespoke.collect().toSeq)
    assert(rowsOf(compiled) == Seq((1L, "2024-01-01", 1L, 3L, 3L)))
  }

  test("end-of-session commit: overlapping class flushes the pending match") {
    val ev = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "purchase"))
    assert(rowsOf(compile(ep04Spec)(ev)) == Seq((1L, "2024-01-01", 1L, 3L, 3L)))
  }

  test("generated oracles carry the spec's alphabet and bounds") {
    // cheap structural pins so a spec edit can't silently leave the
    // oracle on the old pattern
    assert(oracle(ep06Spec).contains("lastp - 3"))
    assert(oracle(ep03Spec).contains("w.b >= 2"))
    assert(oracle(ep02Spec).contains("'signup'"))
    assert(oracle(ep04Spec).contains("'purchase'"))
    assert(oracle(ep08Spec).contains("w.b <= 3"))
    assert(oracle(ep08Spec).contains("w.b + 1 <= 3"))
  }

  test("ep08 bounded quantifier: overflow disarms until the next opener") {
    // A W W W W P — four run tokens exceed {1,3}: the attempt dies at the
    // 4th W (leftmost backtracking also fails: every split of the run
    // leaves a W, not P, after the quantifier), so NO match. The session
    // then re-arms at a later signup and matches {1,3} normally.
    val dead = eventsOf(Seq(1L -> "signup", 1L -> "view", 1L -> "view",
      1L -> "click", 1L -> "view", 1L -> "purchase"))
    assert(rowsOf(compile(ep08Spec)(dead)).isEmpty)
    // exactly at the bound: A W W W P matches, len = 5 matched rows
    val atBound = eventsOf(Seq(2L -> "signup", 2L -> "view", 2L -> "click",
      2L -> "view", 2L -> "purchase"))
    assert(rowsOf(compile(ep08Spec)(atBound)) == Seq((2L, "2024-01-01", 1L, 5L, 5L)))
    // overflow then a fresh opener recovers: A W W W W A W P → one match
    // from the SECOND signup (len 3: signup view purchase... run len 1)
    val recover = eventsOf(Seq(3L -> "signup", 3L -> "view", 3L -> "view",
      3L -> "click", 3L -> "view", 3L -> "signup", 3L -> "view",
      3L -> "purchase"))
    assert(rowsOf(compile(ep08Spec)(recover)) == Seq((3L, "2024-01-01", 1L, 3L, 3L)))
    // a mid-run opener restarts even under the bound (the ep02 rule)
    val restart = eventsOf(Seq(4L -> "signup", 4L -> "view", 4L -> "signup",
      4L -> "view", 4L -> "purchase"))
    assert(rowsOf(compile(ep08Spec)(restart)) == Seq((4L, "2024-01-01", 1L, 3L, 3L)))
    // a short run under minRun still breaks: A P alone is no match
    val short = eventsOf(Seq(5L -> "signup", 5L -> "purchase"))
    assert(rowsOf(compile(ep08Spec)(short)).isEmpty)
  }

  test("maxRun is rejected outside the disjoint SKIP PAST LAST ROW class") {
    intercept[IllegalArgumentException] {
      PatternSpec(Some("signup"), Set("view", "click", "purchase", "signup"),
        0, "purchase", maxRun = Some(4))
    }
    intercept[IllegalArgumentException] {
      PatternSpec(Some("signup"), Set("view"), 3, "purchase", maxRun = Some(2))
    }
    // the openerless bounded form is legal — it compiles to the
    // sliding-start saturating semantics (ep09), not a rejection
    PatternSpec(None, Set("error"), 2, "purchase", maxRun = Some(4))
  }

  test("ep09 sliding bound: a long run still matches its last <= n tokens") {
    // E E E P under (error){1,2}: leftmost attempt that fits starts at
    // the 3rd error — one match of len 3 (2 errors + closer), NOT a dead
    // session (the anchored-overflow rule would wrongly kill it)
    val long = eventsOf(Seq(1L -> "error", 1L -> "error", 1L -> "error",
      1L -> "purchase"))
    assert(rowsOf(compile(ep09Spec)(long)) == Seq((1L, "2024-01-01", 1L, 3L, 3L)))
    // a minimal run matches at its real length
    val short = eventsOf(Seq(2L -> "error", 2L -> "purchase"))
    assert(rowsOf(compile(ep09Spec)(short)) == Seq((2L, "2024-01-01", 1L, 2L, 2L)))
    // SKIP PAST LAST ROW: the committed match consumes its rows; a later
    // burst re-matches independently
    val twice = eventsOf(Seq(3L -> "error", 3L -> "error", 3L -> "error",
      3L -> "purchase", 3L -> "error", 3L -> "purchase"))
    assert(rowsOf(compile(ep09Spec)(twice)) == Seq((3L, "2024-01-01", 2L, 5L, 3L)))
    // a closer with no preceding run does not match
    val bare = eventsOf(Seq(4L -> "purchase", 4L -> "error"))
    assert(rowsOf(compile(ep09Spec)(bare)).isEmpty)
    // under minRun 2 with cap 4: E E E E E P matches len 5 (last 4 + P)
    val m2 = PatternSpec(None, Set("error"), 2, "purchase", maxRun = Some(4))
    val five = eventsOf(Seq(5L -> "error", 5L -> "error", 5L -> "error",
      5L -> "error", 5L -> "error", 5L -> "purchase"))
    assert(rowsOf(compile(m2)(five)) == Seq((5L, "2024-01-01", 1L, 5L, 5L)))
  }
}
