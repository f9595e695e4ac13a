package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the `events` stream table: cohort
  * retention and funnel conversion — the two workhorse queries of every
  * event-warehouse serving layer (the reference's Grafana layer asks the
  * same shape of question of its weekly panels: "of the users who arrived
  * in week W, how many were still active k weeks later?").
  *
  * Both are exact integer analytics (counts of distinct users), so they
  * hash-match the DuckDB oracle with no decimal machinery.
  */
object EventAnalytics {

  /** q51 — weekly cohort retention. A user's cohort is the Monday-aligned
    * week of their FIRST event; the cell (cohort_week, week_offset) counts
    * distinct users of that cohort active in cohort_week + offset.
    *
    * Scale shape: both aggregations key on user_id first — the raw event
    * scan collapses to one row per (user, week) map-side before anything
    * wide runs, so the shuffled volume is active-user-weeks, not events.
    * The cohort join is user_id ⋈ user_id on two already-aggregated
    * relations of identical partitioning (one exchange each, reused), and
    * the final rollup is cohorts × offsets — tiny. No window over the raw
    * stream, no per-event state.
    */
  def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weeks = Tables.events(s, dir)
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("week"))
      .distinct() // one row per (user, active-week): the retention grain
    val cohorts = weeks.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weeks
      .join(cohorts, Seq("user_id"))
      .select(
        $"cohort_week",
        (datediff($"week", $"cohort_week") / 7).cast("int").as("week_offset"),
        $"user_id")
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .select(
        date_format($"cohort_week", "yyyy-MM-dd").as("cohort_week"),
        $"week_offset", $"n_users")
      .orderBy($"cohort_week", $"week_offset")
  }

  val q51Oracle: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
      |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
      |  COUNT(DISTINCT w.user_id) AS n_users
      |FROM weeks w JOIN cohorts USING (user_id)
      |GROUP BY cohorts.cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** q52 — strict-order funnel: view → click → purchase. Step k counts the
    * users with a step-k event STRICTLY AFTER their earliest step-(k−1)
    * completion time (the standard "did they progress" semantics; an
    * unordered intersect would count a purchase that preceded the view).
    *
    * Scale shape: each step is filter → per-user min — partial-aggregated
    * map-side to one row per user before its exchange — then a join against
    * the previous step's (already per-user) result on the same key, so
    * every stage is user-cardinality, not event-cardinality, and the
    * surviving set only shrinks step over step. Step counts are single-row
    * aggregates unioned at the end; nothing wide survives the funnel.
    *
    * Timestamps are compared at microsecond precision in both engines (the
    * oracle casts the parquet nanos down) so "strictly after" agrees
    * bit-for-bit.
    */
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.filter($"event_type" === "click")
      .join(s1, Seq("user_id")).filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase")
      .join(s2, Seq("user_id")).filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    def step(label: String, users: DataFrame): DataFrame =
      users.agg(count(lit(1)).as("n_users")).select(lit(label).as("step"), $"n_users")
    step("1_view", s1)
      .unionByName(step("2_click", s2))
      .unionByName(step("3_purchase", s3))
      .orderBy($"step")
  }

  val q52Oracle: String =
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, MIN(ts) AS t2 FROM ev JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ts > t1 GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, MIN(ts) AS t3 FROM ev JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY ev.user_id)
      |SELECT step, n_users FROM (
      |  SELECT '1_view' AS step, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
      |ORDER BY step""".stripMargin

  /** q58 — top event paths: the ten most common 3-step event-type
    * sequences across user timelines (path/sequence mining — "what do
    * users actually do next" — the navigation-analysis workhorse next to
    * q52's fixed funnel).
    *
    * Scale shape: one window pass per user ordered by (ts, event_id) —
    * event_id breaks timestamp ties so the sequence is total-ordered and
    * engine-independent — then a path-cardinality groupBy whose partial
    * agg collapses map-side, then TakeOrderedAndProject for the top ten.
    * Shuffled volume after the window is distinct-path counts, not
    * events. Null handling matches the oracle exactly: trailing windows
    * (fewer than 3 remaining events) are FILTERED, not concat_ws-skipped
    * — Spark's concat_ws drops nulls silently, DuckDB's || propagates
    * them; filtering makes both engines drop the same rows.
    */
  def q58(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e3".isNotNull)
      .select(concat($"event_type", lit(" > "), $"e2", lit(" > "), $"e3")
        .as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(10)
  }

  val q58Oracle: String =
    """WITH ev AS (SELECT user_id, event_id, event_type,
      |              CAST(ts AS TIMESTAMP) AS ts FROM events),
      |tri AS (
      |  SELECT event_type || ' > ' || LEAD(event_type, 1) OVER w
      |           || ' > ' || LEAD(event_type, 2) OVER w AS path
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT path, COUNT(*) AS n FROM tri WHERE path IS NOT NULL
      |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Session gap: events of one user more than 30 minutes apart start a
    * new session. Compared in exact integer MICROSECONDS in both engines.
    */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** q59 — batch sessionization (gaps-and-islands): each user's event
    * stream split into sessions at >30-minute silences, one output row per
    * session with start/end/duration/event stats. The batch complement of
    * st02/st08's streaming session windows — this is how historical
    * backfills and training-data session features are computed.
    *
    * Scale shape: the classic two-window gaps-and-islands needs ONE
    * exchange total. Both windows and the final per-session aggregation
    * key on user_id first, so after the single hash exchange on user_id
    * the lag pass, the running-sum pass, and the groupBy(user_id,
    * session_idx) — whose clustering requirement HashPartitioning(user_id)
    * already satisfies — all run partition-local. Per-user state is one
    * sort buffer; nothing global, nothing driver-side.
    *
    * All outputs are BIGINT (epoch micros, counts) — no timestamp or
    * float representation to disagree on.
    */
  def q59(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_s",
        when($"prev_us".isNull || $"us" - $"prev_us" > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_s").over(run))
      .groupBy($"user_id", $"session_idx")
      .agg(
        min($"us").as("start_us"),
        max($"us").as("end_us"),
        (max($"us") - min($"us")).as("duration_us"),
        count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"))
      .orderBy($"user_id", $"session_idx")
  }

  val q59Oracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN us - LAG(us, 1) OVER w IS NULL
       |                   OR us - LAG(us, 1) OVER w > $SessionGapUs
       |                 THEN 1 ELSE 0 END AS new_s
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sessions AS (
       |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx, MIN(us) AS start_us, MAX(us) AS end_us,
       |  MAX(us) - MIN(us) AS duration_us, COUNT(*) AS n_events,
       |  COUNT(DISTINCT event_type) AS n_types
       |FROM sessions GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** ep01 — SESSION-SEQUENCE PATTERN MATCHING (the MATCH_RECOGNIZE use
    * case, q58's fixed trigrams generalized to whole-session order
    * predicates): per (user, calendar-day) session, the full event-type
    * sequence is materialized ONCE as an ordered '>'-joined string, and
    * each pattern is a pure expression over FIRST-OCCURRENCE POSITIONS —
    *  - signup_then_purchase: a signup strictly before the first purchase,
    *  - clean_purchase: a purchase with no error anywhere before it,
    *  - bounce: single-event sessions.
    * Position arithmetic (`instr`) instead of regex is deliberate: the
    * "no X before Y" class needs lookahead in regex form, which RE2-family
    * engines (and thus the oracle) reject — positions express it exactly
    * and identically in both engines. Probes search DELIMITED tokens
    * (`instr('>'||seq||'>', '>'||type||'>')`), not raw substrings, so an
    * event type that contains another as a substring (e.g. 'signup_failed'
    * vs 'signup') can never mis-position a first occurrence.
    *
    * Scale shape: one fact-scale exchange (the session groupBy); sequence
    * strings are session-sized, never corpus-sized; all three pattern
    * counts come from a SINGLE aggregate over the session relation
    * (three count(when(..)) measures unpivoted to rows), so one pass is
    * guaranteed by construction rather than by hoping ReusedExchange
    * kicks in for three union branches. The ordering inside a session is
    * the deterministic (ts, event_id) total order, built by sort_array
    * over the collected struct — no window, no second shuffle.
    */
  def ep01(s: SparkSession, dir: String): DataFrame =
    sessionPatterns(Tables.events(s, dir))

  /** Per-(user, calendar-day) session sequence: event types joined with
    * '>' in the deterministic (ts, event_id) total order — the shared
    * substrate of ep01's position predicates and ep02's variable-length
    * quantifier matching. One fact-scale exchange (the session groupBy);
    * sequence strings are session-sized, never corpus-sized.
    */
  private def sessionSeqs(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))),
          e => e.getField("event_type")),
        ">").as("seq"))
  }

  /** ep01 over any (user_id, ts, event_id, event_type) relation. */
  def sessionPatterns(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val sessions = sessionSeqs(events)
    val wrapped = concat(lit(">"), $"seq", lit(">"))
    def pos(eventType: String) = instr(wrapped, ">" + eventType + ">")
    val pSignup = pos("signup")
    val pPurchase = pos("purchase")
    val pError = pos("error")
    val patterns = Seq(
      ("bounce", instr($"seq", ">") === 0),
      ("clean_purchase", pPurchase > 0 && (pError === 0 || pError > pPurchase)),
      ("signup_then_purchase", pSignup > 0 && pPurchase > pSignup),
    )
    sessions
      .agg(
        patterns.head match { case (n, c) => count(when(c, 1)).as(n) },
        patterns.tail.map { case (n, c) => count(when(c, 1)).as(n) }: _*)
      .select(explode(array(patterns.map { case (n, _) =>
        struct(lit(n).as("pattern"), col(n).as("n_sessions"))
      }: _*)).as("r"))
      .select($"r.pattern", $"r.n_sessions")
      .orderBy($"pattern")
  }

  val ep01Oracle: String =
    """WITH s AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT seq, '>' || seq || '>' AS wseq FROM s)
      |SELECT pattern, n_sessions FROM (
      |  SELECT 'bounce' AS pattern,
      |    COUNT(CASE WHEN strpos(seq, '>') = 0 THEN 1 END) AS n_sessions FROM w
      |  UNION ALL
      |  SELECT 'clean_purchase',
      |    COUNT(CASE WHEN strpos(wseq, '>purchase>') > 0
      |               AND (strpos(wseq, '>error>') = 0
      |                    OR strpos(wseq, '>error>') > strpos(wseq, '>purchase>'))
      |          THEN 1 END) FROM w
      |  UNION ALL
      |  SELECT 'signup_then_purchase',
      |    COUNT(CASE WHEN strpos(wseq, '>signup>') > 0
      |               AND strpos(wseq, '>purchase>') > strpos(wseq, '>signup>')
      |          THEN 1 END) FROM w)
      |ORDER BY pattern""".stripMargin

  /** ep02 — VARIABLE-LENGTH EVENT PATTERN MATCHING (MATCH_RECOGNIZE's
    * `PATTERN (A B+ C)` with a quantifier, beyond ep01's fixed-position
    * predicates): per session, count the non-overlapping greedy matches of
    * signup → (view|click)+ → purchase and report the total and maximum
    * B-run lengths. Matching sessions only.
    *
    * Determinism argument (why regex and automaton semantics coincide):
    * the B alphabet {view, click} is disjoint from C {purchase}, so for a
    * fixed match start the B-run is the MAXIMAL run of B-tokens after the
    * A — a shorter run would be followed by another B-token, never C.
    * Leftmost-first scanning with skip-past-last-row is then unambiguous,
    * which is what makes two INDEPENDENT formulations agree exactly:
    *  - Spark: `regexp_extract_all` over the delimited session string
    *    (`>signup((?:>(?:view|click))+)>purchase(?=>)` — the lookahead
    *    keeps the trailing delimiter unconsumed so back-to-back matches
    *    both fire; Java regex, Spark-side only);
    *  - oracle: a RECURSIVE-CTE automaton over the raw event rows (state
    *    idle/armed + run counter, one transition per event — no regex, no
    *    string materialization; DuckDB's RE2 couldn't express the
    *    lookahead anyway).
    * Cross-validated exhaustively at sf0.01: both formulations emit
    * identical (n_matches, total_b, max_b) for all matching sessions.
    *
    * Scale shape: ep01's — one session-grain exchange, per-session work
    * linear in session length, output bounded by matching sessions. The
    * oracle's recursion depth is the longest session, not the corpus.
    */
  def ep02(s: SparkSession, dir: String): DataFrame =
    variablePatterns(Tables.events(s, dir))

  /** ep02 over any (user_id, ts, event_id, event_type) relation. */
  def variablePatterns(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val bLen = (run: org.apache.spark.sql.Column) =>
      (size(split(run, ">")) - 1).cast("long")
    sessionSeqs(events)
      .select($"user_id",
        // ISO string, not DATE: the gate's comparator normalizes DATE and
        // TIMESTAMP columns differently between engines (F16 pattern)
        date_format($"day", "yyyy-MM-dd").as("day"),
        regexp_extract_all(
          concat(lit(">"), $"seq", lit(">")),
          lit(">signup((?:>(?:view|click))+)>purchase(?=>)"), lit(1)).as("runs"))
      .filter(size($"runs") > 0)
      .select($"user_id", $"day",
        size($"runs").cast("long").as("n_matches"),
        aggregate($"runs", lit(0L), (acc, r) => acc + bLen(r)).as("total_b"),
        array_max(transform($"runs", bLen)).as("max_b"))
      .orderBy($"user_id", $"day")
  }

  val ep02Oracle: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, day, 0 AS rn, 0 AS s, 0 AS b,
      |         CAST(0 AS BIGINT) AS n_matches, CAST(0 AS BIGINT) AS total_b,
      |         CAST(0 AS BIGINT) AS max_b
      |  FROM (SELECT DISTINCT user_id, day FROM ev)
      |  UNION ALL
      |  SELECT w.user_id, w.day, w.rn + 1,
      |    CASE WHEN e.event_type = 'signup' THEN 1
      |         WHEN w.s = 1 AND e.event_type IN ('view','click') THEN 1
      |         ELSE 0 END,
      |    CASE WHEN e.event_type = 'signup' THEN 0
      |         WHEN w.s = 1 AND e.event_type IN ('view','click') THEN w.b + 1
      |         ELSE 0 END,
      |    w.n_matches + CASE WHEN w.s = 1 AND w.b >= 1 AND e.event_type = 'purchase'
      |                       THEN 1 ELSE 0 END,
      |    w.total_b + CASE WHEN w.s = 1 AND w.b >= 1 AND e.event_type = 'purchase'
      |                     THEN w.b ELSE 0 END,
      |    CASE WHEN w.s = 1 AND w.b >= 1 AND e.event_type = 'purchase' AND w.b > w.max_b
      |         THEN w.b ELSE w.max_b END
      |  FROM walk w JOIN ev e
      |    ON e.user_id = w.user_id AND e.day = w.day AND e.rn = w.rn + 1)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_matches, total_b, max_b
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
      |                                   ORDER BY rn DESC) AS lastr
      |      FROM walk) t
      |WHERE lastr = 1 AND n_matches > 0
      |ORDER BY user_id, day""".stripMargin

  /** ep03 — BOUNDED-REPETITION quantifier (MATCH_RECOGNIZE `B{2,} C`):
    * per session, the "frustration conversion" — a run of AT LEAST TWO
    * consecutive errors immediately followed by a purchase. Completes the
    * quantifier spectrum across the family: ep01 fixed positions, ep02
    * one-or-more (`+`), ep03 bounded repetition (`{m,}`). Same
    * independent-formulation gate design as ep02 — the run alphabet
    * {error} excludes the closing event, so greedy-regex (leftmost start
    * captures the WHOLE consecutive run) and the automaton's run counter
    * provably coincide:
    *  - Spark: `regexp_extract_all` with `(?:>error){2,}` over the
    *    delimited session string;
    *  - oracle: the recursive-CTE automaton with a consecutive-run
    *    counter, one transition per event.
    * Reports non-overlapping match counts and the longest matched run.
    */
  def ep03(s: SparkSession, dir: String): DataFrame =
    boundedRepetitionPatterns(Tables.events(s, dir))

  /** ep03 over any (user_id, ts, event_id, event_type) relation. */
  def boundedRepetitionPatterns(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val runLen = (run: org.apache.spark.sql.Column) =>
      (size(split(run, ">")) - 1).cast("long")
    sessionSeqs(events)
      .select($"user_id",
        date_format($"day", "yyyy-MM-dd").as("day"),
        regexp_extract_all(
          concat(lit(">"), $"seq", lit(">")),
          lit("((?:>error){2,})>purchase(?=>)"), lit(1)).as("runs"))
      .filter(size($"runs") > 0)
      .select($"user_id", $"day",
        size($"runs").cast("long").as("n_matches"),
        array_max(transform($"runs", runLen)).as("max_run"))
      .orderBy($"user_id", $"day")
  }

  val ep03Oracle: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, day, 0 AS rn, 0 AS run,
      |         CAST(0 AS BIGINT) AS n_matches, CAST(0 AS BIGINT) AS max_run
      |  FROM (SELECT DISTINCT user_id, day FROM ev)
      |  UNION ALL
      |  SELECT w.user_id, w.day, w.rn + 1,
      |    CASE WHEN e.event_type = 'error' THEN w.run + 1 ELSE 0 END,
      |    w.n_matches + CASE WHEN e.event_type = 'purchase' AND w.run >= 2
      |                       THEN 1 ELSE 0 END,
      |    CASE WHEN e.event_type = 'purchase' AND w.run >= 2 AND w.run > w.max_run
      |         THEN w.run ELSE w.max_run END
      |  FROM walk w JOIN ev e
      |    ON e.user_id = w.user_id AND e.day = w.day AND e.rn = w.rn + 1)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_matches, max_run
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
      |                                   ORDER BY rn DESC) AS lastr
      |      FROM walk) t
      |WHERE lastr = 1 AND n_matches > 0
      |ORDER BY user_id, day""".stripMargin

  /** ep04 — OVERLAPPING-ALPHABET pattern with AFTER MATCH SKIP PAST LAST
    * ROW (the last MATCH_RECOGNIZE capability class after ep01–ep03):
    * `PATTERN (A W* P)` greedy, with A = signup, W = {view, click,
    * purchase, signup}, P = purchase — the run alphabet CONTAINS both the
    * closer and the opener, so ep01–ep03's disjointness argument (regex ≡
    * automaton because the quantified run can never consume the closer)
    * provably cannot apply. Two things change when alphabets overlap:
    *
    *  1. GREEDINESS becomes observable: the greedy `W*` absorbs
    *     intermediate purchases, so the match closes at the LAST purchase
    *     of the maximal W-run after the signup ("the whole shopping
    *     spree"), not the first — a lazy `W*?` would stop at the first.
    *  2. SKIP MODE becomes observable: signups inside a match's span are
    *     real alternative starts, so AFTER MATCH SKIP PAST LAST ROW
    *     (resume after the matched purchase — non-overlapping matches,
    *     this operator's contract, and what a regex `find()` scan does)
    *     genuinely differs from SKIP TO NEXT ROW (re-scan from
    *     match-start + 1, yielding overlapping matches). The spec pins a
    *     sequence where the two modes disagree.
    *
    * The AUTOMATON is the semantics owner (one forward pass per session,
    * state = (armed, lastPurchasePos)): arm at the first signup when
    * idle; while armed, every W token extends the run and each purchase
    * records its position; a non-W token (error) or end-of-session
    * commits [armed .. lastPurchase] if a purchase was seen, else
    * nothing, and disarms. The REGEX side is derived from it rather than
    * assumed equivalent; the equivalence argument (spec-cross-checked,
    * and exercised against real events at two SFs by the gate):
    *  - for a fixed armed position, leftmost-greedy backtracking places
    *    the closer exactly at the last purchase of the maximal W-run —
    *    the automaton's lastPurchase;
    *  - failed starts agree: if the run after a signup holds no
    *    purchase, no later signup INSIDE that run can succeed either (a
    *    purchase after it would have been a purchase in the run);
    *  - skip-past-last-row agrees with the single pass: a second match
    *    cannot hide between lastPurchase and the break, because its
    *    closer would itself have updated lastPurchase. So committing at
    *    the break and resuming the same linear scan is exact.
    * The DuckDB oracle is the same automaton as a recursive CTE (one
    * transition per event; RE2 could not run the regex form anyway — the
    * delimiter lookahead alone rules it out), so the gate compares two
    * INDEPENDENT formulations, neither copied from the other.
    *
    * Reports per matching session: match count, total matched rows, and
    * the longest match (rows). Scale shape: ep01's — one session-grain
    * exchange; regex work is per-session and bounded by run length (the
    * backtrack scan retries the closer once per run token), never
    * corpus-sized; the oracle's recursion depth is the longest session.
    */
  def ep04(s: SparkSession, dir: String): DataFrame =
    skipPastLastRowPatterns(Tables.events(s, dir))

  /** ep04 over any (user_id, ts, event_id, event_type) relation. */
  def skipPastLastRowPatterns(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    // group 1 = the W* run ('>tok' per token); matched rows = tokens + 2
    // (the signup and the closing purchase), and size(split(run, ">")) is
    // tokens + 1 (leading empty fragment), so rows = size + 1
    val matchLen = (run: org.apache.spark.sql.Column) =>
      (size(split(run, ">")) + 1).cast("long")
    sessionSeqs(events)
      .select($"user_id",
        date_format($"day", "yyyy-MM-dd").as("day"),
        regexp_extract_all(
          concat(lit(">"), $"seq", lit(">")),
          lit(">signup((?:>(?:view|click|purchase|signup))*)>purchase(?=>)"),
          lit(1)).as("runs"))
      .filter(size($"runs") > 0)
      .select($"user_id", $"day",
        size($"runs").cast("long").as("n_matches"),
        aggregate($"runs", lit(0L), (acc, r) => acc + matchLen(r)).as("total_len"),
        array_max(transform($"runs", matchLen)).as("max_len"))
      .orderBy($"user_id", $"day")
  }

  val ep04Oracle: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, day, 0 AS rn, 0 AS armed, 0 AS lastc,
      |         CAST(0 AS BIGINT) AS n_matches, CAST(0 AS BIGINT) AS total_len,
      |         CAST(0 AS BIGINT) AS max_len
      |  FROM (SELECT DISTINCT user_id, day FROM ev)
      |  UNION ALL
      |  SELECT w.user_id, w.day, w.rn + 1,
      |    CASE WHEN w.armed > 0
      |          AND e.event_type IN ('view','click','purchase','signup')
      |         THEN w.armed
      |         WHEN w.armed = 0 AND e.event_type = 'signup' THEN w.rn + 1
      |         ELSE 0 END,
      |    CASE WHEN w.armed > 0 AND e.event_type = 'purchase' THEN w.rn + 1
      |         WHEN w.armed > 0
      |          AND e.event_type IN ('view','click','signup')
      |         THEN w.lastc
      |         ELSE 0 END,
      |    w.n_matches + CASE WHEN w.armed > 0 AND w.lastc > 0
      |          AND e.event_type NOT IN ('view','click','purchase','signup')
      |         THEN 1 ELSE 0 END,
      |    w.total_len + CASE WHEN w.armed > 0 AND w.lastc > 0
      |          AND e.event_type NOT IN ('view','click','purchase','signup')
      |         THEN w.lastc - w.armed + 1 ELSE 0 END,
      |    CASE WHEN w.armed > 0 AND w.lastc > 0
      |          AND e.event_type NOT IN ('view','click','purchase','signup')
      |          AND w.lastc - w.armed + 1 > w.max_len
      |         THEN w.lastc - w.armed + 1 ELSE w.max_len END
      |  FROM walk w JOIN ev e
      |    ON e.user_id = w.user_id AND e.day = w.day AND e.rn = w.rn + 1)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  n_matches + CASE WHEN armed > 0 AND lastc > 0 THEN 1 ELSE 0 END
      |    AS n_matches,
      |  total_len + CASE WHEN armed > 0 AND lastc > 0
      |                   THEN lastc - armed + 1 ELSE 0 END AS total_len,
      |  CASE WHEN armed > 0 AND lastc > 0 AND lastc - armed + 1 > max_len
      |       THEN lastc - armed + 1 ELSE max_len END AS max_len
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
      |                                   ORDER BY rn DESC) AS lastr
      |      FROM walk) t
      |WHERE lastr = 1 AND (n_matches > 0 OR (armed > 0 AND lastc > 0))
      |ORDER BY user_id, day""".stripMargin

  /** ep05 — the SAME overlapping-alphabet pattern as ep04 under AFTER
    * MATCH SKIP TO NEXT ROW (overlapping matches allowed): every signup
    * whose W-run holds a later purchase is its own match, including
    * signups INSIDE another match's span. Completes the skip-mode pair —
    * ep04 gates PAST LAST ROW, ep05 gates TO NEXT ROW, and the spec pins
    * a sequence where their counts differ.
    *
    * The formulation flip is the point: skip-to-next-row is PURELY
    * RELATIONAL — split each session into maximal W-blocks at non-W
    * breaks (running sum of break flags), take each block's LAST purchase
    * position, and every signup before it matches with length
    * (lastPurchase − signupPos + 1); greedy still means every match in a
    * block closes at the block's last purchase. No regex, no automaton,
    * no recursion on EITHER side — Spark windows vs DuckDB windows, two
    * engines' window semantics checking each other (while ep04's
    * non-overlapping semantics genuinely needs the automaton/regex pair:
    * its commit positions depend on previous matches; to-next-row's
    * don't, which is exactly why it decomposes relationally).
    *
    * Scale shape: one session-grain exchange for the row-number/
    * running-sum windows; the block window's (user, day, block) keys are
    * a superset of the partitioning already in place, so no second
    * exchange; the final aggregate is match-cardinality. Per-event state
    * is O(1); nothing session-quadratic despite overlapping matches —
    * the lengths are closed-form per signup.
    */
  def ep05(s: SparkSession, dir: String): DataFrame =
    skipToNextRowPatterns(Tables.events(s, dir))

  /** ep05 over any (user_id, ts, event_id, event_type) relation. */
  def skipToNextRowPatterns(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = events.sparkSession
    import s.implicits._
    val wTypes = Seq("view", "click", "purchase", "signup")
    val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
    val pos = events
      .withColumn("day", to_date($"ts"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("brk", when(!$"event_type".isin(wTypes: _*), 1L).otherwise(0L))
      .withColumn("block",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val blocks = pos
      .filter($"brk" === 0)
      .withColumn("lastp",
        max(when($"event_type" === "purchase", $"rn"))
          .over(Window.partitionBy($"user_id", $"day", $"block")))
    blocks
      .filter($"event_type" === "signup" && $"lastp".isNotNull && $"rn" < $"lastp")
      // group on the RAW day and ISO-format after the agg: grouping on
      // date_format(day) would re-shuffle (Catalyst can't prove the
      // formatted key co-partitioned with the window's (user_id, day)
      // exchange); on (user_id, day) the aggregate reuses it — verified
      // one hash exchange in the plan
      .groupBy($"user_id", $"day")
      .agg(
        count(lit(1)).as("n_matches"),
        sum($"lastp" - $"rn" + lit(1L)).as("total_len"),
        max($"lastp" - $"rn" + lit(1L)).as("max_len"))
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_matches", $"total_len", $"max_len")
      .orderBy($"user_id", $"day")
  }

  val ep05Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    ROW_NUMBER() OVER w AS rn,
      |    CASE WHEN event_type NOT IN ('view','click','purchase','signup')
      |         THEN 1 ELSE 0 END AS brk,
      |    SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup')
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS block
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
      |               ORDER BY ts, event_id)),
      |b AS (
      |  SELECT *, MAX(CASE WHEN event_type = 'purchase' THEN rn END)
      |              OVER (PARTITION BY user_id, day, block) AS lastp
      |  FROM ev WHERE brk = 0)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  COUNT(*) AS n_matches,
      |  CAST(SUM(lastp - rn + 1) AS BIGINT) AS total_len,
      |  MAX(lastp - rn + 1) AS max_len
      |FROM b
      |WHERE event_type = 'signup' AND lastp IS NOT NULL AND rn < lastp
      |GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q51_cohort_retention", q51, Some(q51Oracle)),
    Q("q52_funnel_steps", q52, Some(q52Oracle)),
    Q("q58_event_paths", q58, Some(q58Oracle)),
    Q("ep01_pattern_match", ep01, Some(ep01Oracle)),
    Q("ep02_variable_pattern", ep02, Some(ep02Oracle)),
    Q("ep03_bounded_repetition", ep03, Some(ep03Oracle)),
    Q("ep04_skip_past_last_row", ep04, Some(ep04Oracle)),
    Q("ep05_skip_to_next_row", ep05, Some(ep05Oracle)),
    Q("q59_sessionize_batch", q59, Some(q59Oracle)),
  )
}
