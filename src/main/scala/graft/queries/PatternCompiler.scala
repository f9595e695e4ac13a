package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** MATCH_RECOGNIZE as an OPERATOR: a pattern spec → automaton compiler for
  * the `PATTERN (A? W{m,} P)` family over per-(user, day) sessions, with
  * the DuckDB oracle CTE generated FROM THE SAME SPEC. ep01–ep05
  * (EventAnalytics.scala) established the semantics classes as five
  * hand-written queries; this turns the family into one parameterized
  * operator (round-12 verdict #6) — PatternCompilerSpec proves the
  * compiled forms of ep02/ep03/ep04/ep05 identical to the bespoke
  * originals, and ep06 gates a pattern none of them covers (quantifier
  * {2,} × SKIP TO NEXT ROW × overlapping alphabet).
  *
  * Semantics (MATCH_RECOGNIZE greedy, leftmost):
  *  - `opener` (A): the arming event type; `None` arms at the first run
  *    token (ep03's `W{m,} P` shape).
  *  - `run` (W): the quantified alphabet; may CONTAIN the closer and/or
  *    opener (the overlapping class, where greediness and skip mode are
  *    observable — see ep04's scaladoc for the full argument).
  *  - `minRun`: quantifier lower bound (0 = `*`, 1 = `+`, m = `{m,}`).
  *  - `closer` (P): the committing event type.
  *  - skip mode: AFTER MATCH SKIP PAST LAST ROW (non-overlapping matches;
  *    the automaton path) or SKIP TO NEXT ROW (overlapping matches; the
  *    relational path — overlap decomposes into closed-form per-opener
  *    matches, ep05's insight, so no automaton is needed).
  *
  * Compilation targets:
  *  - PAST LAST ROW → a single forward pass per session, compiled to one
  *    Catalyst `aggregate` fold over the sorted token array: state
  *    (matchStart, lastCloser, n, total, max), one transition per token,
  *    O(1) per event. The same state machine ep02–ep04's recursive-CTE
  *    oracles walk — but here the SPARK side owns it, and the generated
  *    oracle CTE is derived from the same spec (two languages, one spec,
  *    two independent interpreters).
  *  - TO NEXT ROW → maximal W-blocks via a running break-sum window, each
  *    block's last closer position, and every armed opener before it with
  *    run length ≥ minRun matching at closed-form length (the ep05
  *    decomposition generalized with the quantifier bound).
  *
  * Scale shape: identical to the hand-written family — one session-grain
  * exchange (the groupBy/window on (user_id, day)); per-session work
  * linear in session length; output bounded by matching sessions; the
  * oracle's recursion depth is the longest session, never the corpus.
  *
  * Match length is uniformly MATCHED ROWS (opener + run + closer), so
  * every compiled pattern reports the same three measures
  * (n_matches, total_len, max_len) regardless of class.
  */
object PatternCompiler {

  /** One MATCH_RECOGNIZE-style pattern over session event types.
    *
    * `maxRun` is the quantifier UPPER bound (`{m,n}`), for the disjoint
    * class under SKIP PAST LAST ROW. The two anchoring cases compile to
    * DIFFERENT leftmost semantics, each provably MATCH_RECOGNIZE's:
    *  - opener-anchored (`A W{m,n} P`): "disarm when the run exceeds n,
    *    re-arm at the next opener" — with W ∌ closer and W ∌ opener there
    *    is never an alternative split of the run, so an attempt from an
    *    opener succeeds iff the tokens after it are exactly W^k·closer
    *    with m ≤ k ≤ n, and a failed attempt's next viable start row is
    *    the next opener (every W/closer-started attempt dies at its
    *    first token);
    *  - openerless (`W{m,n} P`): the start row SLIDES — attempts launch
    *    from every run row, so a run of b ≥ m tokens before a closer
    *    always matches, taking its LAST min(b, n) tokens (the attempt at
    *    closerPos − min(b, n) is the first that fits). Compiled as a
    *    saturating length: no overflow disarm, matched rows =
    *    min(b, n) + 1.
    */
  final case class PatternSpec(
      opener: Option[String],
      run: Set[String],
      minRun: Int,
      closer: String,
      skipToNextRow: Boolean = false,
      maxRun: Option[Int] = None) {
    require(minRun >= 0, "minRun must be ≥ 0")
    require(!opener.contains(closer), "opener == closer is unsupported")
    require(opener.isDefined || minRun >= 1,
      "openerless patterns need minRun ≥ 1 (the arming token is a run token)")
    // the disjoint class commits AT the closer; a run-alphabet opener
    // would make restart-vs-continue ambiguous there (ep02's restart rule)
    require(run.contains(closer) || opener.forall(o => !run.contains(o)),
      "disjoint-class patterns (closer ∉ run) require opener ∉ run")
    // to-next-row's closed-form decomposition needs the overlapping class:
    // with a disjoint alphabet the two skip modes coincide (see ep04 doc)
    require(!skipToNextRow || (run.contains(closer) && opener.exists(run.contains)),
      "SKIP TO NEXT ROW requires opener ∈ run and closer ∈ run")
    require(maxRun.forall(_ >= math.max(minRun, 1)), "maxRun must be ≥ max(minRun, 1)")
    require(maxRun.isEmpty || (!run.contains(closer) && !skipToNextRow),
      "bounded quantifiers ({m,n}) compile for the disjoint class " +
        "under SKIP PAST LAST ROW only (see scaladoc)")

    /** run tokens counted between matchStart and a position. */
    private[queries] def off: Int = if (opener.isDefined) 1 else 0
    private[queries] def overlapping: Boolean = run.contains(closer)
  }

  /** Per-session sorted token arrays — the compiler's input substrate
    * (the array form of EventAnalytics.sessionSeqs' strings).
    */
  private def sessionTokens(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(transform(
        sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))),
        e => e.getField("event_type")).as("toks"))
  }

  /** Compile a spec against any (user_id, ts, event_id, event_type)
    * relation: (user_id, day, n_matches, total_len, max_len), matching
    * sessions only, ordered.
    */
  def compile(spec: PatternSpec)(events: DataFrame): DataFrame =
    if (spec.skipToNextRow) compileToNextRow(spec, events)
    else compilePastLastRow(spec, events)

  // ---- PAST LAST ROW: the fold automaton ---------------------------------

  private def compilePastLastRow(spec: PatternSpec, events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    def isW(t: Column) = t.isin(spec.run.toSeq: _*)
    def isOpener(t: Column) =
      spec.opener.map(o => t === lit(o)).getOrElse(isW(t))
    val cl = lit(spec.closer)
    val minRun = lit(spec.minRun.toLong)
    val off = lit(spec.off.toLong)
    val init = struct(lit(0L).as("armed"), lit(0L).as("lastc"),
      lit(0L).as("nm"), lit(0L).as("tot"), lit(0L).as("mx"))
    def step(acc: Column, e: Column): Column = {
      val tok = e.getField("tok")
      val pos = e.getField("pos")
      val armed = acc.getField("armed")
      val lastc = acc.getField("lastc")
      val nm = acc.getField("nm")
      val tot = acc.getField("tot")
      val mx = acc.getField("mx")
      // the anchored bounded form enforces the upper bound at the closer;
      // the openerless bounded form never fails on length (sliding start —
      // it saturates the LENGTH instead, below)
      val runOk = spec.maxRun match {
        case Some(n) if spec.opener.isDefined =>
          pos - armed - off >= minRun && pos - armed - off <= lit(n.toLong)
        case _ => pos - armed - off >= minRun
      }
      if (spec.overlapping) {
        // run may contain closer/opener: track the last valid closer,
        // commit at the break (or end of session — the finish lambda)
        val breaking = armed > 0L && !isW(tok)
        val commit = breaking && lastc > 0L
        val len = lastc - armed + 1L
        val armedNext =
          when(armed > 0L && isW(tok), armed)
            .otherwise(when(isOpener(tok), pos).otherwise(0L))
        val lastcNext =
          when(armed > 0L && isW(tok),
            when(tok === cl && runOk, pos).otherwise(lastc))
            .otherwise(0L)
        struct(armedNext.as("armed"), lastcNext.as("lastc"),
          when(commit, nm + 1L).otherwise(nm).as("nm"),
          when(commit, tot + len).otherwise(tot).as("tot"),
          when(commit && len > mx, len).otherwise(mx).as("mx"))
      } else {
        // disjoint class: the closer cannot extend the run, so a valid
        // closer commits immediately (and a short-run closer breaks);
        // an opener token always (re)arms — ep02's restart rule. With an
        // upper bound, a run token that would push the count past maxRun
        // DISARMS (the attempt is dead; the next viable start is the next
        // opener — see the PatternSpec scaladoc for why this is exactly
        // leftmost backtracking-greedy here)
        val commit = armed > 0L && tok === cl && runOk
        val len = spec.maxRun match {
          // openerless bounded: leftmost takes the run's LAST ≤ n tokens
          case Some(n) if spec.opener.isEmpty =>
            least(pos - armed, lit(n.toLong)) + 1L
          case _ => pos - armed + 1L
        }
        val runKeeps = spec.maxRun match {
          case Some(n) if spec.opener.isDefined =>
            isW(tok) && pos - armed + 1L - off <= lit(n.toLong)
          case _ => isW(tok)
        }
        val armedNext =
          when(commit, 0L)
            .when(armed > 0L && runKeeps, armed)
            .otherwise(when(isOpener(tok), pos).otherwise(0L))
        struct(armedNext.as("armed"), lit(0L).as("lastc"),
          when(commit, nm + 1L).otherwise(nm).as("nm"),
          when(commit, tot + len).otherwise(tot).as("tot"),
          when(commit && len > mx, len).otherwise(mx).as("mx"))
      }
    }
    def finish(acc: Column): Column =
      if (!spec.overlapping)
        struct(acc.getField("nm").as("nm"), acc.getField("tot").as("tot"),
          acc.getField("mx").as("mx"))
      else {
        val pend = acc.getField("armed") > 0L && acc.getField("lastc") > 0L
        val len = acc.getField("lastc") - acc.getField("armed") + 1L
        struct(
          when(pend, acc.getField("nm") + 1L).otherwise(acc.getField("nm")).as("nm"),
          when(pend, acc.getField("tot") + len).otherwise(acc.getField("tot")).as("tot"),
          when(pend && len > acc.getField("mx"), len)
            .otherwise(acc.getField("mx")).as("mx"))
      }
    sessionTokens(events)
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        aggregate(
          transform($"toks",
            (t, i) => struct(t.as("tok"), (i + 1).cast("long").as("pos"))),
          init, step, finish).as("r"))
      .select($"user_id", $"day", $"r.nm".as("n_matches"),
        $"r.tot".as("total_len"), $"r.mx".as("max_len"))
      .filter($"n_matches" > 0)
      .orderBy($"user_id", $"day")
  }

  // ---- TO NEXT ROW: the relational decomposition --------------------------

  private def compileToNextRow(spec: PatternSpec, events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
    val pos = events
      .withColumn("day", to_date($"ts"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("brk",
        when(!$"event_type".isin(spec.run.toSeq: _*), 1L).otherwise(0L))
      .withColumn("block",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val blocks = pos
      .filter($"brk" === 0)
      .withColumn("lastp",
        max(when($"event_type" === spec.closer, $"rn"))
          .over(Window.partitionBy($"user_id", $"day", $"block")))
    blocks
      .filter($"event_type" === spec.opener.get && $"lastp".isNotNull &&
        $"rn" <= $"lastp" - lit(1L + spec.minRun))
      .groupBy($"user_id", $"day")
      .agg(
        count(lit(1)).as("n_matches"),
        sum($"lastp" - $"rn" + lit(1L)).as("total_len"),
        max($"lastp" - $"rn" + lit(1L)).as("max_len"))
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_matches", $"total_len", $"max_len")
      .orderBy($"user_id", $"day")
  }

  // ---- oracle generation (DuckDB SQL from the same spec) ------------------

  private def sqlList(ts: Iterable[String]): String =
    ts.toSeq.sorted.map(t => s"'$t'").mkString(", ")

  /** The generated DuckDB oracle: a recursive-CTE automaton for PAST LAST
    * ROW (the ep02/ep04 walk shapes, parameterized), window SQL for TO
    * NEXT ROW (the ep05 decomposition). The spec is the single source —
    * neither side is hand-tuned per pattern.
    */
  def oracle(spec: PatternSpec): String =
    if (spec.skipToNextRow) toNextRowOracle(spec)
    else if (spec.overlapping) overlappingOracle(spec)
    else disjointOracle(spec)

  private val evCte =
    """ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)""".stripMargin

  /** Disjoint class (closer ∉ run): state = (armed flag, run counter);
    * a valid closer commits immediately; an opener token always re-arms.
    */
  private def disjointOracle(spec: PatternSpec): String = {
    val wList = sqlList(spec.run)
    // openerless bounded: saturating length (sliding start); anchored or
    // unbounded: plain matched-rows length
    val lenExpr = spec.maxRun match {
      case Some(n) if spec.opener.isEmpty => s"least(w.b, $n) + 1"
      case _ => s"w.b + ${1 + spec.off}"
    }
    // with an ANCHORED upper bound, a run token that would push b past
    // maxRun disarms (falls to the ELSE 0 branches) — the automaton's
    // overflow rule, generated from the same spec field
    val wKeep = spec.maxRun match {
      case Some(n) if spec.opener.isDefined =>
        s"w.s = 1 AND e.event_type IN ($wList) AND w.b + 1 <= $n"
      case _ => s"w.s = 1 AND e.event_type IN ($wList)"
    }
    val bound = spec.maxRun.filter(_ => spec.opener.isDefined)
      .map(n => s" AND w.b <= $n").getOrElse("")
    val arm = spec.opener match {
      case Some(o) =>
        (s"""CASE WHEN e.event_type = '$o' THEN 1
            |         WHEN $wKeep THEN 1
            |         ELSE 0 END""".stripMargin,
          s"""CASE WHEN e.event_type = '$o' THEN 0
             |         WHEN $wKeep THEN w.b + 1
             |         ELSE 0 END""".stripMargin,
          s"w.s = 1 AND w.b >= ${spec.minRun}$bound")
      case None =>
        ("CASE WHEN e.event_type IN (" + wList + ") THEN 1 ELSE 0 END",
          s"CASE WHEN e.event_type IN ($wList) THEN w.b + 1 ELSE 0 END",
          s"w.b >= ${spec.minRun}")
    }
    val (sNext, bNext, runOk) = arm
    s"""WITH RECURSIVE $evCte,
       |walk AS (
       |  SELECT user_id, day, 0 AS rn, 0 AS s, 0 AS b,
       |         CAST(0 AS BIGINT) AS n_matches, CAST(0 AS BIGINT) AS total_len,
       |         CAST(0 AS BIGINT) AS max_len
       |  FROM (SELECT DISTINCT user_id, day FROM ev)
       |  UNION ALL
       |  SELECT w.user_id, w.day, w.rn + 1,
       |    CASE WHEN $runOk AND e.event_type = '${spec.closer}' THEN 0
       |         ELSE $sNext END,
       |    CASE WHEN $runOk AND e.event_type = '${spec.closer}' THEN 0
       |         ELSE $bNext END,
       |    w.n_matches + CASE WHEN $runOk AND e.event_type = '${spec.closer}'
       |                       THEN 1 ELSE 0 END,
       |    w.total_len + CASE WHEN $runOk AND e.event_type = '${spec.closer}'
       |                       THEN $lenExpr ELSE 0 END,
       |    CASE WHEN $runOk AND e.event_type = '${spec.closer}'
       |          AND $lenExpr > w.max_len
       |         THEN $lenExpr ELSE w.max_len END
       |  FROM walk w JOIN ev e
       |    ON e.user_id = w.user_id AND e.day = w.day AND e.rn = w.rn + 1)
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_matches, total_len,
       |  max_len
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
       |                                   ORDER BY rn DESC) AS lastr
       |      FROM walk) t
       |WHERE lastr = 1 AND n_matches > 0
       |ORDER BY user_id, day""".stripMargin
  }

  /** Overlapping class (closer ∈ run): ep04's armed/lastc walk with the
    * quantifier bound injected; commits at breaks and at end of session.
    */
  private def overlappingOracle(spec: PatternSpec): String = {
    val wList = sqlList(spec.run)
    val armCond = spec.opener match {
      case Some(o) => s"e.event_type = '$o'"
      case None    => s"e.event_type IN ($wList)"
    }
    val runOk = s"w.rn + 1 - w.armed - ${spec.off} >= ${spec.minRun}"
    s"""WITH RECURSIVE $evCte,
       |walk AS (
       |  SELECT user_id, day, 0 AS rn, 0 AS armed, 0 AS lastc,
       |         CAST(0 AS BIGINT) AS n_matches, CAST(0 AS BIGINT) AS total_len,
       |         CAST(0 AS BIGINT) AS max_len
       |  FROM (SELECT DISTINCT user_id, day FROM ev)
       |  UNION ALL
       |  SELECT w.user_id, w.day, w.rn + 1,
       |    CASE WHEN w.armed > 0 AND e.event_type IN ($wList) THEN w.armed
       |         WHEN w.armed = 0 AND $armCond THEN w.rn + 1
       |         WHEN w.armed > 0 AND e.event_type NOT IN ($wList)
       |              AND $armCond THEN w.rn + 1
       |         ELSE 0 END,
       |    CASE WHEN w.armed > 0 AND e.event_type IN ($wList)
       |         THEN CASE WHEN e.event_type = '${spec.closer}' AND $runOk
       |                   THEN w.rn + 1 ELSE w.lastc END
       |         ELSE 0 END,
       |    w.n_matches + CASE WHEN w.armed > 0 AND w.lastc > 0
       |          AND e.event_type NOT IN ($wList)
       |         THEN 1 ELSE 0 END,
       |    w.total_len + CASE WHEN w.armed > 0 AND w.lastc > 0
       |          AND e.event_type NOT IN ($wList)
       |         THEN w.lastc - w.armed + 1 ELSE 0 END,
       |    CASE WHEN w.armed > 0 AND w.lastc > 0
       |          AND e.event_type NOT IN ($wList)
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
  }

  /** TO NEXT ROW: the ep05 window decomposition with the quantifier bound. */
  private def toNextRowOracle(spec: PatternSpec): String = {
    val wList = sqlList(spec.run)
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
       |    ROW_NUMBER() OVER w AS rn,
       |    CASE WHEN event_type NOT IN ($wList) THEN 1 ELSE 0 END AS brk,
       |    SUM(CASE WHEN event_type NOT IN ($wList) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id, CAST(ts AS DATE)
       |            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS block
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
       |               ORDER BY ts, event_id)),
       |b AS (
       |  SELECT *, MAX(CASE WHEN event_type = '${spec.closer}' THEN rn END)
       |              OVER (PARTITION BY user_id, day, block) AS lastp
       |  FROM ev WHERE brk = 0)
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       |  COUNT(*) AS n_matches,
       |  CAST(SUM(lastp - rn + 1) AS BIGINT) AS total_len,
       |  MAX(lastp - rn + 1) AS max_len
       |FROM b
       |WHERE event_type = '${spec.opener.get}' AND lastp IS NOT NULL
       |  AND rn <= lastp - ${1 + spec.minRun}
       |GROUP BY user_id, day
       |ORDER BY user_id, day""".stripMargin
  }

  // ---- compiled specs ------------------------------------------------------

  /** The bespoke family, re-expressed (PatternCompilerSpec proves each
    * identical to its hand-written original, length-metric mapped).
    */
  val ep02Spec: PatternSpec =
    PatternSpec(Some("signup"), Set("view", "click"), 1, "purchase")
  val ep03Spec: PatternSpec =
    PatternSpec(None, Set("error"), 2, "purchase")
  val ep04Spec: PatternSpec =
    PatternSpec(Some("signup"), Set("view", "click", "purchase", "signup"),
      0, "purchase")
  val ep05Spec: PatternSpec = ep04Spec.copy(skipToNextRow = true)

  /** ep06 — the combination no bespoke query covers: the overlapping
    * alphabet under SKIP TO NEXT ROW with a real quantifier bound
    * (`PATTERN (signup W{2,} purchase)`): a signup only matches when at
    * least two W events separate it from the block's greedy closing
    * purchase — the "considered purchase" cohort (signups that browsed
    * before buying), with back-to-back signup→purchase conversions
    * excluded by the bound.
    */
  val ep06Spec: PatternSpec = ep04Spec.copy(minRun = 2, skipToNextRow = true)

  def ep06(s: SparkSession, dir: String): DataFrame =
    compile(ep06Spec)(Tables.events(s, dir))

  /** ep07 — a fresh disjoint-class pattern gated through the FOLD path:
    * `PATTERN (view (click|error)+ purchase)` SKIP PAST LAST ROW — the
    * "frustrated browse conversion" (a view, then at least one
    * click-or-error, closed by a purchase). ep06 exercises the compiler's
    * relational generator end-to-end; ep07 gates the aggregate-fold
    * automaton AND the generated recursive-CTE oracle directly (the other
    * compiled re-expressions are gated transitively through their bespoke
    * twins).
    */
  val ep07Spec: PatternSpec =
    PatternSpec(Some("view"), Set("click", "error"), 1, "purchase")

  def ep07(s: SparkSession, dir: String): DataFrame =
    compile(ep07Spec)(Tables.events(s, dir))

  /** ep08 — the BOUNDED-RANGE quantifier, the last MATCH_RECOGNIZE
    * quantifier form the family lacked (ep02 `+`, ep03 `{m,}`, ep04 `*`):
    * `PATTERN (signup (view|click){1,3} purchase)` SKIP PAST LAST ROW —
    * "quick conversions": a signup closed by a purchase after one to
    * three browse events; longer browsing disqualifies the attempt and
    * the automaton disarms until the next signup (provably the
    * backtracking-greedy leftmost semantics for this class — see
    * PatternSpec). Fold-automaton path + generated recursive-CTE oracle,
    * both carrying the same maxRun transition.
    */
  val ep08Spec: PatternSpec =
    PatternSpec(Some("signup"), Set("view", "click"), 1, "purchase",
      maxRun = Some(3))

  def ep08(s: SparkSession, dir: String): DataFrame =
    compile(ep08Spec)(Tables.events(s, dir))

  /** ep09 — the OPENERLESS bounded quantifier, the sliding-start twin of
    * ep08: `PATTERN ((error){1,2} purchase)` SKIP PAST LAST ROW — "short
    * error-burst conversions". Leftmost semantics differ structurally
    * from ep08's anchored form: a long error run still matches (its last
    * ≤ 2 tokens — the start row slides), so the automaton saturates the
    * LENGTH instead of disarming on overflow; vs ep03's unbounded `{2,}`
    * the match COUNT can coincide but the length measures cap.
    */
  val ep09Spec: PatternSpec =
    PatternSpec(None, Set("error"), 1, "purchase", maxRun = Some(2))

  def ep09(s: SparkSession, dir: String): DataFrame =
    compile(ep09Spec)(Tables.events(s, dir))

  val all: Seq[Q] = Seq(
    Q("ep06_compiled_pattern", ep06, Some(oracle(ep06Spec))),
    Q("ep07_compiled_fold_pattern", ep07, Some(oracle(ep07Spec))),
    Q("ep08_bounded_quantifier", ep08, Some(oracle(ep08Spec))),
    Q("ep09_sliding_bounded_quantifier", ep09, Some(oracle(ep09Spec))),
  )
}
