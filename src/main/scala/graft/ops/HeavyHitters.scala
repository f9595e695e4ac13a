package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.misra_gries
import graft.queries.Q

/** Heavy-hitters detection with a bounded-memory mergeable sketch
  * ([[org.apache.spark.sql.graft.MisraGries]]): find the keys that
  * dominate a stream/table without a full frequency shuffle. At 100 TB the
  * exact form (groupBy key → count → filter) exchanges every distinct key;
  * the sketch form exchanges k·tasks counters total, and its deterministic
  * guarantees (no false negatives above the n/(k+1) threshold, bounded
  * undercount) hold under ANY merge tree — so hot-key discovery for skew
  * mitigation (feeding `Skew.saltedAgg`'s key list) costs one narrow pass.
  */
object HeavyHitters {

  val K = 15 // sketch capacity → detection threshold n/(k+1) = n/16

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** hh01 — the sketch's guarantees gated cross-engine. The key domain is
    * deliberately skew-shaped (one hot key owning ~1/3 of lineitem + a
    * ~40k-key unique-ish cold tail) so the 15-counter buffer is under
    * constant eviction pressure — the regime the sketch exists for.
    *
    * Which EXTRA counters survive and their raw estimates depend on merge
    * order (partition count, scheduling), so the gated output carries only
    * the ORDER-INVARIANT facts, each decidable in exact integer
    * arithmetic: for every TRUE heavy hitter (exact count · (k+1) > n,
    * computed exactly by the oracle) — membership in the sketch (the
    * no-false-negative guarantee) and the undercount bound
    * (0 ≤ exact − est, (exact − est)·(k+1) ≤ n). The oracle recomputes the
    * exact counts and pins both booleans TRUE.
    */
  /** The hh01/hh02 key domain over lineitem rows. */
  def keyedItems(li: DataFrame): DataFrame = li.select(
    when(col("l_orderkey") % 3 === 0, lit("hot"))
      .otherwise(concat(lit("cold_"), col("l_orderkey").cast("string")))
      .as("item"))

  /** Audit a 1-row (mg, n) sketch relation against the exact counts:
    * guarantee-derived, merge-order-invariant facts only.
    */
  def auditSketch(sketch: DataFrame, keyed: DataFrame): DataFrame = {
    val exact = keyed.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
    exact
      .crossJoin(broadcast(sketch))
      .filter(col("exact_cnt") * (K + 1) > col("n")) // true heavy hitters only
      .withColumn("entry", filter(col("mg"), e => e.getField("item") === col("item")))
      .select(
        col("item"), col("exact_cnt"),
        (size(col("entry")) === 1).as("in_sketch"),
        (size(col("entry")) === 1 &&
          element_at(col("entry"), 1).getField("est") <= col("exact_cnt") &&
          (col("exact_cnt") - element_at(col("entry"), 1).getField("est")) * (K + 1) <= col("n"))
          .as("bounds_ok"))
      .orderBy(col("item"))
  }

  def hh01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = keyedItems(Tables.lineitem(s, dir))
    val sketch = keyed.agg(
      misra_gries($"item", K).as("mg"),
      count(lit(1)).as("n"))
    auditSketch(sketch, keyed)
  }

  /** hh02 — the SAME sketch maintained incrementally by Structured
    * Streaming: the global misra_gries aggregation runs over a file stream
    * of the fact, its k-counter buffer living in the state store and
    * merging batch-by-batch (exactly the mergeable-summaries path the
    * aggregate implements). Because the guarantees are merge-tree
    * invariant, the CONVERGED sketch passes the identical audit as the
    * batch hh01 — same oracle — which is the streaming-equals-batch claim
    * for sketches: hot-key monitoring over an infinite stream in O(k)
    * state. Complete mode: the sketch row is the state, re-emitted per
    * batch; the audit reads the final one.
    */
  def hh02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    // one global sketch row → one state-store partition, pinned on a child
    // session (own SQLConf) instead of a set/restore race on the caller's
    // conf — same isolation pattern as graft.streaming.Streams
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "1")
    graft.functions.VectorFunctions.register(ss) // idempotent; child session
    val src = ss.readStream
      .schema("l_orderkey BIGINT")
      .option("pathGlobFilter", "lineitem.parquet")
      .parquet(dir)
    val sketchStream = keyedItems(src).agg(
      misra_gries($"item", K).as("mg"),
      count(lit(1)).as("n"))
    val sink = s"hh02_sketch_${sinkCounter.incrementAndGet()}"
    locally {
      val q = sketchStream.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // the one-row sketch re-homes to the caller's session so the audit join
    // runs at the batch shuffle width
    val sketch = ss.table(sink)
    auditSketch(s.createDataFrame(sketch.rdd, sketch.schema),
      keyedItems(Tables.lineitem(s, dir)))
  }

  val hh01Oracle: String =
    s"""WITH keys AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot'
       |    ELSE 'cold_' || CAST(l_orderkey AS VARCHAR) END AS item FROM lineitem),
       |tot AS (SELECT COUNT(*) AS n FROM keys),
       |cnt AS (SELECT item, COUNT(*) AS exact_cnt FROM keys GROUP BY item)
       |SELECT item, exact_cnt, TRUE AS in_sketch, TRUE AS bounds_ok
       |FROM cnt, tot WHERE exact_cnt * ${K + 1} > n ORDER BY item""".stripMargin

  /** The hh03 key domain over the events stream: two hot tiers (two 1/7
    * user cohorts, each ~14% of any window's rows — comfortably above the
    * n/(k+1) = 6.25% detection threshold) over a per-event unique cold
    * tail, so every window's sketch is under eviction pressure AND holds
    * two guaranteed members.
    */
  def eventItems(ev: DataFrame): DataFrame = ev.select(
    col("ts"),
    when(col("user_id") % 7 === 0, lit("hot_a"))
      .when(col("user_id") % 7 === 1, lit("hot_b"))
      .otherwise(concat(lit("cold_"), col("event_id").cast("string")))
      .as("item"))

  /** hh03 — per-WINDOW streaming heavy hitters: hh02's incrementally-
    * maintained sketch made TIME-WINDOWED, the "top keys per hour/day"
    * monitor every ingest pipeline runs. One Misra–Gries buffer per
    * tumbling 7-day event-time window lives in the state store;
    * OutputMode.Append + the watermark emit each window's converged sketch
    * exactly once when the end-of-input watermark closes it, then EVICT its
    * state — so the store holds only open windows regardless of stream
    * length (st03's bounded-state argument, applied to sketch state).
    *
    * The audit is hh01's, per window: for every TRUE per-window heavy
    * hitter (exact window count · (k+1) > window n, recomputed exactly by
    * the oracle over the identical closed-window restriction), membership
    * in that window's sketch and the deterministic undercount bound. The
    * inner join on week_start restricts the exact side to the closed
    * windows the append stream emitted — the same
    * `window_end ≤ max(ts) − horizon` rule st03's oracle states.
    *
    * 100 TB shape: per-window sketch state is O(k); the only per-batch
    * exchange carries partial k-counter buffers keyed by window; eviction
    * keeps total state proportional to OPEN windows (one, for tumbling).
    */
  def hh03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    // state cardinality = open windows (~1) → narrow state store
    val ss = graft.streaming.Streams.streamSession(s, shufflePartitions = 4)
    graft.functions.VectorFunctions.register(ss)
    val src = eventItems(graft.streaming.Streams.eventsStream(ss, dir))
    val agg = src
      .withWatermark("ts", "7 days")
      .groupBy(window($"ts", "7 days", "7 days", "4 days"))
      .agg(misra_gries($"item", K).as("mg"), count(lit(1)).as("n"))
    val sink = s"hh03_windowed_${sinkCounter.incrementAndGet()}"
    locally {
      val q = agg.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val closed = ss.table(sink)
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("week_start"),
        col("mg"), col("n"))
    val sketches = s.createDataFrame(closed.rdd, closed.schema)
    val exact = eventItems(Tables.events(s, dir))
      .select(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"),
        col("item"))
      .groupBy($"week_start", $"item").agg(count(lit(1)).as("exact_cnt"))
    exact
      .join(broadcast(sketches), Seq("week_start")) // inner ⇒ closed windows only
      .filter(col("exact_cnt") * (K + 1) > col("n"))
      .withColumn("entry", filter(col("mg"), e => e.getField("item") === col("item")))
      .select(
        col("week_start"), col("item"), col("exact_cnt"),
        (size(col("entry")) === 1).as("in_sketch"),
        (size(col("entry")) === 1 &&
          element_at(col("entry"), 1).getField("est") <= col("exact_cnt") &&
          (col("exact_cnt") - element_at(col("entry"), 1).getField("est")) * (K + 1) <= col("n"))
          .as("bounds_ok"))
      .orderBy(col("week_start"), col("item"))
  }

  /** hh01's audit per closed window: the append-mode emission rule is the
    * same `window_end ≤ end-of-input watermark` restriction as st03's.
    */
  val hh03Oracle: String =
    s"""WITH wm AS (SELECT MAX(ts) - INTERVAL 7 DAY AS w FROM events),
       |keys AS (SELECT date_trunc('week', ts) AS wk,
       |    CASE WHEN user_id % 7 = 0 THEN 'hot_a'
       |         WHEN user_id % 7 = 1 THEN 'hot_b'
       |         ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS item
       |  FROM events),
       |closed AS (SELECT wk, item FROM keys, wm WHERE wk + INTERVAL 7 DAY <= wm.w),
       |tot AS (SELECT wk, COUNT(*) AS n FROM closed GROUP BY wk),
       |cnt AS (SELECT wk, item, COUNT(*) AS exact_cnt FROM closed GROUP BY wk, item)
       |SELECT strftime(cnt.wk, '%Y-%m-%d') AS week_start, item, exact_cnt,
       |  TRUE AS in_sketch, TRUE AS bounds_ok
       |FROM cnt JOIN tot USING (wk)
       |WHERE exact_cnt * ${K + 1} > n
       |ORDER BY week_start, item""".stripMargin

  def all: Seq[Q] = Seq(
    Q("hh01_heavy_hitters", hh01, Some(hh01Oracle)),
    Q("hh02_heavy_hitters_stream", hh02, Some(hh01Oracle)),
    Q("hh03_heavy_hitters_windowed", hh03, Some(hh03Oracle)),
  )
}
