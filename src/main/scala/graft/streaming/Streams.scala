package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.queries.Q
import graft.util.Exact

/** Structured Streaming surface (SURVEY.md §2.10 stretch: the reference is
  * batch-only; this re-expresses its weekly rollup A1 as a watermarked
  * tumbling-window streaming aggregation over the `events` table, plus a
  * stateful sessionization operator).
  *
  * st01 drives a real streaming query synchronously (parquet source →
  * watermark → tumbling window → memory sink) so the driver's batch oracle
  * can check it: with all data available, the streaming result must equal
  * the batch GROUP BY date_trunc('week') exactly.
  */
object Streams {

  /** File-stream source over the events parquet with `ts` normalized to a
    * session-zoned TimestampType. The raw `ts` physical type has varied
    * across testdata generations (TIMESTAMP(NANOS) → must be read as raw
    * long nanos; TIMESTAMP(MICROS) without UTC flag → TIMESTAMP_NTZ), so
    * the required stream schema is dispatched on the batch footer schema —
    * a metadata-only read. Feeding µs values through the nanos `DIV 1000`
    * path would compress every timestamp 1000×, silently collapsing all
    * watermark/session/interval-join semantics (the round-4 streaming
    * regression).
    */
  private[graft] def eventsStream(ss: SparkSession, dir: String): DataFrame = {
    val tsType = ss.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val src = ss.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", tsType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType),
      )))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType => src.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => src
      case _ => src.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  private val sinkCounter = new AtomicInteger(0)

  /** Isolated child session for ONE streaming query: own SQLConf (so the
    * state-store partition count — pinned by the first checkpoint at
    * `spark.sql.shuffle.partitions` — can be sized to the operator's state
    * cardinality), shared SparkContext/cache. The previous pattern mutated
    * the CALLER's session conf and restored it in a `finally`, which is a
    * race on global state under concurrent use (bench warmup, parallel
    * specs) — a batch query planned mid-stream would silently shuffle at
    * the streaming width. Per-query sessions are also the production
    * multi-tenant shape: one driver, many queries, each with its own conf.
    * `nanosAsLong` is set here because every file-stream source in this
    * module reads the raw events parquet (nanos ts); it is inert for
    * µs-timestamp sources.
    */
  private[graft] def streamSession(s: SparkSession, shufflePartitions: Int): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss
  }

  /** Streaming weekly rollup per event_type. Tumbling 7-day windows aligned
    * to Monday (epoch 1970-01-01 is a Thursday → 4-day startTime offset
    * matches date_trunc('week') Monday-start buckets).
    *
    * OutputMode.Complete is chosen so the sink holds EVERY window and the
    * batch-equality oracle can compare the full history — in Complete mode
    * Spark keeps all window state (the watermark does not evict). The
    * bounded-state production path is [[st03]]: Append mode, where the same
    * watermark finalizes each window 7 days past max event time and the
    * store holds only open windows.
    */
  def st01(s: SparkSession, dir: String): DataFrame =
    weeklyRollupStream(s, dir, OutputMode.Complete(), "st01_weekly")

  /** Shared body of st01/st03: parquet file stream → watermark → tumbling
    * weekly window → memory sink, drained synchronously.
    *
    * State-store partition count (fixed at shuffle-partition conf when the
    * query first starts) is sized to the operator's STATE CARDINALITY
    * (≤ weeks × event_types ≈ dozens of keys), not to the session's batch
    * shuffle width: each micro-batch runs one state-store commit per
    * partition, so 32 near-empty stores would just multiply fixed overhead.
    * A production deployment sizes this to key count / throughput the same
    * way — it is per-query and pinned by the first checkpoint.
    */
  private def weeklyRollupStream(
      s: SparkSession, dir: String, mode: OutputMode, sinkPrefix: String,
  ): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8)
    import ss.implicits._
    val src = eventsStream(ss, dir)
    val agg = src
      .withWatermark("ts", "7 days")
      .groupBy(window($"ts", "7 days", "7 days", "4 days"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Exact.dsum($"value").as("total_value"),
      )
    val sink = s"${sinkPrefix}_${sinkCounter.incrementAndGet()}"
    locally {
      val q = agg.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .select(
        date_format($"window.start", "yyyy-MM-dd").as("week_start"),
        $"event_type", $"n_events", $"total_value",
      )
      .orderBy($"week_start", $"event_type")
  }

  /** Batch oracle: the streaming tumbling window must equal GROUP BY
    * date_trunc('week').
    */
  val st01Oracle: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""".stripMargin

  /** st03 — the bounded-state production form of st01: OutputMode.Append.
    * Each window is emitted exactly once, when the watermark (max event time
    * − 7 days) passes its end; afterwards its state is evicted, so the store
    * holds only open windows regardless of stream length — the 100 TB/day
    * shape. The final no-data batch flushes every window the end-of-input
    * watermark finalizes; windows inside the last horizon stay open and are
    * (correctly) absent. Oracle: the batch rollup restricted to closed
    * windows, `window_end <= max(ts) − 7 days` — deterministic because the
    * watermark is a pure function of the data.
    */
  def st03(s: SparkSession, dir: String): DataFrame =
    weeklyRollupStream(s, dir, OutputMode.Append(), "st03_weekly_append")

  /** Batch form of the append-mode emission rule: only windows whose end the
    * end-of-input watermark passed.
    */
  val st03Oracle: String =
    """WITH wm AS (SELECT MAX(ts) - INTERVAL 7 DAY AS w FROM events)
      |SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events, wm
      |WHERE date_trunc('week', ts) + INTERVAL 7 DAY <= wm.w
      |GROUP BY 1, 2 ORDER BY week_start, event_type""".stripMargin

  /** st04 — watermarked stream-stream interval join as a gated query (the
    * MemoryStream form is spec-covered; this runs it over the events table):
    * each purchase attaches to same-user clicks at most 30 minutes older.
    * The watermarks + interval bound make join state PRUNABLE — a click row
    * ages out as soon as no future purchase inside the watermark horizon
    * can reach it, so state is O(events per horizon), not O(stream). With
    * the file fully available the inner join emits every qualifying pair —
    * the oracle is the equivalent batch interval self-join.
    */
  def st04(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 4) // join-state stores
    import ss.implicits._
    def src = eventsStream(ss, dir)
    val clicks = src.filter($"event_type" === "click")
      .select($"event_id".as("c_event"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event"), $"user_id".as("p_user"),
        $"ts".as("p_ts"), $"value".as("amount"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks, expr(
      "p_user = c_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"))
    val sink = s"st04_ss_join_${sinkCounter.incrementAndGet()}"
    locally {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .select($"c_event", $"p_event", $"c_user".as("user_id"),
        date_format($"c_ts", "yyyy-MM-dd HH:mm:ss").as("c_ts_s"),
        date_format($"p_ts", "yyyy-MM-dd HH:mm:ss").as("p_ts_s"),
        $"amount")
      .orderBy($"c_event", $"p_event")
  }

  val st04Oracle: String =
    """SELECT c.event_id AS c_event, p.event_id AS p_event, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
      |  p.value AS amount
      |FROM events c JOIN events p ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY c_event, p_event""".stripMargin

  /** st09 — watermarked stream-stream LEFT OUTER interval join: every
    * click, with its purchases at most 30 minutes later — and clicks with
    * NO such purchase emit null-padded, which is the part inner joins
    * (st04) can't express and batch left joins get for free: a streaming
    * left-outer can only emit the null row once the watermark PROVES no
    * future purchase can match (state eviction time = the click's last
    * possible match time). With the file fully available, matched pairs
    * equal the batch join; null rows appear exactly for clicks whose
    * match-window end falls strictly below the end-of-input watermark
    * (max p_ts − 1 h) — clicks inside the final horizon stay open and are
    * (correctly) absent, the same deterministic emission contract st03
    * pins for append-mode windows. State on both sides is pruned by
    * watermark + interval bound: O(events per horizon), not O(stream).
    */
  def st09(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 4)
    import ss.implicits._
    def src = eventsStream(ss, dir)
    val clicks = src.filter($"event_type" === "click")
      .select($"event_id".as("c_event"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event"), $"user_id".as("p_user"),
        $"ts".as("p_ts"), $"value".as("amount"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases, expr(
      "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"),
      "left_outer")
    val sink = s"st09_ss_outer_${sinkCounter.incrementAndGet()}"
    locally {
      val q = joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .select($"c_event", $"p_event", $"c_user".as("user_id"),
        date_format($"c_ts", "yyyy-MM-dd HH:mm:ss").as("c_ts_s"),
        $"amount")
      .orderBy($"c_event", $"p_event")
  }

  val st09Oracle: String =
    """WITH wm AS (SELECT LEAST(
      |      (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
      |      (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
      |      - INTERVAL 1 HOUR AS w),
      |c AS (SELECT event_id AS c_event, user_id AS c_user, ts AS c_ts
      |      FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS p_event, user_id AS p_user, ts AS p_ts, value AS amount
      |      FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT c.*, p.p_event, p.amount
      |      FROM c LEFT JOIN p ON c_user = p_user
      |        AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTE)
      |SELECT c_event, p_event, c_user AS user_id,
      |  strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s, amount
      |FROM j, wm
      |WHERE p_event IS NOT NULL OR c_ts + INTERVAL 30 MINUTE < wm.w
      |ORDER BY c_event, p_event""".stripMargin

  /** st02 — event-time SESSION windows (dynamic-gap grouping the reference
    * never had; the batch form of the sessionization the stateful operator
    * below does incrementally). Spark's native `session_window` merges
    * events whose ts is < gap after the previous one; the oracle expresses
    * the same semantics independently as gaps-and-islands SQL (lag + flag +
    * running sum) — two formulations, one answer.
    */
  def st02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.dsum($"value").as("total_value"),
      )
      .select(
        $"user_id",
        date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        $"n_events", $"total_value",
      )
      .orderBy($"user_id", $"session_start")
  }

  val st02Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM marked)
      |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Streaming exactly-once-per-key dedup: `dropDuplicatesWithinWatermark`
    * keeps state only inside the watermark horizon (unbounded
    * `dropDuplicates` state would grow forever on an infinite stream —
    * the 100 TB/day failure mode). Re-deliveries of the same event_id
    * within `horizon` are dropped; state for ids older than the watermark
    * is evicted.
    */
  def dedupStream(events: DataFrame, horizon: String): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- stateful sessionization (flatMapGroupsWithState) ----------------

  final case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)

  /** Open-session state: timestamps in epoch MICROS (full timestamp
    * precision — a millisecond-rounded gap test could disagree with the
    * oracle's µs interval arithmetic at the boundary), value total in
    * QUANTIZED cents (round(v·100) as long — associative integer adds, so
    * the total is independent of batch chopping and bit-identical to the
    * oracle's unordered SUM; a double accumulator would depend on arrival
    * order).
    */
  final case class SessionState(start: Long, lastSeen: Long, n: Int, totalQ: Long)

  final case class Session(
      userId: Long,
      sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp,
      nEvents: Int,
      totalValue: Double,
  )

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom stateful operator: per-user sessions closed after `gapMinutes`
    * of inactivity (KeyValueGroupedDataset.flatMapGroupsWithState —
    * SURVEY.md §2.10 "custom state" surface). State per key is O(1): the
    * open session only.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => micros(e.ts))
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = micros(e.ts)
            // HALF_UP (away from zero), matching Spark's `round` and the
            // oracle's DuckDB ROUND — math.rint (half-to-EVEN) diverges by
            // one cent on exact half-cent values
            val q = BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            cur match {
              // strict <: an exactly-gap-spaced event starts a NEW session,
              // matching session_window / the st02 oracle's >= INTERVAL rule
              case Some(st) if t - st.lastSeen < gapUs =>
                cur = Some(st.copy(lastSeen = t, n = st.n + 1, totalQ = st.totalQ + q))
              case Some(st) =>
                closed += Session(userId, fromMicros(st.start),
                  fromMicros(st.lastSeen), st.n, st.totalQ / 100.0)
                cur = Some(SessionState(t, t, 1, q))
              case None =>
                cur = Some(SessionState(t, t, 1, q))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** st08 — the custom-state sessionizer as a GATED query: [[sessionize]]
    * driven over the events file stream. Append-mode emission is part of
    * the contract — a session is emitted when a LATER event closes it, so
    * each user's final (still-open) session is correctly absent, and the
    * oracle is the gaps-and-islands batch sessionization minus each user's
    * last island. st02 gates the built-in `session_window` against
    * gaps-and-islands SQL; this gates the flatMapGroupsWithState state
    * machine (O(1) state per key: the open session only) against the same
    * independent formulation at a different gap.
    */
  def st08(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // state: one row per user
    import ss.implicits._
    val src = eventsStream(ss, dir)
      .select($"user_id".as("userId"), $"ts", $"value")
      .as[Event]
    val sink = s"st08_sessionize_${sinkCounter.incrementAndGet()}"
    locally {
      val q = sessionize(src, gapMinutes = 45).writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .select(
        $"userId".as("user_id"),
        date_format($"sessionStart", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format($"sessionEnd", "yyyy-MM-dd HH:mm:ss").as("session_end"),
        $"nEvents".as("n_events"),
        $"totalValue".as("total_value"))
      .orderBy($"user_id", $"session_start")
  }

  val st08Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 45 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM marked),
      |agg AS (SELECT user_id, sid,
      |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |    strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, session_start, session_end, n_events, total_value
      |FROM agg
      |QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)
      |ORDER BY user_id, session_start""".stripMargin

  /** st05 — streaming INGEST DEDUP: the d01 exact-dedup collapse as a
    * continuous query over a documents file stream (the dedup-on-arrival
    * stage of a training-data ingest pipeline). The ledger aggregates
    * (min keep_id, copy count per content fingerprint) are
    * arrival-order-INSENSITIVE, so however the source splits into
    * micro-batches, the converged ledger is byte-identical to the batch
    * dedup — the oracle IS d01's. Complete mode deliberately: a dedup
    * ledger's state is the fingerprint set itself and lives as long as the
    * dedup horizon; bounding it is a retention-policy choice (fingerprint
    * TTL via dropDuplicatesWithinWatermark), not a correctness one. State
    * is one ~56-byte row per DISTINCT document — at 10B docs that is
    * store-partitioned across the cluster, the standard ingest-dedup
    * shape.
    */
  def st05(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // ledger-key-sized stores
    import ss.implicits._
    val docsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val src = ss.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val ledger = src
      .groupBy(md5(graft.ops.TextAnalysis.normalize($"text")).as("fingerprint"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    val sink = s"st05_ingest_dedup_${sinkCounter.incrementAndGet()}"
    locally {
      val q = ledger.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink).orderBy($"keep_id")
  }

  /** st06 — streaming CDC APPLY: treat events as a changelog keyed by
    * user_id and maintain the "current state per user" table incrementally
    * with [[graft.Warehouse.cdcApply]] (latest-wins on the row's own
    * (ts, event_id) version, not arrival order). The stream is deliberately
    * chopped into MANY micro-batches — the events table is re-written as 8
    * chunk files into a temp dir and consumed with maxFilesPerTrigger=1 —
    * so the gate genuinely exercises multi-batch convergence: cdcApply is
    * associative/commutative over batch splits, hence the converged table
    * equals the batch DISTINCT ON regardless of file arrival order. The
    * oracle is that batch form (QUALIFY row_number = 1).
    *
    * foreachBatch + merge is the standard production CDC sink (the target
    * there is a transactional table and the merge a MERGE INTO; here the
    * target is an in-memory frame localCheckpoint'd per batch — same
    * topology, swap the sink). Per batch the work is one shuffle at
    * CURRENT-STATE cardinality (users), and the changelog never accumulates
    * anywhere: state size is O(distinct keys), the 100 TB/day CDC shape.
    */
  def st06(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // state-cardinality-sized
    import ss.implicits._
    val chunkDir = java.nio.file.Files
      .createTempDirectory("st06_changelog_").toString
    graft.Tables.events(ss, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .repartition(8) // 8 chunk files → 8 micro-batches
      .write.mode("overwrite").parquet(chunkDir)
    val src = ss.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
      )))
      .option("maxFilesPerTrigger", "1")
      .parquet(chunkDir)
    var state: DataFrame = ss.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), src.schema)
    locally {
      val q = src.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          state = graft.Warehouse
            .cdcApply(state, batch, "user_id", Seq("ts", "event_id"))
            .localCheckpoint(true) // truncate lineage each fold
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    state
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_event_type"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        $"value".as("last_value"))
      .orderBy($"user_id")
  }

  val st06Oracle: String =
    """SELECT user_id, event_id AS last_event_id,
      |  event_type AS last_event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
      |  value AS last_value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  /** st07 — stream-static ENRICHMENT join: the events stream joins the
    * static `customer` dimension (user_id = c_custkey) and rolls revenue up
    * by market segment. This is the canonical streaming-ETL enrich step —
    * facts arrive, dimensions sit in the warehouse — and it is STATELESS:
    * Spark re-plans the static side into each micro-batch (a broadcast
    * hash join; no join state store, nothing to watermark on the dim side).
    * Only the downstream aggregation keeps state, sized at segments ×
    * event types (25 keys). At 100 TB/day the same topology holds — the
    * dim broadcast refreshes per batch, so slowly-changing dimensions are
    * picked up without restarting the query.
    */
  def st07(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // 25 agg keys
    import ss.implicits._
    val src = eventsStream(ss, dir)
    val dim = graft.Tables.customer(ss, dir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val agg = src
      .join(broadcast(dim), Seq("user_id")) // stateless stream-static join
      .groupBy($"c_mktsegment", $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Exact.dsum($"value").as("total_value"),
      )
    val sink = s"st07_enrich_${sinkCounter.incrementAndGet()}"
    locally {
      val q = agg.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .select($"c_mktsegment", $"event_type", $"n_events", $"total_value")
      .orderBy($"c_mktsegment", $"event_type")
  }

  val st07Oracle: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin

  // ---- transformWithState (Spark 4 arbitrary-state API) ----------------

  final case class Tx(userId: Long, ts: java.sql.Timestamp, eventId: Long, value: Double)
  final case class TxState(seq: Long, cumQ: Long)
  final case class TxOut(userId: Long, eventId: Long, seq: Long, cumValue: Double)

  /** Per-user running ordinal + cumulative spend, as a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]] for Spark 4's
    * `transformWithState` — the successor API to st08's
    * flatMapGroupsWithState, with typed named-state primitives
    * (ValueState/ListState/MapState), per-state TTL, and timers, running
    * on the RocksDB state store.
    *
    * State per key is O(1) — a (seq, cum cents) pair. The cents total is
    * quantized exactly like st08's sessionizer (HALF_UP, associative
    * integer adds), so the running value is bit-identical to the oracle's
    * windowed SUM regardless of micro-batch chopping; the ordinal is the
    * (ts, event_id)-sorted arrival position, the same within-batch
    * ordering contract st08 pins.
    */
  private class RunningTotals extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, Tx, TxOut] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[TxState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[TxState]("running",
        org.apache.spark.sql.Encoders.product[TxState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Tx],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TxOut] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.eventId))
      var cur = if (state.exists()) state.get() else TxState(0L, 0L)
      val out = sorted.map { e =>
        val q = BigDecimal(e.value * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        cur = TxState(cur.seq + 1, cur.cumQ + q)
        TxOut(key, e.eventId, cur.seq, cur.cumQ / 100.0)
      }
      state.update(cur)
      out.iterator
    }
  }

  /** st10 — the [[RunningTotals]] processor as a GATED query: per-user
    * event ordinals and running spend over the events file stream (the
    * arrival-position lineage a streaming feature store attaches to each
    * event). transformWithState requires the RocksDB state-store provider;
    * the child session pins it per-query, which is also the production
    * posture — RocksDB state spills to disk, so per-key state survives
    * executor heap pressure at 100 TB/day.
    *
    * Oracle: the batch window equivalents — row_number() for the ordinal
    * and a running SUM of HALF_UP-quantized cents for the total, ordered
    * by (ts, event_id) within user.
    */
  def st10(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // state: one row per user
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val src = eventsStream(ss, dir)
      .select($"user_id".as("userId"), $"ts", $"event_id".as("eventId"), $"value")
      .as[Tx]
    val out = src
      .groupByKey(_.userId)
      .transformWithState(new RunningTotals,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
    val sink = s"st10_tws_${sinkCounter.incrementAndGet()}"
    locally {
      val q = out.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try {
        q.processAllAvailable()
        // ORDERING CONTRACT (round-5 advice): the processor sorts by
        // (ts, event_id) only WITHIN a micro-batch, so seq/cum_value match
        // the batch-window oracle because the single events.parquet file
        // arrives in one batch. A rate limit or multi-file events dir would
        // silently reorder — fail loudly instead so the gate can never
        // drift green-looking-but-wrong.
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches <= 1,
          s"st10 ordering contract violated: events arrived in $dataBatches " +
            "micro-batches; the within-batch sort only equals the global " +
            "(ts, event_id) order when the source is a single batch")
      } finally q.stop()
    }
    ss.table(sink)
      .select($"userId".as("user_id"), $"eventId".as("event_id"),
        $"seq", $"cumValue".as("cum_value"))
      .orderBy($"user_id", $"seq")
  }

  val st10Oracle: String =
    """SELECT user_id, event_id,
      |  row_number() OVER w AS seq,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS cum_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, seq""".stripMargin

  /** st11 — streaming dedup via the DEDICATED
    * `dropDuplicatesWithinWatermark` operator (Spark 3.5+): st05 builds a
    * dedup LEDGER by aggregation (Complete mode, converged state); this is
    * the pass-through form every ingest front-door actually runs — emit
    * each key's first arrival, drop replays, and let the watermark EVICT
    * per-key state once a duplicate can no longer arrive. TTL'd dedup
    * state is the at-least-once-transport answer: state is O(keys per
    * horizon), not O(stream).
    *
    * The gate makes the multi-batch state path real and DETERMINISTIC:
    * batch 1 is the full events table, batch 2 is nothing but REPLAYS
    * (copies of events from the stream's final watermark horizon,
    * ts ≥ max(ts) − 7d, so their keys are provably still in state when
    * the replays arrive). ORDER IS LOAD-BEARING: FileStreamSource picks
    * files oldest-mtime-first, and if the replay file formed batch 1 the
    * watermark would advance to max(ts)−7d and batch 2's older full-table
    * rows would be dropped as LATE data — so the mtimes are set
    * explicitly (full ≪ replays) rather than trusting write order, and a
    * require() pins batch 1 to exactly the full-table row count. Output
    * = exactly one copy of every event, which is what the batch oracle
    * states; any replay leaking through would double a row and break the
    * hash.
    */
  def st11(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8)
    import ss.implicits._
    val ev = graft.Tables.events(ss, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val chunkDir = java.nio.file.Files
      .createTempDirectory("st11_replay_").toString
    val horizon = ev.agg(max($"ts").as("mx"))
      .select(($"mx" - expr("INTERVAL 7 DAYS")).as("lo")) // 1-row bound
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String,
        mtimeMs: Long): Unit = {
      val tmp = s"$chunkDir/_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$chunkDir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      // FileStreamSource orders by mtime: make "full before replays"
      // explicit instead of an accident of sequential write timing
      dest.toFile.setLastModified(mtimeMs)
    }
    val t0 = System.currentTimeMillis()
    writeOne(ev, "0_full", t0 - 120000L)
    writeOne(ev.crossJoin(broadcast(horizon)).filter($"ts" >= $"lo")
      .drop("lo"), "1_replays", t0)
    val src = ss.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
      )))
      .option("maxFilesPerTrigger", "1") // replays arrive as their own batch
      .parquet(chunkDir)
    val deduped = src
      .withWatermark("ts", "7 days")
      .dropDuplicatesWithinWatermark("event_id")
    val sink = s"st11_dedup_ttl_${sinkCounter.incrementAndGet()}"
    val fullCount = ev.count()
    try {
      val q = deduped.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(sink)
        .start()
      try {
        q.processAllAvailable()
        // the ordering invariant, asserted: batch 1 must be the whole
        // full table — a replay-first ordering would make it smaller and
        // silently drop the older full rows as late data
        val firstBatch = q.recentProgress.toSeq
          .sortBy(_.batchId).find(_.numInputRows > 0)
        require(firstBatch.exists(_.numInputRows == fullCount),
          s"st11 ordering contract violated: first data batch had " +
            s"${firstBatch.map(_.numInputRows)} rows, expected $fullCount " +
            "(the full table must form batch 1, replays batch 2)")
      } finally q.stop()
    } finally {
      // don't leak a full events copy per run/bench rep
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(chunkDir))
    }
    val out = ss.table(sink)
      .select($"event_id", $"user_id", $"event_type", $"value",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    s.createDataFrame(out.rdd, out.schema).orderBy(col("event_id"))
  }

  /** Perfect replay suppression = the clean batch table. */
  val st11Oracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM events ORDER BY event_id""".stripMargin

  /** st12 — STREAMING POSTINGS-LEDGER MAINTENANCE: the continuous-ingest
    * complement to the batch index maintenance (Incremental.i04): as
    * document files arrive, one streaming aggregation maintains the
    * (term, doc) tf ledger — the stored artifact the ir-family retrieval
    * ops probe — and term-grain statistics (df / total tf) are refreshed
    * FROM the converged ledger, never from corpus text (the periodic
    * stats-refresh step a production indexer runs; i04's docstring
    * explains why stats are index-grain work). The ledger agg state is
    * postings-cardinality — the index itself — which is exactly what any
    * indexer must hold somewhere; at scale the Complete-mode memory sink
    * becomes a keyed external sink, same topology.
    *
    * Gate: the same top-20 term-stats form as i04 over the full corpus —
    * the oracle is the batch rebuild, so the hash match proves the
    * streaming ledger converged to the batch index exactly.
    */
  def st12(s: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(s, shufflePartitions = 8) // vocabulary-sized state
    import ss.implicits._
    val docsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val src = ss.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val ledger = src
      .select($"doc_id", explode(filter(
        split(graft.ops.TextAnalysis.normalize($"text"), " "),
        x => x =!= "")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val sink = s"st12_postings_${sinkCounter.incrementAndGet()}"
    locally {
      val q = ledger.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(sink)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    ss.table(sink)
      .groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"), sum($"tf").as("total_tf"))
      .orderBy($"df".desc, $"term")
      .limit(20)
  }

  val st12Oracle: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM p GROUP BY 1, 2)
      |SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(SUM(tf) AS BIGINT) AS total_tf
      |FROM tf GROUP BY term
      |ORDER BY df DESC, term LIMIT 20""".stripMargin

  def all: Seq[Q] = Seq(
    Q("st01_stream_weekly_rollup", st01, Some(st01Oracle)),
    Q("st02_session_windows", st02, Some(st02Oracle)),
    Q("st03_stream_append_rollup", st03, Some(st03Oracle)),
    Q("st04_stream_interval_join", st04, Some(st04Oracle)),
    Q("st05_stream_ingest_dedup", st05, Some(graft.ops.Dedup.d01Oracle)),
    Q("st06_stream_cdc_apply", st06, Some(st06Oracle)),
    Q("st07_stream_static_enrich", st07, Some(st07Oracle)),
    Q("st08_stateful_sessionize", st08, Some(st08Oracle)),
    Q("st09_stream_outer_join", st09, Some(st09Oracle)),
    Q("st10_stream_running_totals", st10, Some(st10Oracle)),
    Q("st11_stream_dedup_ttl", st11, Some(st11Oracle)),
    Q("st12_stream_postings", st12, Some(st12Oracle)),
  )
}
