package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.Tables
import graft.util.Exact

class StreamsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("st01 streaming weekly rollup equals the batch equivalent") {
    val streamed = Streams.st01(spark, sfSmoke).collect()
    val batch = Tables.events(spark, sfSmoke)
      .groupBy(date_format(date_trunc("week", $"ts"), "yyyy-MM-dd").as("week_start"),
        $"event_type")
      .agg(count(lit(1)).as("n_events"), Exact.dsum($"value").as("total_value"))
      .orderBy($"week_start", $"event_type")
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("checkpoint recovery: a stopped query resumes from its checkpoint exactly-once (per-batch idempotence)") {
    // the operational contract every 100 TB/day pipeline leans on: kill a
    // streaming job mid-stream, restart it on the same checkpoint, and the
    // union of processed batches covers the input exactly once — any batch
    // replayed across the restart boundary is re-delivered with IDENTICAL
    // content and the same batchId (foreachBatch's idempotence key)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val srcDir = java.nio.file.Files.createTempDirectory("ckpt_src_").toString
    Tables.documents(ss, sfSmoke).select($"doc_id")
      .repartition(8).write.mode("overwrite").parquet(srcDir)
    val allIds = Tables.documents(ss, sfSmoke).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_loc_").toString
    val run1 = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    val run2 = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    def src = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT"))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    // run 1: stop after at least 3 micro-batches committed
    locally {
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          run1.put(id, b.collect().map(_.getLong(0)).toSet): Unit
        }
        .start()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (run1.size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      q.stop()
      assert(run1.size >= 3, "run 1 never committed 3 batches")
    }
    // run 2: same checkpoint, drain to the end
    locally {
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          run2.put(id, b.collect().map(_.getLong(0)).toSet): Unit
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    import scala.jdk.CollectionConverters._
    val m1 = run1.asScala.toMap
    val m2 = run2.asScala.toMap
    // run 2 resumed PAST run 1's committed prefix: at most one batchId
    // overlaps (the one in flight at the kill), and a replay is bit-equal
    val overlap = m1.keySet.intersect(m2.keySet)
    assert(overlap.size <= 1, s"resumed query replayed committed batches: $overlap")
    overlap.foreach(id => assert(m1(id) == m2(id), s"replayed batch $id diverged"))
    // exactly-once coverage: batches keyed by id tile the input, no dup ids
    val merged = (m1 ++ m2).values.toSeq
    assert(merged.map(_.size).sum == allIds.size, "a document was processed twice or lost")
    assert(merged.reduce(_ ++ _) == allIds)
  }

  test("Trigger.AvailableNow: bounded backfill drains everything in rate-limited batches then self-terminates") {
    // the production backfill trigger: process ALL currently-available
    // input under the rate limits (here 1 file per batch), then stop on
    // its own — unlike processAllAvailable, which needs a driver babysitting
    // the query. The contract: multiple bounded batches, full coverage,
    // voluntary termination.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val srcDir = java.nio.file.Files.createTempDirectory("an_src_").toString
    Tables.documents(ss, sfSmoke).select($"doc_id")
      .repartition(6).write.mode("overwrite").parquet(srcDir)
    val allIds = Tables.documents(ss, sfSmoke).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    val q = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT"))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.collect().map(_.getLong(0)).toSet): Unit
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    import scala.jdk.CollectionConverters._
    val m = batches.asScala.toMap
    assert(m.size >= 6, s"rate limit ignored: ${m.size} batches for 6 files")
    assert(m.values.map(_.size).sum == allIds.size, "row processed twice or lost")
    assert(m.values.reduce(_ ++ _) == allIds)
  }

  test("st10 transformWithState running totals equal the batch window recompute") {
    val streamed = Streams.st10(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = Tables.events(spark, sfSmoke)
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .select($"user_id", $"event_id",
        row_number().over(w).cast("long").as("seq"),
        (sum($"cents").over(w).cast("double") / 100).as("cum_value"))
      .orderBy($"user_id", $"seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.length == batch.length)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("st08 gated sessionizer: emitted sessions match the batch gaps-and-islands minus open tails") {
    val got = Streams.st08(spark, sfSmoke).collect()
    assert(got.nonEmpty)
    // batch recompute: same gap rule, drop each user's last island
    val gapUs = 45L * 60 * 1000000
    val byUser = Tables.events(spark, sfSmoke)
      .select($"user_id", $"ts", $"value").collect()
      .groupBy(_.getLong(0))
    val expected = byUser.toSeq.flatMap { case (u, rows) =>
      val evs = rows.map(r => (r.getTimestamp(1).getTime * 1000 +
        (r.getTimestamp(1).getNanos / 1000) % 1000, r.getDouble(2))).sortBy(_._1)
      val sessions = evs.foldLeft(Vector.empty[Vector[(Long, Double)]]) {
        case (acc, e) if acc.nonEmpty && e._1 - acc.last.last._1 < gapUs =>
          acc.init :+ (acc.last :+ e)
        case (acc, e) => acc :+ Vector(e)
      }
      sessions.dropRight(1).map(sess => (u, sess.length,
        sess.map(x => BigDecimal(x._2 * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum / 100.0))
    }.sortBy(x => (x._1, x._2))
    val gotTuples = got.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Int]("n_events"), r.getAs[Double]("total_value")))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(gotTuples.length == expected.length)
    assert(gotTuples.map(t => (t._1, t._2)).sorted == expected.map(t => (t._1, t._2)).sorted)
    assert(math.abs(gotTuples.map(_._3).sum - expected.map(_._3).sum) < 1e-9)
  }

  test("st09 left-outer stream join: null rows only for watermark-proven non-matches") {
    import org.apache.spark.sql.functions._
    val rows = Streams.st09(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val idx = rows.head.fieldIndex("p_event")
    val nullPadded = rows.filter(_.isNullAt(idx))
    assert(nullPadded.nonEmpty, "expected watermark-emitted null rows")
    // matched pairs equal the batch inner interval join
    val ev = Tables.events(spark, sfSmoke)
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_event"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event"), $"user_id".as("p_user"), $"ts".as("p_ts"))
    val matchedBatch = c.join(p, expr(
      "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"))
      .select($"c_event", $"p_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val matchedStream = rows.filterNot(_.isNullAt(idx))
      .map(r => (r.getAs[Long]("c_event"), r.getAs[Long]("p_event"))).toSet
    assert(matchedStream == matchedBatch)
    // clicks inside the final watermark horizon stay open: never null-padded
    val wm = ev.filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type").agg(max($"ts").as("m")).collect()
      .map(_.getTimestamp(1).getTime).min - 3600 * 1000L
    val clickTs = c.collect().map(r => r.getLong(0) -> r.getTimestamp(2).getTime).toMap
    nullPadded.foreach { r =>
      val ct = clickTs(r.getAs[Long]("c_event"))
      assert(ct + 30 * 60000L < wm, s"click at $ct null-padded inside the horizon (wm=$wm)")
    }
  }

  test("st07 stream-static enrich equals the batch join+rollup") {
    val streamed = Streams.st07(spark, sfSmoke).collect()
    val dim = Tables.customer(spark, sfSmoke)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val batch = Tables.events(spark, sfSmoke)
      .join(dim, Seq("user_id"))
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n_events"), Exact.dsum($"value").as("total_value"))
      .orderBy($"c_mktsegment", $"event_type")
      .collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("RocksDB state store produces the same rollup as the default provider") {
    // the large-state production path: RocksDB keeps streaming state
    // off-heap/on-disk, so state size is bounded by disk, not executor
    // memory — at 10^9 keys the HDFS-backed in-memory provider OOMs long
    // before the operator logic is wrong. Same query, same answer.
    val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    val defaultRows = graft.streaming.Streams.st01(s, sfSmoke).collect().toSeq
    try {
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocksRows = graft.streaming.Streams.st01(s, sfSmoke).collect().toSeq
      assert(rocksRows == defaultRows)
      assert(rocksRows.nonEmpty)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  test("st05 streaming ingest dedup converges to the batch dedup ledger exactly") {
    val streamed = Streams.st05(spark, sfSmoke).collect()
    val batch = graft.ops.Dedup.d01(spark, sfSmoke).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("foreachBatch maintains a serving table via Warehouse.upsert per micro-batch") {
    // the streaming → warehouse integration path: each micro-batch merges
    // into the serving table with last-wins upsert semantics; the batch
    // frame is only valid inside its batch, so the merged state is
    // materialized (localCheckpoint — stand-in for the parquet table swap)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    var table = Seq((1L, "init")).toDF("id", "v").localCheckpoint()
    val q = input.toDF().toDF("id", "v").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        table = graft.Warehouse.upsert(table, batch, "id").localCheckpoint()
      }
      .start()
    try {
      input.addData((1L, "updated"), (2L, "new"))
      q.processAllAvailable()
      input.addData((2L, "newer"), (3L, "third"))
      q.processAllAvailable()
    } finally q.stop()
    val state = table.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "updated", 2L -> "newer", 3L -> "third"))
  }

  test("append-mode emission boundary: a window whose end EQUALS the watermark is emitted") {
    // st03's oracle encodes `window_end <= max(ts) − delay`; this pins
    // Spark's finalization rule at exact equality so the oracle can't
    // silently drift off-by-one on boundary-aligned data
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes")).agg(Exact.dsum($"v").as("s"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("boundary_out").start()
    try {
      // window [00:00, 00:10); max ts 00:20 → watermark = 00:10 == window end
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        (Timestamp.valueOf("2024-01-01 00:20:00"), 2.0))
      q.processAllAvailable()
      val starts = spark.table("boundary_out")
        .select(date_format($"window.start", "HH:mm").as("w")).collect().map(_.getString(0))
      assert(starts.toSeq == Seq("00:00"), starts.mkString(","))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = Streams.dedupStream(
      input.toDS().toDF("event_id", "ts", "value"), horizon = "10 minutes")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        (1L, new Timestamp(t0), 1.0),
        (1L, new Timestamp(t0 + 1000), 1.0), // duplicate id, same batch
        (2L, new Timestamp(t0 + 2000), 2.0),
      )
      q.processAllAvailable()
      input.addData((1L, new Timestamp(t0 + 5000), 1.0)) // re-delivery, next batch
      input.addData((3L, new Timestamp(t0 + 6000), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attach to signups within the window") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val s = signups.toDS().toDF("s_user", "s_ts").withWatermark("s_ts", "1 hour")
    val p = purchases.toDS().toDF("p_user", "p_ts", "amount")
      .withWatermark("p_ts", "1 hour")
    // watermarks + the interval bound make the join state PRUNABLE: signup
    // rows age out once p_ts can no longer reach them (unbounded
    // stream-stream equi-join state would grow forever)
    val joined = p.join(s,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 30 MINUTES"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join_out").start()
    try {
      val t0 = 1700000000000L
      signups.addData((1L, new Timestamp(t0)), (2L, new Timestamp(t0)))
      purchases.addData(
        (1L, new Timestamp(t0 + 10 * 60000), 5.0),  // within 30 min → joins
        (2L, new Timestamp(t0 + 45 * 60000), 7.0),  // outside window → dropped
        (3L, new Timestamp(t0 + 5 * 60000), 9.0),   // no signup → dropped
      )
      q.processAllAvailable()
      val rows = spark.table("ss_join_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("p_user") == 1L &&
        rows(0).getAs[Double]("amount") == 5.0)
    } finally q.stop()
  }

  test("sessionize closes sessions at the inactivity gap (streaming, stateful)") {
    val t0 = 1700000000000L
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val sessions = Streams.sessionize(input.toDS(), gapMinutes = 10)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out").start()
    try {
      // batch 1: user 1 has two events 5 min apart (same session), then a
      // 30-min gap event that closes it on batch 2
      input.addData(
        Streams.Event(1L, new Timestamp(t0), 10.0),
        Streams.Event(1L, new Timestamp(t0 + 5 * 60000), 5.0),
        Streams.Event(2L, new Timestamp(t0), 1.0),
      )
      q.processAllAvailable()
      input.addData(Streams.Event(1L, new Timestamp(t0 + 35 * 60000), 2.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Streams.Session].collect()
      assert(closed.length == 1) // only user 1's first session closed so far
      val s = closed.head
      assert(s.userId == 1L && s.nEvents == 2 && s.totalValue == 15.0)
      assert(s.sessionEnd.getTime - s.sessionStart.getTime == 5 * 60000)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: replays suppressed in-horizon, key state evicted after") {
    // the st11 operator's TTL contract, pinned batch-by-batch:
    //  b1: k1 emitted; b2: in-horizon replay of k1 dropped, k2 emitted and
    //  the watermark advanced far past k1's expiry; b3: k1 REAPPEARS with
    //  a fresh ts → emitted again (state was evicted — dedup is per
    //  horizon, not forever; that bounded memory IS the operator's point)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ddww_out").start()
    def emitted(): Seq[(Long, Long)] =
      spark.table("ddww_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq.sorted
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    try {
      input.addData((1L, new Timestamp(t0)))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, t0)))
      input.addData((1L, new Timestamp(t0 + 60000)), // replay, in horizon
        (2L, new Timestamp(t0 + 30 * 60000))) // advances watermark past k1
      q.processAllAvailable()
      assert(emitted() == Seq((1L, t0), (2L, t0 + 30 * 60000)))
      input.addData((1L, new Timestamp(t0 + 31 * 60000))) // fresh arrival post-expiry
      q.processAllAvailable()
      assert(emitted() ==
        Seq((1L, t0), (1L, t0 + 31 * 60000), (2L, t0 + 30 * 60000)))
    } finally q.stop()
  }
}
