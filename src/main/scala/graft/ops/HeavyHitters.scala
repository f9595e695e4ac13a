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

  def all: Seq[Q] = Seq(
    Q("hh01_heavy_hitters", hh01, Some(hh01Oracle)),
    Q("hh02_heavy_hitters_stream", hh02, Some(hh01Oracle)),
  )
}
