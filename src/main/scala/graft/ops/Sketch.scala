package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * frequency summary that complements the repo's other sketches
  * (Misra–Gries keeps the top-k KEYS, q46's KLL keeps QUANTILES; Count-Min
  * answers point frequency queries for ANY key after one pass).
  *
  * Why it matters at 100 TB: the sketch is a D×W integer counter matrix
  * (here 4×512 = 2 KB of longs) whose cells are plain SUMs — associative
  * and commutative, so Spark's partial aggregation collapses each map task
  * to ≤ D·W rows before the exchange and ANY merge tree yields the
  * identical sketch. Estimating a key's frequency costs D lookups; the
  * classic guarantees hold deterministically on the overcount side
  * (est ≥ exact always; est ≤ exact + εn with ε = e/W at probability
  * 1 − e^−D over hash choice). Per-token frequencies over a petabyte
  * token stream — stopword discovery, df caps for [[TextAnalysis]]'s
  * inverted indexes, hot-key prediction for [[Skew]] salting — fit in a
  * broadcast variable instead of a key-cardinality shuffle.
  *
  * Determinism: rows are seeded md5 buckets
  * (`conv(substring(md5(seed:token),1,8),16,10) % W` — the repo-standard
  * recomputable-hash pattern, Dedup.scala d02/d03), so the DuckDB oracle
  * rebuilds the ENTIRE sketch cell-for-cell and the estimates hash-match
  * bit-for-bit. No RNG, no engine-internal hash.
  */
object Sketch {

  val Depth = 4 // independent hash rows
  val Width = 512 // buckets per row

  /** sk01 — Count-Min over the full document token stream, audited
    * against exact counts for the 20 most frequent tokens: the gated
    * output carries each token's exact count, its sketch estimate, and
    * the (provably non-negative) overcount.
    *
    * Scale shape: the token pass is narrow (split + explode), the sketch
    * aggregation's partial rows are capped at D·W per task regardless of
    * token cardinality, and the probe side is a broadcast of 20·D
    * coordinate rows against the ≤ D·W counter relation. The exact-count
    * branch exists for the AUDIT (the oracle needs ground truth); a
    * production deployment ships only the sketch branch.
    */
  /** The document token stream: normalized words, empties dropped. Spread
    * to session width before the explode (guide §2.5 input skew — the
    * single-split corpus would otherwise run the whole token fan-out and
    * its map-side partial aggregation in one task; identity at real split
    * counts).
    */
  def tokens(docs: DataFrame): DataFrame = graft.util.Spread
    .toWidth(docs.select(col("doc_id"), col("text")), col("doc_id"))
    .select(explode(split(TextAnalysis.normalize(col("text")), " ")).as("token"))
    .filter(col("token") =!= "")

  private def bucket(seed: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), col("token"))), 1, 8), 16, 10)
      .cast("long") % Width

  /** Per-token exact counts — the compressed proxy the sketch is built
    * from: Depth md5 bucketings per DISTINCT token instead of per token
    * OCCURRENCE (guide §2.3 "aggregate before you shuffle"; the cell sums
    * are identical because hashing is a pure function of the token, so
    * grouping occurrences first just reassociates the addition).
    */
  def tokenCounts(toks: DataFrame): DataFrame =
    toks.groupBy(col("token")).agg(count(lit(1)).as("tc"))

  /** The sketch from per-token counts: one (seed, bucket, cnt) row per
    * non-empty cell.
    */
  def countersFromCounts(tcounts: DataFrame): DataFrame = tcounts
    .select(explode(array((0 until Depth).map(lit): _*)).as("seed"),
      col("token"), col("tc"))
    .select(col("seed"), bucket(col("seed")).as("bucket"), col("tc"))
    .groupBy(col("seed"), col("bucket")).agg(sum(col("tc")).as("cnt"))

  /** The sketch itself: one (seed, bucket, cnt) row per non-empty cell.
    * Cells are SUMs, so sketches over disjoint inputs merge by cell-wise
    * addition into exactly the whole-input sketch (SketchSpec pins this).
    */
  def counters(toks: DataFrame): DataFrame =
    countersFromCounts(tokenCounts(toks))

  def sk01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cache the per-token counts (vocabulary-sized), not the raw token
    // stream (corpus-sized): both the sketch and the top-20 audit derive
    // from the counts alone
    val tcounts = graft.util.Eager.cached(
      tokenCounts(tokens(Tables.documents(s, dir))))
    val cm = countersFromCounts(tcounts)
    val top = tcounts.select($"token", $"tc".as("exact_n"))
      .orderBy($"exact_n".desc, $"token").limit(20)
    top
      .select($"token", $"exact_n",
        explode(array((0 until Depth).map(lit): _*)).as("seed"))
      .select($"token", $"exact_n", $"seed", bucket($"seed").as("bucket"))
      .join(broadcast(cm), Seq("seed", "bucket"))
      .groupBy($"token", $"exact_n")
      .agg(min($"cnt").as("cm_est"))
      .select($"token", $"exact_n", $"cm_est",
        ($"cm_est" - $"exact_n").as("overcount"))
      .orderBy($"exact_n".desc, $"token")
  }

  val sk01Oracle: String =
    s"""WITH toks AS (
       |  SELECT w AS token FROM (
       |    SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
       |    FROM documents) WHERE w <> ''),
       |counters AS (
       |  SELECT seed, ('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' || token), 1, 8))::BIGINT % $Width AS bucket,
       |    COUNT(*) AS cnt
       |  FROM toks, (SELECT unnest(range(0, $Depth)) AS seed)
       |  GROUP BY seed, bucket),
       |top AS (
       |  SELECT token, COUNT(*) AS exact_n FROM toks GROUP BY token
       |  ORDER BY exact_n DESC, token LIMIT 20),
       |probe AS (
       |  SELECT token, exact_n, seed,
       |    ('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' || token), 1, 8))::BIGINT % $Width AS bucket
       |  FROM top, (SELECT unnest(range(0, $Depth)) AS seed))
       |SELECT token, exact_n, MIN(cnt) AS cm_est, MIN(cnt) - exact_n AS overcount
       |FROM probe JOIN counters USING (seed, bucket)
       |GROUP BY token, exact_n
       |ORDER BY exact_n DESC, token""".stripMargin

  /** sk02 — HLL CARDINALITY sketches with a shard-merge audit (Apache
    * DataSketches HllSketch via Spark's `hll_sketch_agg` /
    * `hll_union_agg`): per event type, distinct users are sketched
    * independently per hash-shard and the shard sketches UNIONED — the
    * mergeability that makes HLL the 100 TB distinct-count workhorse —
    * and the gate pins the statistical contract: BOTH the merged and the
    * globally-built estimate must land inside a 5% envelope of the exact
    * count (lgK=12 ⇒ σ ≈ 1.6%, so 5% ≈ 3σ; everything is deterministic
    * given the data — no RNG — hence gateable).
    *
    * Deliberately NOT gated: bitwise equality of the merged and global
    * estimates. DataSketches' union gadget can legitimately land a
    * different (equally valid) register state than a directly-built
    * sketch once past sparse mode — asserting equality passes at tiny
    * cardinality and breaks at scale (observed: equal at sf0.01's 150
    * users, divergent-but-in-envelope at sf0.1's 1500).
    *
    * Why it matters at scale: COUNT(DISTINCT) is a key-cardinality
    * shuffle; the sketch is ~2^lgK bytes per group REGARDLESS of
    * cardinality, partial-aggregates map-side, and merges associatively
    * across shards / days / clusters — the exact branch here exists only
    * as the audit's ground truth. The estimate itself is not oracle-
    * recomputable (engine-internal sketch), so the gate emits the exact
    * count plus the two envelope FACTS, the sk-family pattern (cf.
    * s02/s04/s06 recall gates).
    */
  def sk02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type", $"user_id")
    val sharded = ev
      .withColumn("shard", pmod(xxhash64($"user_id"), lit(8)))
      .groupBy($"event_type", $"shard")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_merged"))
    val global = ev
      .groupBy($"event_type")
      .agg(
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("est_global"),
        countDistinct($"user_id").as("n_exact"))
    global.join(sharded, Seq("event_type"))
      .select($"event_type", $"n_exact",
        (abs($"est_merged" / $"n_exact" - 1.0) <= 0.05).as("merged_in_envelope"),
        (abs($"est_global" / $"n_exact" - 1.0) <= 0.05).as("global_in_envelope"))
      .orderBy($"event_type")
  }

  val sk02Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
      |  TRUE AS merged_in_envelope, TRUE AS global_in_envelope
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def all: Seq[Q] = Seq(
    Q("sk01_countmin", sk01, Some(sk01Oracle)),
    Q("sk02_hll_distinct", sk02, Some(sk02Oracle)),
  )
}
