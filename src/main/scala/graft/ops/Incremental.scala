package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.queries.Q

/** Incremental materialized-view maintenance: keep a rollup current by
  * merging PARTIAL aggregation states instead of recomputing from the full
  * fact history. The state per group is (decimal sum, count) — both
  * associative and commutative, so merging the base state with a delta
  * batch's state is algebraically identical to aggregating base ∪ delta
  * from scratch, at the cost of scanning only the delta. This is the same
  * partial/final split Spark's own HashAggregate performs inside one query,
  * lifted across queries/days: the 100 TB pattern where the nightly fact
  * load touches the rollup in O(delta), not O(history).
  *
  * Decimal (not double) partials are what make the merge EXACT: decimal
  * addition is associative, so any split of the history into batches —
  * including none — produces bit-identical merged sums, which is also why
  * the DuckDB oracle can simply recompute the whole rollup in one pass.
  */
object Incremental {

  private val S = DecimalType(18, 4)

  /** Partial weekly-rollup state of one event batch: group keys + mergeable
    * (sum, count). Kept in decimal — the merge stays exact.
    */
  def weeklyPartial(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("week", col("ts")).as("week"),
        col("event_type"))
      .agg(
        sum(col("value").cast(S)).as("sum_part"),
        count(lit(1)).as("n_part"),
      )

  /** Merge any number of partial states into the final rollup form. */
  def mergeWeekly(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(col("week"), col("event_type"))
      .agg(
        sum(col("sum_part")).cast("double").as("total_value"),
        sum(col("n_part")).cast(LongType).as("n_events"),
      )
      .select(
        date_format(col("week"), "yyyy-MM-dd").as("week_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("week_start"), col("event_type"))

  /** mv01 — the maintenance cycle end-to-end: materialize the base state
    * (history before the split date), compute the delta batch's state (the
    * "new day" of facts), merge. The gate pins that the merged view equals
    * the full recompute the oracle performs — i.e. the incremental path
    * loses nothing. The split is a fixed date so the query is
    * deterministic; in production it's the load watermark, and the base
    * partial lives as a table (here it's recomputed because the gate is a
    * single query — the TOPOLOGY under test is partial-merge, which is
    * split-invariant by construction and additionally spec-checked across
    * different split points).
    */
  def mv01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val split = lit("2024-01-16").cast("timestamp")
    val base = weeklyPartial(ev.filter($"ts" < split))
    val delta = weeklyPartial(ev.filter($"ts" >= split))
    mergeWeekly(base, delta)
  }

  val mv01Oracle: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // dq03 — snapshot diff: row-level added/removed/changed between versions
  // ---------------------------------------------------------------------

  /** dq03 — the row-level "what changed since yesterday" audit between two
    * versions of a keyed table: a full-outer join on the primary key
    * classifies every row as added (new only), removed (old only), or
    * changed (both sides present, content differs — null-safe compare), and
    * the unchanged majority is DROPPED, never materialized: the output is
    * delta-cardinality, not table-cardinality. mv01 maintains an aggregate
    * in O(delta) given the delta; dq03 is how you GET that delta (and the
    * audit trail) when the upstream hands you full snapshots instead of a
    * change feed.
    *
    * Shape at scale: both snapshots project to (key, content) before the
    * join, so only those columns cross the wire; stored bucketed/sorted by
    * the key, the full-outer join is a zero-shuffle sort-merge. For wide
    * rows, production compares a per-side content fingerprint (xxhash64 of
    * the concatenated columns) instead of each column; the gate compares
    * the real column because engine hash functions differ and the oracle
    * must reproduce every byte.
    *
    * The two "snapshots" here derive deterministically from one table so
    * the oracle can rebuild them: old = keys not ≡ 0 (mod 11), new = keys
    * not ≡ 0 (mod 10) with a price bump on keys ≡ 0 (mod 7) — yielding all
    * three classes (adds where 11 | key but 10 ∤ key, removals vice versa,
    * changes on the surviving 7 | key rows). The bump is a bare IEEE
    * multiply (no rounding) so both engines produce the identical double.
    */
  def dq03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val old = orders.filter($"o_orderkey" % 11 =!= 0)
      .select($"o_orderkey".as("k_old"), $"o_totalprice".as("old_price"))
    val nw = orders.filter($"o_orderkey" % 10 =!= 0)
      .select(
        $"o_orderkey".as("k_new"),
        when($"o_orderkey" % 7 === 0, $"o_totalprice" * lit(1.1))
          .otherwise($"o_totalprice").as("new_price"))
    old.join(nw, $"k_old" === $"k_new", "full_outer")
      .select(
        when($"k_old".isNull, lit("added"))
          .when($"k_new".isNull, lit("removed"))
          .when(!($"old_price" <=> $"new_price"), lit("changed"))
          .as("change_type"),
        coalesce($"k_old", $"k_new").as("o_orderkey"),
        $"old_price", $"new_price")
      .filter($"change_type".isNotNull)
      .orderBy($"change_type", $"o_orderkey")
  }

  val dq03Oracle: String =
    """WITH old AS (
      |  SELECT o_orderkey AS k_old, o_totalprice AS old_price
      |  FROM orders WHERE o_orderkey % 11 <> 0
      |), nw AS (
      |  SELECT o_orderkey AS k_new,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
      |         ELSE o_totalprice END AS new_price
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |), d AS (
      |  SELECT
      |    CASE WHEN k_old IS NULL THEN 'added'
      |         WHEN k_new IS NULL THEN 'removed'
      |         WHEN old_price IS DISTINCT FROM new_price THEN 'changed'
      |    END AS change_type,
      |    COALESCE(k_old, k_new) AS o_orderkey, old_price, new_price
      |  FROM old FULL OUTER JOIN nw ON k_old = k_new
      |)
      |SELECT change_type, o_orderkey, old_price, new_price
      |FROM d WHERE change_type IS NOT NULL
      |ORDER BY change_type, o_orderkey""".stripMargin

  /** i01 — INCREMENTAL DEDUP-INDEX maintenance: extend mv01's
    * partial-state argument from rollups to the MinHash near-dup index.
    * The corpus is split into a BASE snapshot (doc_id < 400, whose
    * signatures a production system has already materialized) and a DELTA
    * batch of new arrivals; only the delta is re-signed, and the arriving
    * docs probe the merged band index. Per-doc signatures are pure
    * functions of the doc (no corpus-global state — the permutation
    * family is fixed), so base signatures are REUSABLE by construction
    * and candidate generation over base ∪ delta via band buckets is
    * algebraically identical to a from-scratch rebuild — which is exactly
    * what the gate proves: the query emits every candidate pair touching
    * a delta doc, hash-matched against the full-rebuild oracle (d02's
    * SQL restricted to pairs with a new endpoint).
    *
    * 100 TB shape: the nightly ingest signs O(delta) docs, the band join
    * probes buckets that contain a delta member only (the base×base pairs
    * already live in yesterday's candidate log — deliberately excluded
    * here), and nothing base-cardinality is recomputed. Base signatures
    * arrive through the same `minhashSignatures` call for test economy;
    * in production they are a parquet read — the plan downstream of the
    * two inputs is identical.
    */
  def i01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val isNew = col("doc_id") >= 400
    // base signatures: the already-materialized index (reused, not re-signed)
    val baseSigs = Dedup.minhashSignatures(docs.filter(!isNew))
    // delta: only the new arrivals are signed this run
    val deltaSigs = Dedup.minhashSignatures(docs.filter(isNew))
    val merged = graft.util.Eager.cached(baseSigs.unionByName(deltaSigs))
    Dedup.minhashCandidates(merged)
      .filter($"a" >= 400 || $"b" >= 400) // new-endpoint pairs only
      .orderBy($"a", $"b")
  }

  // def (not val): composes Dedup's oracle fragments across the object
  // boundary — see Dedup.c06Oracle for the init-cycle failure a val risks
  def i01Oracle: String =
    Dedup.d02OracleWhere(Some("x.doc_id >= 400 OR y.doc_id >= 400"))

  /** i02 — INCREMENTAL ANN-INDEX maintenance: i01's O(delta) argument
    * lifted from the MinHash band index to d07's sign-LSH near-dup index —
    * the nightly-embedding-ingest shape. The base corpus's band signatures
    * are the STORED index (per-vector signatures are pure functions of the
    * vector — IncrementalSpec pins purity, so reuse is sound); only the
    * arriving delta batch is signed (one narrow mapPartitions pass over
    * O(delta) rows), and delta signatures probe the MERGED band index for
    * candidate pairs with a new endpoint, then exact-cosine verify at
    * d07's 0.9 floor.
    *
    * The delta here is [[Similarity.plantNearDups]]'s planted copies — the
    * realistic case where new arrivals near-duplicate existing content —
    * so the gate is sharp: the oracle recomputes the exact all-pairs sweep
    * at the same floor RESTRICTED to new-endpoint pairs (a < b and planted
    * ids sit above [[Similarity.PlantOffset]], so `b ≥ offset` ⟺ at least
    * one new endpoint), and a hash match proves the incremental probe of
    * the merged index lost NOTHING vs a full rebuild — d07's pigeonhole
    * banding argument, inherited unchanged because signatures don't depend
    * on what else is in the index.
    *
    * Scale shape: nothing base-cardinality is recomputed — base signatures
    * are index artifacts; the bucket join shuffles delta-side bands
    * against bucket occupancy (never corpus²); the verify join touches
    * only candidate ids.
    */
  def i02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val base = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val aug = graft.util.Eager.cached(Similarity.plantNearDups(base))
    val delta = aug.filter($"vec_id" >= Similarity.PlantOffset)
    def bands(e: DataFrame): DataFrame =
      Similarity.signBandKeys(e, planes = 128, bands = 16)
        .select(col("vec_id"), posexplode(col("band_keys")).as(Seq("band", "key")))
    val baseIdx = bands(base) // the stored index, reused as-is
    val deltaIdx = graft.util.Eager.cached(bands(delta)) // O(delta) signing
    val merged = baseIdx.unionByName(deltaIdx)
    val cands = deltaIdx.alias("d")
      .join(merged.alias("m"),
        col("d.band") === col("m.band") && col("d.key") === col("m.key") &&
          col("d.vec_id") =!= col("m.vec_id"))
      .select(
        least(col("d.vec_id"), col("m.vec_id")).as("a"),
        greatest(col("d.vec_id"), col("m.vec_id")).as("b"))
      .distinct()
    cands
      .join(aug.select($"vec_id".as("a"), $"embedding".as("ea")), Seq("a"))
      .join(aug.select($"vec_id".as("b"), $"embedding".as("eb")), Seq("b"))
      .select($"a", $"b", Similarity.cosine($"ea", $"eb").as("cosine"))
      .filter($"cosine" >= Similarity.NearDupFloor)
      .orderBy($"a", $"b")
  }

  /** d07's exact all-pairs oracle restricted to new-endpoint pairs. */
  val i02Oracle: String =
    """WITH base AS (SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding,1) AS i
      |              FROM embeddings),
      |v AS (SELECT vec_id, e, i FROM base
      |      UNION ALL
      |      SELECT vec_id + 100000 AS vec_id,
      |             CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE e END AS e, i
      |      FROM base WHERE vec_id % 10 = 0),
      |norms AS (SELECT vec_id, SUM(CAST(e AS DOUBLE)*CAST(e AS DOUBLE) ORDER BY i) AS n2
      |          FROM v GROUP BY vec_id),
      |dots AS (SELECT x.vec_id AS a, y.vec_id AS b,
      |           SUM(CAST(x.e AS DOUBLE) * CAST(y.e AS DOUBLE) ORDER BY x.i) AS dot
      |         FROM v x JOIN v y ON x.i = y.i AND x.vec_id < y.vec_id
      |         WHERE y.vec_id >= 100000
      |         GROUP BY 1, 2)
      |SELECT a, b, cosine FROM (
      |  SELECT a, b, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
      |  FROM dots JOIN norms na ON a = na.vec_id JOIN norms nb ON b = nb.vec_id)
      |WHERE cosine >= 0.9
      |ORDER BY a, b""".stripMargin

  /** i03 — TOMBSTONE-AWARE index maintenance: i01/i02 prove the ADD path
    * is O(delta); this is the DELETE path — the erasure request (gv01's
    * scope query decides WHO; this is the index-side propagation). Every
    * 13th doc is tombstoned; the stored MinHash index (per-doc signature
    * rows) is pruned by ONE anti-join on the tombstone set — no survivor
    * is re-signed, no bucket is rebuilt — and candidates regenerate from
    * the pruned index. The gate hash-matches a FROM-SCRATCH rebuild on
    * the surviving corpus, which proves the two delete-correctness
    * properties at once: NO GHOSTS (no pair touches a deleted doc — the
    * leak a forgotten index row causes long after the raw doc is gone)
    * and NO COLLATERAL (every surviving pair is still found: a pair's
    * bucket co-membership depends only on its OWN two signatures, so
    * removing other docs from a bucket never unlinks it — the algebraic
    * reason pruning ≡ rebuild, and the reason the oracle can be d02's
    * full-corpus pair sweep restricted to live×live endpoints).
    *
    * 100 TB shape: the prune is one broadcast anti-join of the (small)
    * tombstone set against the index scan — O(index) read, O(live)
    * write, zero signature computation; with the index stored
    * hash-bucketed by doc_id it is partition-local. The candidate join
    * after pruning is d02's unchanged banding plan.
    */
  def i03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val storedIndex = Dedup.minhashSignatures(docs) // yesterday's artifact
    val tombstones = docs.filter($"doc_id" % 13 === 0).select($"doc_id")
    val pruned = storedIndex.join(broadcast(tombstones), Seq("doc_id"), "left_anti")
    Dedup.minhashCandidates(pruned)
      .orderBy($"a", $"b")
  }

  def i03Oracle: String =
    Dedup.d02OracleWhere(Some("x.doc_id % 13 <> 0 AND y.doc_id % 13 <> 0"))

  /** i04 — INCREMENTAL POSTINGS (lexical-index) MAINTENANCE: the ir-family
    * retrieval ops consume a term-keyed postings relation; at production
    * scale that index is a STORED artifact maintained nightly, not rebuilt
    * from the corpus. One maintenance round: prune tombstoned documents
    * from the stored postings with ONE anti-join (O(index), never
    * O(corpus)), tokenize ONLY the delta batch into new postings rows,
    * union, and refresh the term statistics (df / total tf) with a
    * term-grain partial agg over the index. Corpus text outside the delta
    * is never rescanned.
    *
    * Batch split mirrors i01/i03's conventions: the stored index covers
    * doc_id % 10 ≠ 9 (yesterday's corpus), tonight's delta is
    * doc_id % 10 = 9, tombstones are doc_id % 13 = 0 applied to the
    * stored index (a delta arrival supersedes a same-id tombstone).
    *
    * Gate: top-20 terms of the MAINTAINED index by (df, term). The oracle
    * rebuilds the index FROM SCRATCH over the live document set, so the
    * hash match proves maintenance ≡ rebuild — no ghost postings survive
    * a tombstone, no delta posting is missed.
    */
  def i04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    def postings(d: DataFrame): DataFrame = d
      .select($"doc_id", explode(filter(
        split(TextAnalysis.normalize($"text"), " "), x => x =!= "")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val stored = postings(docs.filter($"doc_id" % 10 =!= 9)) // yesterday's artifact
    val tombstones = docs.filter($"doc_id" % 13 === 0).select($"doc_id")
    val delta = postings(docs.filter($"doc_id" % 10 === 9))
    stored.join(broadcast(tombstones), Seq("doc_id"), "left_anti")
      .unionByName(delta)
      .groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"), sum($"tf").as("total_tf"))
      .orderBy($"df".desc, $"term")
      .limit(20)
  }

  val i04Oracle: String =
    """WITH live AS (
      |  SELECT * FROM documents
      |  WHERE (doc_id % 10 = 9) OR (doc_id % 13 <> 0)),
      |p AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      x -> x <> '')) AS term
      |  FROM live),
      |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM p GROUP BY 1, 2)
      |SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(SUM(tf) AS BIGINT) AS total_tf
      |FROM tf GROUP BY term
      |ORDER BY df DESC, term LIMIT 20""".stripMargin

  /** i05 — incremental maintenance of the ppl01 LANGUAGE-MODEL state.
    * The KN bigram LM's only corpus-cardinality artifact is the bigram
    * count table (w1, w2, c12) — a purely ADDITIVE state, so a nightly
    * corpus increment maintains it by merging the stored counts with the
    * delta batch's counts in O(delta) text. The derived model relations
    * the scorer actually joins (context totals c1, continuation-type
    * counts n1l — the KN discount inputs) are NOT mergeable at their own
    * granularity (n1l is a distinct-count over w2), and this query is the
    * proof that it doesn't matter: they re-derive from the MERGED bigram
    * state in model-cardinality time, never touching the base corpus.
    *
    * Engine path: base counts (doc_id % 7 ≠ 0) + delta counts (% 7 = 0)
    * over the ppl01 train split, merged by sum, then the unigram stats.
    * The oracle recomputes the same stats from the FULL train corpus in
    * one pass and never mentions the split — a hash match proves
    * merge ≡ rebuild exactly (the mv01 posture; exact because bigram
    * counts are integers, so the merge is associative with no float
    * caveat).
    */
  def i05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"lang", $"text")
    val isDelta = $"doc_id" % 7 === 0
    def counts(d: DataFrame): DataFrame =
      LangModel.bigrams(d).filter($"trained_on")
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val base = counts(docs.filter(!isDelta)) // yesterday's stored state
    val delta = counts(docs.filter(isDelta)) // tonight's increment
    base.unionByName(delta)
      .groupBy($"w1", $"w2").agg(sum($"c12").as("c12")) // state merge
      .groupBy($"w1") // model-cardinality re-derivation of the KN inputs
      .agg(sum($"c12").cast(LongType).as("c1"), count(lit(1)).as("n1l"))
      .orderBy($"w1")
  }

  /** Full single-pass rebuild — deliberately split-free. */
  val i05Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM documents
       |  WHERE ('0x' || substring(md5('ppl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |        % ${LangModel.TrainMod} = 0),
       |bg AS (
       |  SELECT ws[i] AS w1, ws[i+1] AS w2
       |  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
       |        FROM d WHERE len(ws) >= 2)),
       |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2)
       |SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n1l
       |FROM big GROUP BY 1 ORDER BY w1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("mv01_incremental_rollup", mv01, Some(mv01Oracle)),
    Q("dq03_snapshot_diff", dq03, Some(dq03Oracle)),
    Q("i01_incremental_dedup_index", i01, Some(i01Oracle)),
    Q("i02_incremental_ann_index", i02, Some(i02Oracle)),
    Q("i03_tombstone_index_prune", i03, Some(i03Oracle)),
    Q("i04_incremental_postings", i04, Some(i04Oracle)),
    Q("i05_incremental_lm_counts", i05, Some(i05Oracle)),
  )
}
