package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Sampling operators for training-data curation.
  *
  * The workhorse is CONTENT-HASH sampling: a row is kept iff the md5 of its
  * key falls below a threshold prefix. Unlike `rand()`/Bernoulli samplers,
  * membership is a pure function of the key — identical across engines,
  * reruns, task retries, partitionings, and cluster sizes, and it degrades
  * to set-stable incremental samples (a 30% sample is a superset of the 20%
  * one). That reproducibility is what makes it oracle-checkable at all.
  */
object Sampling {

  /** Keep ≈ `percent`% of rows, decided by md5(key) < thresholdPrefix. */
  def hashSampleFilter(key: Column, percent: Int): Column = {
    require(percent > 0 && percent < 100, "percent in (0, 100)")
    // first 8 hex chars span 16^8 values uniformly; threshold = fraction
    val threshold = f"${(percent / 100.0 * 0xFFFFFFFFL).toLong}%08x"
    substring(md5(key.cast("string")), 1, 8) < threshold
  }

  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashSampleFilter(key, percent))

  /** Per-stratum fractions via Spark's `sampleBy` (seeded Bernoulli; not
    * engine-portable → spec-checked, not oracle-checked).
    */
  def stratifiedSample(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)

  /** q38 — deterministic 30% content-hash sample of documents, summarized
    * per language. The oracle applies the identical md5-prefix rule.
    */
  def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hashSample(Tables.documents(s, dir), $"doc_id", percent = 30)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"), min($"doc_id").as("first_id"))
      .orderBy($"lang")
  }

  val q38Oracle: String = {
    val threshold = f"${(30 / 100.0 * 0xFFFFFFFFL).toLong}%08x"
    s"""SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id
       |FROM documents
       |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$threshold'
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // c03 — source-weighted corpus mixing
  // ---------------------------------------------------------------------

  /** Per-source sampling weights for the mixing demo: upweight the "high
    * quality" sources, downsample the tail — the standard pre-training
    * mixture move (books×2, common-crawl×0.3, …) expressed as keep-rates.
    */
  val MixWeights: Seq[(Seq[String], Int)] = Seq(
    (Seq("src0", "src1", "src2", "src3"), 90),
    (Seq("src4", "src5", "src6", "src7", "src8", "src9"), 50),
    (Seq("src10", "src11", "src12", "src13", "src14",
      "src15", "src16", "src17", "src18", "src19"), 10),
  )

  private def pctThreshold(percent: Int): String =
    f"${(percent / 100.0 * 0xFFFFFFFFL).toLong}%08x"

  /** Keep-filter implementing a per-source mixture: row kept iff
    * md5(doc_id) falls under its source's rate threshold. Same
    * content-hash determinism as [[hashSampleFilter]] — the mixture a
    * 1000-executor run materializes is byte-identical to any rerun or
    * resize, and downweighting a source later yields a strict subset
    * (stable incremental re-mixes, no reshuffling of what was kept).
    */
  def mixFilter(key: Column, source: Column,
      weights: Seq[(Seq[String], Int)]): Column = {
    val threshold = weights.foldLeft(lit("00000000")) {
      case (acc, (srcs, pct)) =>
        when(source.isin(srcs: _*), lit(pctThreshold(pct))).otherwise(acc)
    }
    substring(md5(key.cast("string")), 1, 8) < threshold
  }

  /** c03 — source-weighted corpus mixing, summarized per source: total
    * docs, docs kept by the mixture, and the configured rate. One scan +
    * one low-cardinality groupBy (the keep-decision is a scalar projection
    * — no join against a weights table, the mixture compiles into the
    * filter). The oracle applies the identical md5-threshold rule per
    * source, so the exact kept-set (not just its size) is what's being
    * pinned: counts are per-source and the keep rule is a pure function of
    * (doc_id, source).
    */
  def c03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keep = mixFilter($"doc_id", $"source", MixWeights)
    Tables.documents(s, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(keep, lit(1))).as("n_kept"),
        min(when(keep, $"doc_id")).as("first_kept_id"),
      )
      .orderBy($"source")
  }

  val c03Oracle: String = {
    val cases = MixWeights.map { case (srcs, pct) =>
      val in = srcs.map(x => s"'$x'").mkString(", ")
      s"WHEN source IN ($in) THEN '${pctThreshold(pct)}'"
    }.mkString(" ")
    s"""SELECT source, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
       |    (CASE $cases ELSE '00000000' END) THEN 1 END) AS n_kept,
       |  MIN(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
       |    (CASE $cases ELSE '00000000' END) THEN doc_id END) AS first_kept_id
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q49 — token-budget selection per source shard
  // ---------------------------------------------------------------------

  /** Per-source token budget for q49 (the "take the best N tokens from
    * each source" knob of a data-mixing recipe).
    */
  val TokenBudget = 500L

  /** q49 — budgeted selection: rank each source's docs by a quality proxy
    * (longer docs first; unique doc_id tiebreak makes the order total) and
    * keep docs while the source's cumulative token count stays within
    * budget. This is how mixture recipes are actually materialized —
    * "100B tokens of source X, best-first" — and it composes with c03
    * (rate-based mixing) and t12 (packing the survivors). One window pass
    * per source partition, no global sort; the budget filter is a scalar
    * predicate on the running sum, so the plan is scan → window → agg.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = size(filter(split($"text", "\\s+"), x => x =!= "")).cast("long")
    val w = Window.partitionBy($"source")
      .orderBy($"n_chars".desc, $"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars", toks.as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when($"cum_tokens" <= TokenBudget, lit(1))).as("n_kept"),
        sum(when($"cum_tokens" <= TokenBudget, $"n_tokens")).cast("long").as("tokens_kept"),
        min(when($"cum_tokens" <= TokenBudget, $"n_chars")).as("shortest_kept_chars"),
      )
      .orderBy($"source")
  }

  val q49Oracle: String =
    s"""WITH t AS (SELECT doc_id, source, n_chars,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_chars, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS cum_tokens
       |  FROM t)
       |SELECT source, COUNT(*) AS n_docs,
       |  COUNT(CASE WHEN cum_tokens <= $TokenBudget THEN 1 END) AS n_kept,
       |  CAST(SUM(CASE WHEN cum_tokens <= $TokenBudget THEN n_tokens END) AS BIGINT) AS tokens_kept,
       |  MIN(CASE WHEN cum_tokens <= $TokenBudget THEN n_chars END) AS shortest_kept_chars
       |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // ml03 — deterministic k-fold cross-validation assignment
  // ---------------------------------------------------------------------

  /** Fold count for ml03 (power of two → exact md5-prefix quartiles). */
  val KFolds = 4

  /** Content-hash fold id in [0, 4): which md5-prefix quartile the key's
    * hash lands in. Same determinism contract as [[hashSampleFilter]] —
    * fold membership is a pure function of the key, so training pipelines
    * get identical folds across engines, reruns, and cluster resizes, and
    * fold k's holdout never leaks into fold k's training split on a retry.
    * Quartile boundaries are string compares on the hex prefix (16^8
    * values split exactly 4 ways) — no hex→int parsing, which keeps the
    * rule portable to any engine with md5 + substring.
    */
  def foldOf(key: Column): Column = {
    val h = substring(md5(key.cast("string")), 1, 8)
    when(h < "40000000", 0).when(h < "80000000", 1)
      .when(h < "c0000000", 2).otherwise(3)
  }

  /** ml03 — k-fold assignment audit over customers: per (fold, segment)
    * row counts plus exact mean balance. This is the table an ML engineer
    * eyeballs before trusting a CV split — folds should be ~equal sized
    * and stratification-balanced within each segment. One scan, one
    * low-cardinality groupBy (the fold id is a scalar projection); at
    * 100 TB the split never materializes — downstream trainers re-derive
    * membership from the same pure predicate.
    */
  def ml03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.util.Exact
    Tables.customer(s, dir)
      .select(foldOf($"c_custkey").as("fold"), $"c_mktsegment", $"c_acctbal", $"c_custkey")
      .groupBy($"fold", $"c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        Exact.davg($"c_acctbal").as("avg_acctbal"),
        min($"c_custkey").as("first_key"),
      )
      .orderBy($"fold", $"c_mktsegment")
  }

  val ml03Oracle: String =
    """WITH f AS (SELECT
      |    CASE WHEN substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < '40000000' THEN 0
      |         WHEN substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < '80000000' THEN 1
      |         WHEN substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < 'c0000000' THEN 2
      |         ELSE 3 END AS fold,
      |    c_mktsegment, c_acctbal, c_custkey
      |  FROM customer)
      |SELECT fold, c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
      |  MIN(c_custkey) AS first_key
      |FROM f GROUP BY fold, c_mktsegment ORDER BY fold, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // ml04 — leakage-free train/val/test split, keyed on the group
  // ---------------------------------------------------------------------

  /** 75/12.5/12.5 split id from the key's md5-hex prefix — the same
    * engine-portable hex-compare scheme as [[foldOf]] (12/16, 2/16, 2/16
    * of the prefix space; boundaries are string compares, no hex→int).
    */
  def splitOf(key: Column): Column = {
    val h = substring(md5(key.cast("string")), 1, 8)
    when(h < "c0000000", "train").when(h < "e0000000", "val").otherwise("test")
  }

  /** ml04 — the split-leakage audit: assign documents to train/val/test
    * two ways — keyed on `doc_id` (the naive split) and keyed on `source`
    * (the provenance group) — and report, per (method, split), the doc and
    * source counts plus each method's count of LEAKY groups: sources whose
    * documents straddle more than one split. Near-duplicates cluster
    * within a provenance group, so a group that straddles splits leaks
    * train content into eval; keying the split on the group makes
    * straddling impossible BY CONSTRUCTION (a pure function of `source`
    * cannot send one source two ways), and the audit proves the naive
    * method does leak on the same data. Same reason Dedup/ml03 key on
    * content hashes: membership must be a pure function of the right key.
    *
    * Shape at scale: the split never materializes (trainers re-derive
    * membership from the pure predicate); the audit itself is one scan per
    * method into a 3-row and a 1-row aggregate — the leak count joins in
    * as a broadcast global scalar (dq01 precedent, whitelisted in
    * PlanSweepSpec as a bounded 1-row broadcast).
    */
  def ml04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    def audit(method: String, splitKey: Column): DataFrame = {
      val assigned = docs.select($"doc_id", $"source", splitOf(splitKey).as("split_name"))
      val leaky = assigned
        .groupBy($"source").agg(countDistinct($"split_name").as("n_splits"))
        .agg(count(when($"n_splits" > 1, lit(1))).as("n_leaky_sources"))
      assigned
        .groupBy($"split_name")
        .agg(count(lit(1)).as("n_docs"), countDistinct($"source").as("n_sources"))
        .crossJoin(leaky)
        .select(lit(method).as("method"), $"split_name", $"n_docs",
          $"n_sources", $"n_leaky_sources")
    }
    audit("by_doc_id", $"doc_id")
      .unionByName(audit("by_source", $"source"))
      .orderBy($"method", $"split_name")
  }

  val ml04Oracle: String =
    """WITH assigned AS (
      |  SELECT doc_id, source,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e0000000' THEN 'val'
      |         ELSE 'test' END AS split_id,
      |    CASE WHEN substring(md5(source), 1, 8) < 'c0000000' THEN 'train'
      |         WHEN substring(md5(source), 1, 8) < 'e0000000' THEN 'val'
      |         ELSE 'test' END AS split_src
      |  FROM documents
      |), m AS (
      |  SELECT 'by_doc_id' AS method, split_id AS split_name, doc_id, source FROM assigned
      |  UNION ALL
      |  SELECT 'by_source', split_src, doc_id, source FROM assigned
      |), leaks AS (
      |  SELECT method, COUNT(CASE WHEN n_splits > 1 THEN 1 END) AS n_leaky_sources
      |  FROM (SELECT method, source, COUNT(DISTINCT split_name) AS n_splits
      |        FROM m GROUP BY method, source)
      |  GROUP BY method
      |)
      |SELECT m.method, split_name, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT source) AS n_sources,
      |  MIN(leaks.n_leaky_sources) AS n_leaky_sources
      |FROM m JOIN leaks ON m.method = leaks.method
      |GROUP BY m.method, split_name
      |ORDER BY m.method, split_name""".stripMargin

  /** q60 — WEIGHTED priority sampling (Duffield–Lund–Thorup 2007): the
    * top-20 documents by priority w/u where w is the document's weight
    * (n_chars — longer docs proportionally likelier) and u is a
    * deterministic content-hash uniform. Weighted sampling is how a
    * curation pipeline subsamples a corpus while PRESERVING a quality or
    * length mix (uniform sampling under-represents heavy documents).
    *
    * Determinism/exactness: u is the md5-prefix integer in [1, 2³²]
    * (q38's engine-portable rule), and the priority is QUANTIZED to the
    * integer quotient (w·2³²) div u — pure BIGINT arithmetic, so rank
    * comparisons are exact in both engines (a double w/u would make the
    * selection depend on float rounding at ties); doc_id breaks quotient
    * ties. Plan shape: one narrow projection into TakeOrderedAndProject —
    * k rows per partition cross the wire, never the corpus.
    */
  def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars",
        (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long") + 1L).as("u"))
      .select($"doc_id", $"source", $"n_chars",
        expr("n_chars * 4294967296 DIV u").as("priority"))
      .orderBy($"priority".desc, $"doc_id")
      .limit(20)
  }

  val q60Oracle: String =
    """SELECT doc_id, source, n_chars,
      |  (n_chars * 4294967296) // (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1) AS priority
      |FROM documents
      |ORDER BY priority DESC, doc_id LIMIT 20""".stripMargin

  /** c05 — PER-SOURCE DOCUMENT CAPS, the anti-domination stage every
    * web-corpus pipeline runs (C4 / RefinedWeb cap pages per domain so one
    * crawler-friendly site cannot own the training mix): keep at most 40
    * documents per source, chosen by a deterministic UNBIASED priority
    * (md5 of doc_id — using doc_id order would keep whatever the crawler
    * happened to fetch first; a content-independent hash is a uniform
    * draw), and report the per-source audit: total, kept, dropped, and
    * the kept docs' exact char volume.
    *
    * Scale shape: one row_number window partitioned by source — the same
    * hash exchange the per-source aggregate needs anyway, no global sort.
    * Skew note: a pathological mega-domain makes one partition hot; the
    * production form pre-aggregates candidates per (source, salt) and
    * keeps the top-K of a bounded union (Skew.saltedAgg's posture) — at
    * this grain the plain window is the honest plan.
    */
  def c05(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val K = 40
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(s, dir)
      .select($"source", $"doc_id", $"n_chars",
        row_number().over(w).as("rk"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"rk" <= K, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"rk" > K, 1L).otherwise(0L)).as("n_dropped"),
        sum(when($"rk" <= K, $"n_chars").otherwise(0L)).as("kept_chars"))
      .orderBy($"source")
  }

  val c05Oracle: String =
    """WITH ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rk <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rk > 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(CASE WHEN rk <= 40 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  /** Data-parallel worker count for [[c08]]'s curriculum shards. */
  val NumShards = 8

  /** c08 — CURRICULUM SHARDING (Bengio et al. 2009's easy-first ordering,
    * operationalized for data-parallel training): order the corpus by an
    * integer difficulty proxy (document length; tiebreak doc_id so the
    * order is total), then deal documents to [[NumShards]] workers
    * ROUND-ROBIN BY GLOBAL RANK — each worker's local stream preserves
    * the global easy→hard order AND every difficulty stratum is split
    * evenly across workers (no worker trains on only-short docs while
    * another gets only-long, the skew that breaks synchronized-step
    * curricula). Output: the per-shard manifest (doc/char volume, rank
    * and difficulty spans) a training launcher consumes.
    *
    * Scale shape: the global rank is [[Ranks.globalRank]] — one range
    * exchange plus a broadcast offset map, never a single-partition
    * window (the e04 recipe; at 100 TB the ordering pass is the same
    * sort a sort-merge shuffle already does). Everything after is one
    * partial-aggregated groupBy onto NumShards rows. The round-robin
    * invariant is auditable in the output itself: within a shard,
    * consecutive ranks differ by exactly NumShards, so
    * max_rank − min_rank = (n_docs − 1)·NumShards.
    */
  def c08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"n_chars")
    Ranks.globalRank(docs, 32, $"n_chars", $"doc_id")
      .withColumn("shard", (($"rnk" - 1) % NumShards).cast("long"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"rnk").as("min_rank"),
        max($"rnk").as("max_rank"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"shard")
  }

  val c08Oracle: String =
    s"""WITH r AS (
       |  SELECT doc_id, n_chars,
       |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk
       |  FROM documents)
       |SELECT CAST((rnk - 1) % $NumShards AS BIGINT) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(rnk) AS min_rank, MAX(rnk) AS max_rank,
       |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
       |FROM r GROUP BY shard ORDER BY shard""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q38_hash_sample", q38, Some(q38Oracle)),
    Q("c03_source_mixing", c03, Some(c03Oracle)),
    Q("q49_token_budget", q49, Some(q49Oracle)),
    Q("ml03_kfold_split", ml03, Some(ml03Oracle)),
    Q("ml04_leakage_audit", ml04, Some(ml04Oracle)),
    Q("q60_weighted_sample", q60, Some(q60Oracle)),
    Q("c05_domain_caps", c05, Some(c05Oracle)),
    Q("c08_curriculum_shards", c08, Some(c08Oracle)),
  )
}
