package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q
import graft.util.Eager

/** Data-mixing operators for training-corpus assembly (SURVEY.md §2
  * beyond-reference mandate): once a corpus is deduplicated and filtered,
  * the remaining decisions are WHICH documents to keep for a target domain
  * (importance weighting — Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling", DSIR) and HOW MUCH of each
  * language/source to sample under an epoch cap (UniMax — Chung et al.
  * 2023, "UniMax: Fairer and More Effective Language Sampling for
  * Large-Scale Multilingual Pretraining"). Both are implemented log-free
  * under the repo determinism contract (SURVEY.md §5.1): per-feature
  * importance ratios are floored to integer ppm BEFORE any sum, and the
  * UniMax waterfill is pure BIGINT arithmetic, so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object Mixing {

  /** Hashed-feature space size for mx01 (DSIR §2.2 uses hashed n-grams for
    * exactly this tractability reason: feature stats are
    * bucket-cardinality, never vocabulary-cardinality).
    */
  val Buckets = 1024L

  /** The target domain for mx01: English documents stand in for DSIR's
    * "target distribution" sample (any deterministic predicate works; the
    * operator only consumes the induced feature histogram).
    */
  val TargetLang = "en"

  /** mx01 — DSIR-STYLE IMPORTANCE WEIGHTS: score every document by how
    * much more likely its hashed-bigram features are under the target
    * domain's feature distribution than under the raw corpus's, and flag
    * the docs whose mean ratio clears 1.0 as the resampling keep-set.
    *
    * Log-free formulation: DSIR's per-feature log-likelihood-ratio sum is
    * replaced by the RATIO-SUM — each occurrence contributes the
    * add-one-smoothed probability ratio
    * `((tgt_f+1)/(tgt_total+B)) / ((raw_f+1)/(raw_total+B))`, kept as one
    * BIGINT expression `((tgt_f+1)·(raw_total+B)·10^6) div
    * ((raw_f+1)·(tgt_total+B))` — floored to integer ppm BEFORE the
    * per-document sum (order-free exact aggregation; the same reason ir01
    * floors BM25 contributions). Monotone per feature in the same ratio
    * DSIR logs, so the induced per-occurrence preference order is
    * identical. Magnitude bound: tgt_f ≤ raw_f makes every RESULT
    * contribution ≤ (raw_total+B)/(tgt_total+B)·10^6 — but the NUMERATOR
    * `(tgt_f+1)·(raw_total+B)·10^6` is the binding constraint, not the
    * post-division value (round-10 advice: the int64 form overflowed once
    * tgt_f·raw_total reached ~10^13). The operands therefore widen to
    * DECIMAL(38,0) before the integral divide (HUGEINT in the oracle),
    * giving headroom to ~10^15 features per side; the divide itself
    * returns BIGINT, so downstream sums are unchanged.
    *
    * Scale shape: ONE corpus scan builds the (doc, bucket) feature stream
    * (cached — stats and scoring share it); the raw/target histograms are
    * bucket-cardinality (≤1024 rows) partial aggs; λ broadcasts back over
    * the stream, so the corpus never shuffles on anything wider than its
    * own scan. The totals crossJoin is a 1-row broadcast (whitelisted in
    * PlanSweepSpec, the t08 shape). At 100 TB: identical — feature
    * histograms are fixed-size whatever the corpus.
    */
  def mx01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread before the bigram fan-out + md5 hashing (guide §2.5): the
    // Eager cache below otherwise materializes single-task on the
    // single-split corpus (identity at real split counts)
    val toks = graft.util.Spread.toWidth(
      Tables.documents(s, dir).select($"doc_id", $"lang", $"text"), $"doc_id")
      .select($"doc_id", $"lang",
        filter(split(TextAnalysis.normalize($"text"), " "), x => x =!= "").as("sy"))
      .filter(size($"sy") >= 2)
    val feats = Eager.cached(toks
      .select($"doc_id", $"lang",
        explode(sequence(lit(1), size($"sy") - 1)).as("i"), $"sy")
      .select($"doc_id", $"lang",
        (conv(substring(md5(concat(lit("mx:"),
          concat_ws(" ", element_at($"sy", $"i"), element_at($"sy", $"i" + 1)))),
          1, 8), 16, 10).cast("long") % Buckets).as("bucket")))
    val raw = feats.groupBy($"bucket").agg(count(lit(1)).as("raw_f"))
    val tgt = feats.filter($"lang" === TargetLang)
      .groupBy($"bucket").agg(count(lit(1)).as("tgt_f"))
    val totals = feats.agg(
      count(lit(1)).as("raw_total"),
      sum(when($"lang" === TargetLang, 1L).otherwise(0L)).as("tgt_total"))
    val lambda = raw
      .join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("tgt_f"))
      .crossJoin(broadcast(totals))
      .select($"bucket",
        expr(s"(CAST(tgt_f + 1 AS DECIMAL(20,0)) * (raw_total + $Buckets) * 1000000)" +
          s" div (CAST(raw_f + 1 AS DECIMAL(20,0)) * (tgt_total + $Buckets))").as("l_ppm"))
    feats.join(broadcast(lambda), Seq("bucket"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"), sum($"l_ppm").as("weight_ppm"))
      .select($"doc_id", $"n_feats", $"weight_ppm",
        expr("weight_ppm div n_feats").as("avg_wppm"))
      .withColumn("keep", $"avg_wppm" >= 1000000L)
      .orderBy($"doc_id")
  }

  val mx01Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
       |      x -> x <> '') AS sy
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substring(md5('mx:' || sy[i] || ' ' || sy[i+1]), 1, 8))::BIGINT % $Buckets AS bucket
       |  FROM (SELECT doc_id, lang, sy, unnest(range(1, len(sy))) AS i
       |        FROM toks WHERE len(sy) >= 2)),
       |raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS raw_f FROM feats GROUP BY bucket),
       |tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tgt_f
       |        FROM feats WHERE lang = '$TargetLang' GROUP BY bucket),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS raw_total,
       |               CAST(SUM(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS tgt_total
       |        FROM feats),
       |lam AS (
       |  SELECT raw.bucket,
       |    CAST((CAST(COALESCE(tgt_f, 0) + 1 AS HUGEINT) * (raw_total + $Buckets) * 1000000)
       |      // (CAST(raw_f + 1 AS HUGEINT) * (tgt_total + $Buckets)) AS BIGINT) AS l_ppm
       |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot)
       |SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |  CAST(SUM(l_ppm) AS BIGINT) AS weight_ppm,
       |  CAST(SUM(l_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_wppm,
       |  (CAST(SUM(l_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT)) >= 1000000 AS keep
       |FROM feats f JOIN lam ON f.bucket = lam.bucket
       |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin

  /** mx02 — UNIMAX TOKEN-BUDGET ALLOCATION: given per-language token
    * counts, allocate a total training budget so every language gets as
    * equal a share as possible WITHOUT exceeding its epoch cap — UniMax's
    * waterfilling (Chung 2023 Alg. 1): head languages are leveled down,
    * tail languages train up to `MaxEpochs` full epochs. Budget here is
    * 3/4 of the corpus (so at least one language saturates and at least
    * one levels — both branches exercised at every SF).
    *
    * Closed-form integer waterfill (no iteration): sort languages by
    * ascending cap with prefix sums P_i; language i is SATURATED iff
    * `cap_i · (k−i+1) ≤ budget − P_{i−1}` (for sorted caps the saturated
    * set is a prefix — if i fits under the even split of what remains, so
    * does everything smaller). With m = |saturated|, the water level is
    * `(budget − P_m) div (k−m)`, and the `(budget − P_m) mod (k−m)`
    * remainder tokens go one each to the smallest unsaturated languages
    * (deterministic: the same (cap, lang) order). Maximality of m
    * guarantees `level+1 ≤ cap_{m+1}`, so no allocation exceeds its cap.
    *
    * Scale shape: corpus-scale work is ONE scan + a partial agg at
    * language grain; the waterfill itself runs on a k-row relation
    * (k = |languages|, bounded by construction) through two window
    * passes and a 1-row crossJoin (whitelisted). At 100 TB the plan is
    * unchanged — only the scan grows.
    */
  def mx02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = Tables.documents(s, dir)
      .select($"lang",
        size(filter(split(TextAnalysis.normalize($"text"), " "), x => x =!= ""))
          .cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("n_tokens"))
      .select(lit(0L).as("inst"), $"lang".as("key"), $"n_tokens")
    unimaxAlloc(perLang, MaxEpochs, budgetNum = 3L, budgetDen = 4L)
      .select($"key".as("lang"), $"n_tokens", $"cap", $"alloc", $"saturated",
        $"epochs_ppm")
      .orderBy($"lang")
  }

  /** The closed-form integer waterfill behind [[mx02]], generalized to
    * many independent instances at once: input (inst, key, n_tokens),
    * output one allocation row per (inst, key). Every window partitions
    * by `inst` and every aggregate groups by it, so a million independent
    * allocation problems (e.g. per-tenant budgets) run in one plan with
    * no global ordering anywhere. Budget per instance =
    * `(budgetNum · Σ n_tokens) div budgetDen`; cap per key =
    * `maxEpochs · n_tokens`. MixingSpec property-checks this closed form
    * against an independent sequential waterfill on randomized instances.
    */
  private[ops] def unimaxAlloc(
      perKey: DataFrame, maxEpochs: Long,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    val s = perKey.sparkSession
    import s.implicits._
    val tot = perKey.groupBy($"inst")
      .agg(sum($"n_tokens").as("total"), count(lit(1)).as("k"))
    val byCap = Window.partitionBy($"inst").orderBy($"cap", $"key")
    val ordered = perKey
      .select($"inst", $"key", $"n_tokens", ($"n_tokens" * maxEpochs).as("cap"))
      .withColumn("i", row_number().over(byCap).cast("long"))
      .withColumn("p", sum($"cap").over(
        byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // broadcast: instance-grain relations are metadata-sized. For a
      // literal single-instance input (mx02) Catalyst constant-folds the
      // join key away, leaving a bounded 1-row-side nested loop (the
      // whitelisted t08 shape); real multi-instance inputs keep the key
      // and get a broadcast hash join.
      .join(broadcast(tot), Seq("inst"))
      .withColumn("budget", expr(s"($budgetNum * total) div $budgetDen"))
      .withColumn("sat", $"cap" * ($"k" - $"i" + 1L) <= ($"budget" - ($"p" - $"cap")))
    val mRel = ordered.groupBy($"inst").agg(
      sum(when($"sat", 1L).otherwise(0L)).as("m"),
      max(when($"sat", $"p").otherwise(0L)).as("pm"))
    ordered.join(broadcast(mRel), Seq("inst"))
      .withColumn("level",
        when($"m" < $"k", expr("(budget - pm) div (k - m)")).otherwise(lit(0L)))
      .withColumn("rem",
        when($"m" < $"k", expr("(budget - pm) % (k - m)")).otherwise(lit(0L)))
      .withColumn("alloc",
        when($"sat", $"cap")
          .otherwise($"level" + when($"i" - $"m" <= $"rem", 1L).otherwise(0L)))
      .select($"inst", $"key", $"n_tokens", $"cap", $"alloc",
        $"sat".as("saturated"),
        // DECIMAL-widened like mx01's λ: alloc·10^6 passes int64 only up
        // to ~9·10^12 allocated tokens — a single head language at 100 TB
        // (~25T corpus tokens) crosses that
        expr("(CAST(alloc AS DECIMAL(20,0)) * 1000000) div n_tokens").as("epochs_ppm"))
  }

  /** UniMax epoch cap for mx02 (one full epoch per language). */
  val MaxEpochs = 1L

  val mx02Oracle: String =
    s"""WITH per AS (
       |  SELECT lang,
       |    CAST(SUM(len(list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
       |      x -> x <> ''))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
       |               CAST(COUNT(*) AS BIGINT) AS k FROM per),
       |ordered AS (
       |  SELECT lang, n_tokens, n_tokens * $MaxEpochs AS cap,
       |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens * $MaxEpochs, lang) AS BIGINT) AS i,
       |    CAST(SUM(n_tokens * $MaxEpochs) OVER (ORDER BY n_tokens * $MaxEpochs, lang) AS BIGINT) AS p
       |  FROM per),
       |o2 AS (
       |  SELECT o.lang, o.n_tokens, o.cap, o.i, o.p, tot.k,
       |    (3 * tot.total) // 4 AS budget,
       |    (o.cap * (tot.k - o.i + 1)) <= ((3 * tot.total) // 4 - (o.p - o.cap)) AS sat
       |  FROM ordered o CROSS JOIN tot),
       |mrel AS (SELECT CAST(SUM(CASE WHEN sat THEN 1 ELSE 0 END) AS BIGINT) AS m,
       |                CAST(MAX(CASE WHEN sat THEN p ELSE 0 END) AS BIGINT) AS pm
       |         FROM o2),
       |o3 AS (
       |  SELECT o2.*, mrel.m, mrel.pm,
       |    CASE WHEN mrel.m < o2.k THEN (o2.budget - mrel.pm) // (o2.k - mrel.m) ELSE 0 END AS level,
       |    CASE WHEN mrel.m < o2.k THEN (o2.budget - mrel.pm) % (o2.k - mrel.m) ELSE 0 END AS rem
       |  FROM o2 CROSS JOIN mrel),
       |o4 AS (
       |  SELECT lang, n_tokens, cap,
       |    CASE WHEN sat THEN cap
       |         ELSE level + (CASE WHEN i - m <= rem THEN 1 ELSE 0 END) END AS alloc,
       |    sat AS saturated
       |  FROM o3)
       |SELECT lang, n_tokens, cap, alloc, saturated,
       |  CAST((CAST(alloc AS HUGEINT) * 1000000) // n_tokens AS BIGINT) AS epochs_ppm
       |FROM o4 ORDER BY lang""".stripMargin

  /** mx03 — TEMPERATURE-SAMPLED MIXTURE SHARES (τ = 0.5): the classic
    * multilingual sampling rule (mBERT/XLM-R; the pre-UniMax standard):
    * sample language i proportionally to n_i^τ, flattening the head and
    * boosting the tail. Integer-exact under the determinism contract:
    *   - n^0.5 is floor(sqrt(n)) — EXACT for n ≤ 4·10^15 because sqrt is
    *     IEEE correctly rounded and k² is exactly representable, so the
    *     rounded sqrt never crosses an integer boundary;
    *   - shares are `10^6·s_i div S` with S = Σ s_i (integer — order-free,
    *     unlike a float Σ whose partial-agg order would differ between
    *     engines), and the `10^6 − Σ base` remainder points go to the
    *     LARGEST-REMAINDER languages (Hamilton rounding; remainders
    *     `(10^6·s_i) mod S` are integers, so the rank is exact) — the
    *     published shares sum to exactly 10^6.
    * Output carries the raw proportional share next to the tempered one
    * so the boost/flatten effect is the gated fact.
    *
    * Scale shape: one corpus scan + language-grain partial agg (shared
    * with mx02); everything after runs on the k-row language relation
    * (two bounded windows + a 1-row total broadcast, whitelisted).
    */
  def mx03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = Tables.documents(s, dir)
      .select($"lang",
        size(filter(split(TextAnalysis.normalize($"text"), " "), x => x =!= ""))
          .cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("n_tokens"))
      .withColumn("sq", floor(sqrt($"n_tokens".cast("double"))).cast("long"))
    val tot = perLang.agg(
      sum($"n_tokens").as("total"), sum($"sq").as("stot"))
    val based = perLang.crossJoin(broadcast(tot))
      .withColumn("raw_share_ppm", expr("(1000000 * n_tokens) div total"))
      .withColumn("base", expr("(1000000 * sq) div stot"))
      .withColumn("rmd", expr("(1000000 * sq) % stot"))
    val short = based.agg((lit(1000000L) - sum($"base")).as("short"))
    based.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(
        Window.orderBy($"rmd".desc, $"lang")).cast("long"))
      .select($"lang", $"n_tokens", $"sq", $"raw_share_ppm",
        ($"base" + when($"rk" <= $"short", 1L).otherwise(0L))
          .as("temp_share_ppm"))
      .withColumn("boosted", $"temp_share_ppm" > $"raw_share_ppm")
      .orderBy($"lang")
  }

  val mx03Oracle: String =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(SUM(len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |sq AS (SELECT lang, n_tokens,
      |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sq
      |       FROM per),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
      |               CAST(SUM(sq) AS BIGINT) AS stot FROM sq),
      |based AS (
      |  SELECT lang, n_tokens, sq,
      |    (1000000 * n_tokens) // total AS raw_share_ppm,
      |    (1000000 * sq) // stot AS base,
      |    (1000000 * sq) % stot AS rmd
      |  FROM sq CROSS JOIN tot),
      |short AS (SELECT 1000000 - CAST(SUM(base) AS BIGINT) AS short FROM based),
      |ranked AS (
      |  SELECT based.*, short.short,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rmd DESC, lang) AS BIGINT) AS rk
      |  FROM based CROSS JOIN short)
      |SELECT lang, n_tokens, sq, raw_share_ppm,
      |  base + (CASE WHEN rk <= short THEN 1 ELSE 0 END) AS temp_share_ppm,
      |  base + (CASE WHEN rk <= short THEN 1 ELSE 0 END) > raw_share_ppm AS boosted
      |FROM ranked ORDER BY lang""".stripMargin

  /** The "curated" source set for c11: the classifier's positive class
    * (the CCNet/LLaMA recipe trains on wiki-reference vs crawl; any
    * deterministic source split exercises the same plan).
    */
  val CuratedSources: Seq[String] = Seq("src0", "src1", "src2", "src3", "src4")

  /** c11 — MODEL-BASED QUALITY CLASSIFIER (the fasttext-filter stage of
    * CCNet / LLaMA-style curation): train a multinomial Naive Bayes
    * classifier that separates curated sources from crawl, then score
    * EVERY document — the standard "bootstrap a model filter from a
    * trusted subset" pattern (Wenzek 2020 §4.3 uses exactly this
    * curated-vs-crawl framing; Touvron 2023 filters CommonCrawl with a
    * wiki-reference classifier). Complements the heuristic gate (t02),
    * the LM-perplexity gate (t19) and their agreement audit (c09) with
    * the discriminative family.
    *
    * Log-free NB under the determinism contract: the per-word class
    * likelihood ratio with add-one smoothing,
    * `((pos_w+1)/(T_pos+V)) / ((neg_w+1)/(T_neg+V))`, is a single integer
    * expression floored to ppm BEFORE the per-document sum — operands
    * widened to DECIMAL(38,0) / HUGEINT like mx01's λ so the numerator
    * product can't overflow int64 at real corpus token totals (mx01's
    * ratio-sum form — order-free exact aggregation, monotone per word in
    * the log-likelihood NB sums). Verdict: curated iff the mean
    * per-occurrence ratio clears 1.0; the output carries the true label so
    * the gate doubles as the classifier's confusion audit.
    *
    * Scale shape: ONE corpus scan into a (doc, word) stream (cached —
    * model fit and scoring share it); class-conditional counts are
    * vocabulary-keyed partial aggs; scoring is one word-keyed join of the
    * stream against the model (zipf-concentrated — the t19 model-join
    * shape) and one per-doc partial agg. The totals crossJoin is a 1-row
    * broadcast (whitelisted).
    */
  def c11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val curated = CuratedSources.map(lit(_))
    val words = Eager.cached(graft.util.Spread.toWidth( // single-split spread
      Tables.documents(s, dir).select($"doc_id", $"source", $"text"), $"doc_id")
      .select($"doc_id", $"source".isin(curated: _*).as("is_curated"),
        explode(filter(split(TextAnalysis.normalize($"text"), " "),
          x => x =!= "")).as("word")))
    val model = words.groupBy($"word").agg(
      sum(when($"is_curated", 1L).otherwise(0L)).as("pos_w"),
      sum(when($"is_curated", 0L).otherwise(1L)).as("neg_w"))
    val totals = model.agg(
      sum($"pos_w").as("t_pos"), sum($"neg_w").as("t_neg"),
      count(lit(1)).as("v"))
    val scoredWords = model
      .crossJoin(broadcast(totals))
      .select($"word",
        expr("(CAST(pos_w + 1 AS DECIMAL(20,0)) * (t_neg + v) * 1000000)" +
          " div (CAST(neg_w + 1 AS DECIMAL(20,0)) * (t_pos + v))").as("r_ppm"))
    words.join(scoredWords, Seq("word"))
      .groupBy($"doc_id", $"is_curated")
      .agg(count(lit(1)).as("n_words"), sum($"r_ppm").as("score_ppm"))
      .select($"doc_id", $"is_curated", $"n_words",
        expr("score_ppm div n_words").as("avg_rppm"))
      .withColumn("predicted_curated", $"avg_rppm" >= 1000000L)
      .orderBy($"doc_id")
  }

  val c11Oracle: String = {
    val curatedList = CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source IN ($curatedList) AS is_curated,
       |    unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
       |      x -> x <> '')) AS word
       |  FROM documents),
       |model AS (
       |  SELECT word,
       |    CAST(SUM(CASE WHEN is_curated THEN 1 ELSE 0 END) AS BIGINT) AS pos_w,
       |    CAST(SUM(CASE WHEN is_curated THEN 0 ELSE 1 END) AS BIGINT) AS neg_w
       |  FROM w GROUP BY word),
       |tot AS (SELECT CAST(SUM(pos_w) AS BIGINT) AS t_pos,
       |               CAST(SUM(neg_w) AS BIGINT) AS t_neg,
       |               CAST(COUNT(*) AS BIGINT) AS v FROM model),
       |sw AS (
       |  SELECT word,
       |    CAST((CAST(pos_w + 1 AS HUGEINT) * (t_neg + v) * 1000000)
       |      // (CAST(neg_w + 1 AS HUGEINT) * (t_pos + v)) AS BIGINT) AS r_ppm
       |  FROM model CROSS JOIN tot)
       |SELECT w.doc_id, w.is_curated,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(r_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_rppm,
       |  (CAST(SUM(r_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT)) >= 1000000 AS predicted_curated
       |FROM w JOIN sw ON w.word = sw.word
       |GROUP BY w.doc_id, w.is_curated
       |ORDER BY w.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("mx01_dsir_importance", mx01, Some(mx01Oracle)),
    Q("mx02_unimax_allocation", mx02, Some(mx02Oracle)),
    Q("mx03_temperature_mixture", mx03, Some(mx03Oracle)),
    Q("c11_quality_classifier", c11, Some(c11Oracle)),
  )
}
