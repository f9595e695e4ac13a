package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** CCNet-style language-model quality filtering (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data") — the perplexity gate used by most published LLM corpus
  * pipelines (LLaMA, Falcon, ROOTS): score every document under a small
  * n-gram LM trained on a trusted subset, then split the corpus into
  * head / middle / tail perplexity terciles and keep the head.
  *
  * This engine's re-expression, all integer-exact (the t21/c11 posture —
  * no float log-sums anywhere, so both engines agree bit-for-bit):
  *
  *  - **LM**: word-bigram interpolated Kneser–Ney with absolute discount
  *    D = 0.75 ([[DiscountNano]] in nano fixed-point), the textbook
  *    recurrence (Chen & Goodman 1999 eq. 4.25):
  *    P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1 ·)
  *             + (D · N1+(w1 ·)/c(w1 ·)) · Pcont(w2),
  *    with the continuation probability add-one smoothed
  *    (Pcont(w2) = (N1+(· w2) + 1)/(T + V + 1), T = distinct bigram
  *    types, V = distinct continuation words) so unseen words keep a
  *    nonzero floor — the one documented deviation from pure KN, needed
  *    because the fixed-point pipeline has no backoff-to-uniform escape.
  *    All probabilities are nano-scale integers computed with `div`;
  *    corpus-count products are widened to DECIMAL(38,0)/HUGEINT before
  *    the multiply (the mx-family r11 lesson) so petascale counts cannot
  *    overflow the 64-bit lane.
  *  - **Train split**: the engine-neutral md5-threshold rule (the c03
  *    mixing posture) — docs with md5("ppl:" || doc_id) % [[TrainMod]]
  *    = 0 (~25%) train the LM; EVERY doc is scored (train docs carry a
  *    `trained_on` flag in the output so self-scoring is visible, not
  *    hidden).
  *  - **Log-probability**: summing floor(log2(p_nano + 1)) per bigram —
  *    the binary-representation length (`bin()` in BOTH engines), a
  *    deterministic integer surrogate of the log-likelihood with < 1 bit
  *    per token quantization, merge-order free where a float log-sum is
  *    not. Per doc: `avg_centibits = (Σbits · 100) div n_bigrams` —
  *    HIGHER = more probable under the LM = CCNet's "head".
  *  - **Terciles**: CCNet cuts on thresholds, not ranks — and so does
  *    this operator, because a rank cut (ntile) would force a global
  *    per-doc sort (a single-partition window at 100 TB). Instead the
  *    per-doc scores aggregate into a ≤ 3101-row histogram (avg_centibits
  *    is an integer in [0, 3100]), one bounded cumulative window computes
  *    cut values h (head floor, the score of the ceil(N/3)-th doc in
  *    descending order) and m (middle floor, at ceil(2N/3)), ties
  *    inclusive — exactly the threshold semantics a sampled-quantile
  *    CCNet deployment has.
  *
  * Gate output (ppl01): per (bucket, lang, trained_on): doc count, bigram
  * count, total bits, min/max avg_centibits. The audit shows the
  * trained_on rows concentrating in the head (the LM recognizes its own
  * training text) — the expected self-training signature, visible rather
  * than averaged away.
  *
  * Relation to t19 ([[Tokenize.lmQualityBuckets]]): t19 is the simpler
  * self-surprisal gate — an unsmoothed MLE bigram model trained on the
  * WHOLE corpus scoring only bigrams it has seen. ppl01 is the actual
  * CCNet deployment shape: a held-out training split, KN smoothing, an
  * OOV floor (so out-of-domain text is scored, not dropped), and
  * CCNet's head/middle/tail cut. Both use the same bin()-length
  * integer-bits primitive.
  *
  * Scale shape: the model is a token-keyed DISTRIBUTED relation, joined
  * by hash — deliberately NOT broadcast, because a petascale vocabulary
  * does not fit a broadcast (t21's broadcast NB model is seed-sized; this
  * one is corpus-sized). Scoring is one narrow bigram explode, three hash
  * joins keyed (w1,w2)/(w1)/(w2), a partial-aggregated per-doc rollup,
  * and the bounded histogram; the two 1-row const relations ride
  * broadcast crossJoins (the t10 `nd` idiom). The corpus never shuffles
  * on anything wider than its join keys.
  */
object LangModel {

  /** Fixed-point scale for probabilities. */
  val Nano = 1000000000L

  /** Kneser–Ney absolute discount, nano fixed-point (D = 0.75). */
  val DiscountNano = 750000000L

  /** md5-threshold train split: doc_id buckets ≡ 0 (mod 4) train (~25%). */
  val TrainMod = 4

  private def trainFlag(idCol: String) =
    (conv(substring(md5(concat(lit("ppl:"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % TrainMod) === 0

  /** (doc_id, lang, trained_on, w1, w2) bigram stream — one explode over
    * the word positions, spread to session width first (the sa01/t21
    * lesson: a small corpus arrives as ONE parquet split and the explode
    * would otherwise fan out single-task; at real scale the scan arrives
    * already split and this is one cheap doc_id exchange).
    */
  private[ops] def bigrams(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt
    docs
      .select($"doc_id", $"lang", trainFlag("doc_id").as("trained_on"),
        split(TextAnalysis.normalize($"text"), " ").as("ws"))
      .filter(size($"ws") >= 2)
      .repartition(width, $"doc_id")
      .select($"doc_id", $"lang", $"trained_on",
        explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("b"))
      .select($"doc_id", $"lang", $"trained_on", $"b.w1", $"b.w2")
  }

  /** The nano fixed-point KN probability of one scored bigram row, given
    * left-joined model columns c12/c1/n1l/n1r and the 1-row consts
    * t_types/v_types. Shared shape with the oracle (div ↔ //,
    * DECIMAL(38,0) ↔ HUGEINT).
    */
  private val pNanoExpr: String =
    s"""CAST(CASE WHEN c1 IS NULL
       |  THEN (CAST(coalesce(n1r, 0) + 1 AS DECIMAL(38,0)) * $Nano)
       |       div (t_types + v_types + 1)
       |  ELSE coalesce((CAST(c12 AS DECIMAL(38,0)) * $Nano - $DiscountNano) div c1, 0)
       |    + (((CAST($DiscountNano AS DECIMAL(38,0)) * n1l) div c1)
       |       * ((CAST(coalesce(n1r, 0) + 1 AS DECIMAL(38,0)) * $Nano)
       |          div (t_types + v_types + 1)))
       |      div $Nano
       |END AS BIGINT)""".stripMargin

  /** Per-doc scored relation over any (doc_id, lang, text) corpus:
    * (doc_id, lang, trained_on, n_bigrams, sum_bits, avg_cb). Docs with
    * < 2 tokens carry no bigram and are excluded (documented; CCNet
    * likewise only scores docs its LM can read).
    */
  def score(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bg = bigrams(docs)
    // model tables — all model-cardinality, all broadcast-subtree leaves.
    // Deliberately NOT Eager.cached: the three model relations evaluate as
    // CONCURRENT broadcast futures, while a cache forces a sequential
    // materialization job of the width-spread explode first (measured at
    // sf0.1: cached 2.8 s / 21 s CPU vs uncached 1.9 s / 4.3 s CPU — the
    // recomputed train explode is far cheaper than the lost concurrency
    // plus the 32-task overhead of the extra materialization stage).
    // Round-13 re-measured caching ONLY this shared parent: the accurate
    // cache stats flip the three scoring joins from broadcast to
    // sort-merge (bg then shuffles+sorts by (w1,w2)/w1/w2), 3.4× the
    // executor CPU at sf0.01 (BudgetSpec tripwire caught it) — reverted;
    // the repeated explode is the cheaper side of that trade at every
    // tested scale.
    val big =
      bg.filter($"trained_on").groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val uni = big.groupBy($"w1").agg(sum($"c12").as("c1"), count(lit(1)).as("n1l"))
    val rgt = big.groupBy($"w2").agg(count(lit(1)).as("n1r"))
    // one aggregate subtree for both totals (countDistinct(w2) ≡ |rgt|)
    val konst = big.agg(count(lit(1)).as("t_types"),
      countDistinct($"w2").as("v_types"))
    bg
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .join(rgt, Seq("w2"), "left")
      .crossJoin(broadcast(konst)) // 1-row broadcast (the t10 nd idiom)
      .select($"doc_id", $"lang", $"trained_on", expr(pNanoExpr).as("p_nano"))
      .select($"doc_id", $"lang", $"trained_on",
        (length(bin($"p_nano" + 1)) - 1).cast("long").as("bits"))
      .groupBy($"doc_id", $"lang", $"trained_on")
      .agg(count(lit(1)).as("n_bigrams"), sum($"bits").as("sum_bits"))
      .withColumn("avg_cb", expr("(sum_bits * 100) div n_bigrams"))
  }

  /** Per-doc head/middle/tail assignment from the histogram threshold
    * cuts — adds a `bucket` column to a [[score]]-shaped relation.
    */
  def bucketed(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    // tercile cut values from the bounded histogram (≤ 3101 rows; the
    // single-partition window is over the AGGREGATED relation, never docs)
    val cumW = Window.orderBy($"avg_cb".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy($"avg_cb".desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cuts = scored.groupBy($"avg_cb").agg(count(lit(1)).as("nv"))
      .withColumn("cum", sum($"nv").over(cumW))
      // N from the same bounded window pass — no doc-count crossJoin job
      .withColumn("n", sum($"nv").over(allW))
      .agg(
        max(when(expr("cum >= (n + 2) div 3"), $"avg_cb")).as("h_cut"),
        max(when(expr("cum >= (2 * n + 2) div 3"), $"avg_cb")).as("m_cut"))
    scored.crossJoin(broadcast(cuts)) // 1-row
      .withColumn("bucket",
        when($"avg_cb" >= $"h_cut", lit("head"))
          .when($"avg_cb" >= $"m_cut", lit("middle"))
          .otherwise(lit("tail")))
      .drop("h_cut", "m_cut")
  }

  /** ppl01 — train the KN bigram LM on the md5 split, score the whole
    * corpus in integer bits, bucket into head/middle/tail by histogram
    * threshold cuts, report the (bucket × lang × trained_on) audit.
    */
  def ppl01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bucketed(score(Tables.documents(s, dir).select($"doc_id", $"lang", $"text")))
      .groupBy($"bucket", $"lang", $"trained_on")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("n_bigrams"),
        sum($"sum_bits").as("sum_bits"),
        min($"avg_cb").as("min_avg_centibits"),
        max($"avg_cb").as("max_avg_centibits"))
      .orderBy($"bucket", $"lang", $"trained_on")
  }

  /** The identical split → train → score → cut pipeline in DuckDB. */
  val ppl01Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substring(md5('ppl:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |      % $TrainMod = 0 AS trained_on,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, lang, trained_on, ws[i] AS w1, ws[i+1] AS w2
       |  FROM (SELECT doc_id, lang, trained_on, ws,
       |          unnest(generate_series(1, len(ws) - 1)) AS i
       |        FROM d WHERE len(ws) >= 2)),
       |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg WHERE trained_on GROUP BY 1, 2),
       |uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n1l
       |        FROM big GROUP BY 1),
       |rgt AS (SELECT w2, COUNT(*) AS n1r FROM big GROUP BY 1),
       |konst AS (SELECT (SELECT COUNT(*) FROM big) AS t_types,
       |                 (SELECT COUNT(*) FROM rgt) AS v_types),
       |sc AS (
       |  SELECT b.doc_id, b.lang, b.trained_on,
       |    CAST(CASE WHEN u.c1 IS NULL
       |      THEN (CAST(COALESCE(r.n1r, 0) + 1 AS HUGEINT) * $Nano)
       |           // (k.t_types + k.v_types + 1)
       |      ELSE COALESCE((CAST(g.c12 AS HUGEINT) * $Nano - $DiscountNano) // u.c1, 0)
       |        + (((CAST($DiscountNano AS HUGEINT) * u.n1l) // u.c1)
       |           * ((CAST(COALESCE(r.n1r, 0) + 1 AS HUGEINT) * $Nano)
       |              // (k.t_types + k.v_types + 1)))
       |          // $Nano
       |    END AS BIGINT) AS p_nano
       |  FROM bg b
       |  LEFT JOIN big g ON g.w1 = b.w1 AND g.w2 = b.w2
       |  LEFT JOIN uni u ON u.w1 = b.w1
       |  LEFT JOIN rgt r ON r.w2 = b.w2
       |  CROSS JOIN konst k),
       |perdoc AS (
       |  SELECT doc_id, lang, trained_on, COUNT(*) AS n_bigrams,
       |    CAST(SUM(length(bin(p_nano + 1)) - 1) AS BIGINT) AS sum_bits
       |  FROM sc GROUP BY 1, 2, 3),
       |scored AS (SELECT *, (sum_bits * 100) // n_bigrams AS avg_cb FROM perdoc),
       |hist AS (SELECT avg_cb, COUNT(*) AS nv FROM scored GROUP BY 1),
       |cum AS (SELECT avg_cb, SUM(nv) OVER (ORDER BY avg_cb DESC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
       |cuts AS (SELECT
       |    MAX(CASE WHEN cum >= (n + 2) // 3 THEN avg_cb END) AS h_cut,
       |    MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN avg_cb END) AS m_cut
       |  FROM cum CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored))
       |SELECT CASE WHEN avg_cb >= h_cut THEN 'head'
       |            WHEN avg_cb >= m_cut THEN 'middle' ELSE 'tail' END AS bucket,
       |  lang, trained_on, COUNT(*) AS n_docs,
       |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(sum_bits) AS BIGINT) AS sum_bits,
       |  MIN(avg_cb) AS min_avg_centibits,
       |  MAX(avg_cb) AS max_avg_centibits
       |FROM scored CROSS JOIN cuts
       |GROUP BY 1, 2, 3
       |ORDER BY bucket, lang, trained_on""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ppl01_kn_perplexity_buckets", ppl01, Some(ppl01Oracle)),
  )
}
