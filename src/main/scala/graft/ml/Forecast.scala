package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.queries.Q

/** ML parity-lite (SURVEY.md §2.9, §3.3): the reference's LSTM forecasting
  * path re-expressed as lag-feature frames + an MLlib RandomForestRegressor
  * applied autoregressively on the driver, with RegressionEvaluator metrics
  * (this also covers the RF of app/routes/metrics.py).
  *
  * Feature prep is fully distributed (windows per series key); only the
  * 30-step autoregressive loop runs on the driver, over ONE collected tail
  * per series (the reference does the same with its LSTM,
  * predict_france_with_model.py:90-101 — a per-request scalar loop, not a
  * data-parallel job).
  */
object Forecast {

  val NumLags = 4

  /** Per-key lag features + rolling mean over an ordered series
    * (W6 scaled down: the reference's 50-step lookback becomes lag columns;
    * `collect_list` of 50 values per row would 50× the data — lags keep it
    * linear).
    */
  def lagFeatures(series: DataFrame, keyCol: String, timeCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val withLags = (1 to NumLags).foldLeft(series) { (df, i) =>
      df.withColumn(s"lag$i", lag(col(valueCol), i).over(w))
    }
    // frame ends at -1: a (-3, 0) frame would fold the LABEL into its own
    // feature (leakage) and diverge from the rollout, which can only average
    // already-known values
    withLags.withColumn("rolling4",
      avg(col(valueCol)).over(w.rowsBetween(-4, -1)))
  }

  /** Fit an RF regressor on the lagged frame (nulls from the warm-up rows
    * dropped). Deterministic: fixed seed.
    */
  def train(lagged: DataFrame, valueCol: String): (RandomForestRegressionModel, DataFrame) = {
    val featureCols = (1 to NumLags).map(i => s"lag$i") :+ "rolling4"
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val ready = assembler.transform(
      lagged.na.drop(featureCols :+ valueCol))
      .withColumn("label", col(valueCol).cast("double"))
    val rf = new RandomForestRegressor()
      .setNumTrees(50).setMaxDepth(8).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
    (rf.fit(ready), ready)
  }

  /** R² / RMSE / MAE via RegressionEvaluator (reference metrics surface:
    * app/routes/metrics.py:37-38 + MAE at predict_france_with_model.py:108).
    */
  def evaluate(model: RandomForestRegressionModel, ready: DataFrame): Map[String, Double] = {
    val scored = model.transform(ready)
    Seq("r2", "rmse", "mae").map { m =>
      m -> new RegressionEvaluator()
        .setLabelCol("label").setPredictionCol("prediction").setMetricName(m)
        .evaluate(scored)
    }.toMap
  }

  /** Driver-side autoregressive rollout: feed each prediction back as the
    * next lag-1 (the reference's 30-day loop,
    * predict_france_with_model.py:90-97). `history` is the series tail,
    * oldest → newest, length ≥ NumLags.
    */
  def autoregressive(model: RandomForestRegressionModel, history: Seq[Double], steps: Int): Seq[Double] = {
    require(history.length >= NumLags, s"need ≥ $NumLags history points")
    val buf = scala.collection.mutable.ArrayBuffer(history: _*)
    (1 to steps).map { _ =>
      val recent = buf.takeRight(NumLags).reverse // lag1 = newest
      // mean of the last 4 KNOWN values == the training frame's (-4, -1)
      // rolling window evaluated at the predicted row
      val rolling = buf.takeRight(4).sum / math.min(4, buf.length)
      val pred = model.predict(Vectors.dense((recent :+ rolling).toArray))
      buf += pred
      pred
    }.toSeq
  }

  /** End-to-end forecast for one key of a series frame: distributed feature
    * prep + fit, then a collected tail drives the rollout.
    */
  def forecastSeries(
      series: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      key: String, steps: Int,
  ): (Seq[Double], Map[String, Double]) = {
    val lagged = lagFeatures(series, keyCol, timeCol, valueCol)
    val (model, ready) = train(lagged, valueCol)
    val tail = series.filter(col(keyCol) === key)
      .orderBy(col(timeCol).desc).limit(NumLags * 2) // only the tail leaves the cluster
      .orderBy(col(timeCol))
      .select(col(valueCol).cast("double")).collect().map(_.getDouble(0)).toSeq
    (autoregressive(model, tail, steps), evaluate(model, ready))
  }

  /** Forecast EVERY key of a series frame in one distributed pass — the
    * producer of the reference's `predicted_weekly_statistics` serving table
    * (queried at app/routes/data.py:63-65 but never created by any reference
    * DDL/job — SURVEY.md §1.4; this is its intended semantics).
    *
    * Scale shape: one global model fit (distributed), broadcast to
    * executors; per-key tails are bounded by a window (`row_number ≤
    * 2·NumLags`), and the autoregressive rollout runs INSIDE
    * `flatMapGroups` — no per-key driver loop, no collect, so a corpus with
    * millions of series keys forecasts as one shuffle-by-key stage.
    *
    * @param stepDays horizon spacing (7 = weekly grain, matching the fact).
    */
  def forecastAll(
      series: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      steps: Int, stepDays: Int = 7,
  ): DataFrame = {
    val lagged = lagFeatures(series, keyCol, timeCol, valueCol)
    val (model, _) = train(lagged, valueCol)
    val spark = series.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    val tails = series
      .select(col(keyCol).cast("string").as("k"),
        col(timeCol).cast("date").as("t"), col(valueCol).cast("double").as("v"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("t").desc)))
      .filter(col("__rn") <= NumLags * 2).drop("__rn")
      .as[(String, java.sql.Date, Double)]
    tails.groupByKey(_._1).flatMapGroups { (k, it) =>
      val rows = it.toSeq.sortBy(_._2.getTime)
      if (rows.length < NumLags) Iterator.empty
      else {
        val preds = autoregressive(bc.value, rows.map(_._3), steps)
        val last = rows.last._2.getTime
        preds.iterator.zipWithIndex.map { case (p, i) =>
          (k, new java.sql.Date(last + (i + 1).toLong * stepDays * 86400000L), p)
        }
      }
    }.toDF(keyCol, timeCol, s"predicted_$valueCol")
      .orderBy(keyCol, timeCol)
  }

  /** ml01 — the lag-feature frame over events as an oracle-backed query
    * (ROWS-frame rolling mean + multi-lag windows: the feature-prep operator
    * of §3.3 as a first-class query).
    */
  def ml01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .agg(sum($"value".cast(DecimalType(18, 4))).cast("double").as("v"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("lag1", lag($"v", 1).over(w))
      .withColumn("lag2", lag($"v", 2).over(w))
      .withColumn("lag3", lag($"v", 3).over(w))
      .withColumn("rolling4_sum",
        sum($"v".cast(DecimalType(18, 4))).over(w.rowsBetween(-3, 0)).cast("double"))
      .withColumn("rolling4_n", count($"v").over(w.rowsBetween(-3, 0)))
      .withColumn("rolling4_avg", $"rolling4_sum" / $"rolling4_n")
      .orderBy($"event_type", $"day")
  }

  val ml01Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, v,
      |  lag(v, 1) OVER w AS lag1,
      |  lag(v, 2) OVER w AS lag2,
      |  lag(v, 3) OVER w AS lag3,
      |  CAST(SUM(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling4_sum,
      |  COUNT(v) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rolling4_n,
      |  CAST(SUM(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(v) OVER (PARTITION BY event_type ORDER BY day
      |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rolling4_avg
      |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |ORDER BY event_type, day""".stripMargin

  /** ml02 — regression-metrics parity (the reference's metrics endpoint,
    * app/routes/metrics.py:37-40, as a gated query): MAE / RMSE / R² of the
    * persistence baseline (prediction = previous week's total) over weekly
    * per-type series. A learned model's metrics can't be oracle-checked
    * (training is engine-specific — RegressionEvaluator parity is
    * spec-covered in ForecastSpec); the persistence baseline exercises the
    * identical metric arithmetic on a deterministic predictor.
    *
    * Bit-stability: every sum is integer-exact — values scale to 1e-4
    * "cents" (BIGINT), squared errors go through DECIMAL(19,0)×DECIMAL(19,0)
    * (fits both engines' 38-digit cap with zero scale, so no rounding), and
    * only the final ratios are IEEE doubles. R² uses the algebraic form
    * 1 − SSres / (Σa² − (Σa)²/n) to avoid a partition-order-dependent
    * double mean.
    */
  def ml02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weekly = Tables.events(s, dir)
      .groupBy($"event_type", date_trunc("week", $"ts").cast("date").as("wk"))
      .agg((sum($"value".cast(DecimalType(18, 4))) * 10000)
        .cast("long").as("a_cents"))
    val w = Window.partitionBy($"event_type").orderBy($"wk")
    val scored = weekly
      .withColumn("p_cents", lag($"a_cents", 1).over(w))
      .filter($"p_cents".isNotNull)
      .withColumn("err", $"a_cents" - $"p_cents")
    val d19 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(19, 0))
    scored
      .agg(
        count(lit(1)).as("n"),
        sum(d19(abs($"err"))).as("sum_abs"),
        sum(d19($"err") * d19($"err")).as("ss_res_c"),
        sum(d19($"a_cents")).as("sum_a"),
        sum(d19($"a_cents") * d19($"a_cents")).as("sum_a2"),
      )
      .select(
        $"n",
        ($"sum_abs".cast("double") / 1e4 / $"n").as("mae"),
        sqrt($"ss_res_c".cast("double") / 1e8 / $"n").as("rmse"),
        (lit(1.0) - $"ss_res_c".cast("double") /
          ($"sum_a2".cast("double") - $"sum_a".cast("double") * $"sum_a".cast("double") / $"n"))
          .as("r2"),
      )
  }

  val ml02Oracle: String =
    """WITH weekly AS (
      |  SELECT event_type, date_trunc('week', ts) AS wk,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS a_cents
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT *, a_cents - p_cents AS err FROM (
      |    SELECT event_type, wk, a_cents,
      |           lag(a_cents, 1) OVER (PARTITION BY event_type ORDER BY wk) AS p_cents
      |    FROM weekly)
      |  WHERE p_cents IS NOT NULL),
      |agg AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(abs(err) AS DECIMAL(19,0))) AS sum_abs,
      |    SUM(CAST(err AS DECIMAL(19,0)) * CAST(err AS DECIMAL(19,0))) AS ss_res_c,
      |    SUM(CAST(a_cents AS DECIMAL(19,0))) AS sum_a,
      |    SUM(CAST(a_cents AS DECIMAL(19,0)) * CAST(a_cents AS DECIMAL(19,0))) AS sum_a2
      |  FROM scored)
      |SELECT n,
      |  CAST(sum_abs AS DOUBLE) / 1e4 / n AS mae,
      |  sqrt(CAST(ss_res_c AS DOUBLE) / 1e8 / n) AS rmse,
      |  1.0 - CAST(ss_res_c AS DOUBLE)
      |    / (CAST(sum_a2 AS DOUBLE) - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE) / n) AS r2
      |FROM agg""".stripMargin

  /** ml05 — FEATURE HASHING (the "hashing trick", Weinberger et al. 2009;
    * Spark's HashingTF / Vowpal Wabbit's representation): each document's
    * tokens are projected into a FIXED 1024-bucket signed feature vector —
    * bucket = md5-prefix mod 1024, sign = one further hash bit — and the
    * gate emits per-doc integer vector facts: nnz (distinct live buckets),
    * l1 mass Σ|cᵢ|, net signed mass Σcᵢ, and the collision count
    * (distinct tokens − distinct buckets: vocabulary folded together).
    *
    * Why it matters at 100 TB: the hashing trick is the feature extractor
    * that needs NO vocabulary — no global distinct-token build, no
    * dictionary broadcast, no OOV handling; every mapper featurizes
    * independently at fixed width, the only cross-row structure being the
    * downstream learner's. Spark's own HashingTF uses murmur3 (not
    * engine-portable); the md5-prefix form here is the repo-standard
    * recomputable hash, so the DuckDB oracle rebuilds every bucket, sign,
    * and collision exactly. One narrow explode + one (doc, token)-grain
    * partial agg + one doc-grain agg — map-side combinable end to end.
    */
  def ml05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id",
        explode(split(graft.ops.TextAnalysis.normalize($"text"), " ")).as("token"))
      .filter($"token" =!= "")
    val hashed = toks.select(
      $"doc_id", $"token",
      (conv(substring(md5(concat(lit("f:"), $"token")), 1, 8), 16, 10)
        .cast("long") % 1024).as("bucket"),
      when(conv(substring(md5(concat(lit("s:"), $"token")), 1, 8), 16, 10)
        .cast("long") % 2 === 0, 1L).otherwise(-1L).as("sign"))
    hashed
      .groupBy($"doc_id", $"bucket")
      .agg(sum($"sign").as("c"), countDistinct($"token").as("n_toks"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("nnz"),
        sum(abs($"c")).as("l1"),
        sum($"c").as("net"),
        (sum($"n_toks") - count(lit(1))).as("collisions"))
      .orderBy($"doc_id")
  }

  val ml05Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, w AS token FROM (
      |    SELECT doc_id,
      |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |hashed AS (
      |  SELECT doc_id, token,
      |    ('0x' || substring(md5('f:' || token), 1, 8))::BIGINT % 1024 AS bucket,
      |    CASE WHEN ('0x' || substring(md5('s:' || token), 1, 8))::BIGINT % 2 = 0
      |         THEN 1 ELSE -1 END AS sign
      |  FROM toks),
      |per_bucket AS (
      |  SELECT doc_id, bucket, SUM(sign) AS c, COUNT(DISTINCT token) AS n_toks
      |  FROM hashed GROUP BY doc_id, bucket)
      |SELECT doc_id,
      |  COUNT(*) AS nnz,
      |  CAST(SUM(ABS(c)) AS BIGINT) AS l1,
      |  CAST(SUM(c) AS BIGINT) AS net,
      |  CAST(SUM(n_toks) - COUNT(*) AS BIGINT) AS collisions
      |FROM per_bucket GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("ml01_lag_features", ml01, Some(ml01Oracle)),
    Q("ml02_persistence_metrics", ml02, Some(ml02Oracle)),
    Q("ml05_feature_hashing", ml05, Some(ml05Oracle)),
  )
}
