package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ForecastSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // two synthetic series: trend+seasonality, enough rows for lag warm-up
  lazy val series = {
    val rows = for {
      key <- Seq("A", "B")
      i <- 0 until 120
    } yield {
      val base = if (key == "A") 100.0 else 300.0
      (key, f"2023-W$i%03d", base + 50 * math.sin(i / 8.0) + i * 0.5)
    }
    rows.toDF("country", "week", "cases")
  }

  test("ml05 feature hashing matches a driver-side recompute (buckets, signs, collisions)") {
    val rows = Forecast.ml05(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def h(prefix: String, t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((prefix + t).getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Tables.documents(spark, sfSmoke).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.take(25).foreach { case (docId, nnz, l1, net, collisions) =>
      val toks = graft.ops.TextAnalysis.normalizeJvm(docs(docId)).split(' ').filter(_.nonEmpty)
      val byBucket = toks.groupBy(t => h("f:", t) % 1024)
      val c = byBucket.view.mapValues(_.map(t => if (h("s:", t) % 2 == 0) 1L else -1L).sum)
      assert(nnz == byBucket.size)
      assert(l1 == c.values.map(math.abs).sum)
      assert(net == c.values.sum)
      assert(collisions == toks.distinct.length - byBucket.size)
      assert(nnz <= 1024 && l1 >= math.abs(net) && collisions >= 0)
    }
  }

  test("lag features: warm-up nulls then correct shifts") {
    val lagged = Forecast.lagFeatures(series, "country", "week", "cases")
    val a = lagged.filter($"country" === "A").orderBy($"week").collect()
    assert(a(0).isNullAt(a(0).fieldIndex("lag1")))
    assert(a(5).getAs[Double]("lag1") == a(4).getAs[Double]("cases"))
    assert(a(5).getAs[Double]("lag3") == a(2).getAs[Double]("cases"))
    // rolling window excludes the current row (no label leakage)
    val rolling = a(5).getAs[Double]("rolling4")
    val expected = (1 to 4).map(i => a(i).getAs[Double]("cases")).sum / 4
    assert(math.abs(rolling - expected) < 1e-9)
  }

  test("predict_cases parity: forecast FR weekly cases from the real star schema") {
    // the reference's GET /api/predict_cases shape (predict_france_with_model.py):
    // per-country history → model → N-step autoregressive rollout
    val star = graft.etl.EtlJob.run(spark, referenceDataDir)
    val series = star.weeklyStatistics.select(
      $"country_short_code".as("country"),
      $"date_of_report".as("week"),
      $"week_new_reported_cases".cast("double").as("cases"))
    val (preds, metrics) = Forecast.forecastSeries(
      series, "country", "week", "cases", key = "FR", steps = 4)
    assert(preds.length == 4)
    assert(preds.forall(p => !p.isNaN && !p.isInfinite && p >= 0))
    assert(metrics.keySet == Set("r2", "rmse", "mae"))
    assert(metrics("rmse") > 0)
  }

  test("forecast quality pin: per-country MAE on the WHO fixture stays bounded") {
    // The one observable delta vs the reference is the model family (MLlib
    // RF + rollout vs LSTM, SURVEY §7 hard-part 3); this pins the fit
    // quality on the committed WHO fixture (the reference's own spot-check
    // surface, predict_france_with_model.py:108-110) so a feature-prep or
    // training change can't silently regress forecast quality. Bounds are
    // the recorded deterministic MAEs (seed 42) × 1.25 headroom.
    import org.apache.spark.sql.functions.{abs => fabs, avg => favg}
    val star = graft.etl.EtlJob.run(spark, referenceDataDir)
    val series = star.weeklyStatistics.select(
      $"country_short_code".as("country"),
      $"date_of_report".as("week"),
      $"week_new_reported_cases".cast("double").as("cases"))
    val lagged = Forecast.lagFeatures(series, "country", "week", "cases")
    val (model, ready) = Forecast.train(lagged, "cases")
    // recorded round 7: FR 110571.0, IT 75217.1, DE 98082.1, ES 49585.6,
    // GB 56594.2 (deterministic at seed 42 on the committed fixture)
    val bounds = Map(
      "FR" -> 138000.0, "IT" -> 94000.0, "DE" -> 123000.0,
      "ES" -> 62000.0, "GB" -> 71000.0)
    val maes = model.transform(ready)
      .filter($"country".isin(bounds.keys.toSeq: _*))
      .select($"country", fabs($"prediction" - $"label").as("ae"))
      .groupBy($"country").agg(favg($"ae").as("mae"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    bounds.foreach { case (c, b) =>
      info(f"$c mae = ${maes(c)}%.1f (bound $b%.1f)")
      assert(maes(c) <= b, s"$c MAE ${maes(c)} exceeded pinned bound $b")
    }
  }

  test("RF forecast fits the series and rolls out finite predictions") {
    val (preds, metrics) = Forecast.forecastSeries(
      series, "country", "week", "cases", key = "A", steps = 6)
    assert(preds.length == 6)
    assert(preds.forall(p => !p.isNaN && !p.isInfinite))
    // in-sample fit on a smooth series should be strong
    assert(metrics("r2") > 0.8, s"r2 = ${metrics("r2")}")
    assert(metrics("rmse") > 0 && metrics("mae") > 0)
    // rollout stays in the series' ballpark (no divergence)
    assert(preds.forall(p => p > 0 && p < 1000))
  }
}
