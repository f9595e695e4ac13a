package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The pure-JVM LSTM: cell math pinned against a hand-unrolled double
  * recurrence, the committed reference checkpoint + label encoder loaded
  * and shape-checked, and the reference rollout exercised end-to-end on a
  * deterministic synthetic owid-shaped frame.
  */
class LstmSpec extends AnyFunSuite with SparkSpec {

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  test("single-cell forward matches the hand-unrolled recurrence") {
    // 1 input, 1 hidden: gates stack [i, f, g, o]
    val layer = Lstm.Layer(1, 1,
      wIh = Array(0.5f, -0.3f, 0.8f, 1.0f),
      wHh = Array(0.1f, 0.2f, -0.1f, 0.3f),
      bIh = Array(0.01f, 0.02f, 0.03f, 0.04f),
      bHh = Array(0.0f, 0.0f, 0.0f, 0.0f))
    val xs = Array(Array(1.0f), Array(0.5f))
    // hand recurrence in doubles
    var h = 0.0; var c = 0.0
    for (x <- Seq(1.0, 0.5)) {
      val i = sigmoid(0.5 * x + 0.01 + 0.1 * h)
      val f = sigmoid(-0.3 * x + 0.02 + 0.2 * h)
      val g = math.tanh(0.8 * x + 0.03 - 0.1 * h)
      val o = sigmoid(1.0 * x + 0.04 + 0.3 * h)
      c = f * c + i * g
      h = o * math.tanh(c)
    }
    val out = layer.runSeq(xs)
    assert(out.length == 2)
    assert(math.abs(out.last.head - h) < 1e-5, s"got ${out.last.head}, want $h")
    // linear head: fc(h_last) = 2·h + 0.5
    val net = Lstm.Network(Array(layer), Array(2.0f), 0.5f)
    assert(math.abs(net.forward(xs) - (2 * h + 0.5)) < 1e-5)
  }

  test("stacked layers feed every timestep downward, not just the last") {
    val l0 = Lstm.Layer(1, 1, Array(1f, 1f, 1f, 1f), Array(0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f), Array(0f, 0f, 0f, 0f))
    val l1 = Lstm.Layer(1, 1, Array(1f, 1f, 1f, 1f), Array(0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f), Array(0f, 0f, 0f, 0f))
    val net = Lstm.Network(Array(l0, l1), Array(1f), 0f)
    val twoStep = net.forward(Array(Array(1f), Array(1f)))
    // if layer 1 only saw the last step, this would equal the 1-step output
    val oneStep = net.forward(Array(Array(1f)))
    assert(twoStep != oneStep)
  }

  test("committed label encoder: 215 sorted classes, France at id 68") {
    val classes = Lstm.referenceClasses
    assert(classes.length == 215)
    assert(classes.head == "Afghanistan" && classes.last == "Zimbabwe")
    assert(classes.toSeq == classes.toSeq.sorted) // LabelEncoder sorts
    assert(classes(68) == "France")
    assert(classes.indexOf("Italy") >= 0 && classes.indexOf("Germany") >= 0)
  }

  test("committed checkpoint loads with the declared architecture") {
    val net = Lstm.referenceModel
    assert(net.layers.length == 2)
    assert(net.inputSize == Lstm.NumFeatures + Lstm.referenceClasses.length) // 218
    assert(net.layers(0).hiddenSize == 128 && net.layers(1).inputSize == 128)
    assert(net.fcW.length == 128)
    // deterministic, finite forward on a fixed window
    val window = Array.tabulate(Lstm.Lookback)(t =>
      Array.tabulate(net.inputSize)(j =>
        if (j < 3) ((t + j) % 7).toFloat / 7f else if (j == 3 + 68) 1f else 0f))
    val y1 = net.forward(window)
    val y2 = net.forward(window)
    assert(y1 == y2 && !y1.isNaN && !y1.isInfinite)
  }

  test("GOLDEN: forward pass + rollout pinned on the committed weights") {
    // Frozen values from this verified loader+cell-math on the committed
    // checkpoint (no torch in this environment — see Lstm.scala:28-33 for
    // the float32-roundoff contract). Any loader permutation or cell-math
    // regression now fails with a VALUE diff, not just a shape check.
    val classes = Lstm.referenceClasses
    val net = Lstm.referenceModel
    val window = Array.tabulate(Lstm.Lookback)(t =>
      Array.tabulate(net.inputSize)(j =>
        if (j < 3) ((t + j) % 7).toFloat / 7f else if (j == 3 + 68) 1f else 0f))
    assert(math.abs(net.forward(window) - 0.2793654f) < 1e-4,
      s"forward drifted: ${net.forward(window)}")
    val history = Array.tabulate(60)(t => Array(
      1000.0 + 500.0 * math.sin(t / 5.0) + 10 * t, 200.0 + t, 1e6 + 1000.0 * t))
    val got = Lstm.predictCases(net, history, 60, classes.indexOf("France"),
      classes.length, 5)
    val want = Seq(1266.961240150283, 1203.412980853683, 1053.3500091459634,
      991.3235615233684, 907.1805387348315)
    got.toSeq.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < math.abs(w) * 1e-4, s"rollout drifted: $g vs $w")
    }
  }

  test("minMaxScale: sklearn semantics incl. zero-range columns") {
    val (scaled, min0, range0) = Lstm.minMaxScale(Array(
      Array(10.0, 5.0, 1.0), Array(20.0, 5.0, 3.0), Array(15.0, 5.0, 2.0)))
    assert(min0 == 10.0 && range0 == 10.0)
    assert(scaled(0)(0) == 0.0 && scaled(1)(0) == 1.0 && scaled(2)(0) == 0.5)
    assert(scaled.forall(_(1) == 0.0)) // constant column → scale 1, all zero
    assert(scaled(1)(2) == 1.0)
  }

  test("reference rollout on the real weights: shape, determinism, inverse scaling") {
    val classes = Lstm.referenceClasses
    val net = Lstm.referenceModel
    // 60-day synthetic France series (deterministic; ≥ Lookback rows)
    val history = Array.tabulate(60)(t => Array(
      1000.0 + 500.0 * math.sin(t / 5.0) + 10 * t, 200.0 + t, 1e6 + 1000.0 * t))
    val days = 5
    val p1 = Lstm.predictCases(net, history, 60, classes.indexOf("France"), classes.length, days)
    val p2 = Lstm.predictCases(net, history, 60, classes.indexOf("France"), classes.length, days)
    assert(p1.length == days)
    assert(p1.toSeq == p2.toSeq)
    assert(p1.forall(v => !v.isNaN && !v.isInfinite))
    // inverse transform puts predictions on the raw-cases scale: a scaled
    // output in sigmoid/tanh territory can't leave min0 ± a few ranges
    val min0 = history.map(_(0)).min
    val max0 = history.map(_(0)).max
    val range = max0 - min0
    assert(p1.forall(v => v > min0 - 3 * range && v < max0 + 3 * range), p1.toSeq)
    // a different country id changes the one-hot and thus the forecast
    val pOther = Lstm.predictCases(net, history, 60, classes.indexOf("Italy"), classes.length, days)
    assert(pOther.toSeq != p1.toSeq)
  }

  test("scaler fits on the FULL series: post-start rows that move min/max change predictions") {
    // the reference fit_transforms BEFORE slicing at start_idx
    // (predict_france_with_model.py:67-83), so a mid-series start_date must
    // see a scaler whose min/max includes the later rows
    val classes = Lstm.referenceClasses
    val net = Lstm.referenceModel
    val base = Array.tabulate(60)(t => Array(
      1000.0 + 500.0 * math.sin(t / 5.0) + 10 * t, 200.0 + t, 1e6 + 1000.0 * t))
    // same first 55 rows; the 5 post-start rows spike new_cases far above
    // the pre-start max, moving column 0's fitted range
    val spiked = base.clone()
    (55 until 60).foreach(t => spiked(t) = Array(50000.0, 200.0 + t, 1e6 + 1000.0 * t))
    val startIdx = 55
    val fr = classes.indexOf("France")
    val pBase = Lstm.predictCases(net, base, startIdx, fr, classes.length, 3)
    val pSpiked = Lstm.predictCases(net, spiked, startIdx, fr, classes.length, 3)
    // identical pre-start window; only the post-start rows differ — under a
    // pre-start-only fit these would be equal
    assert(pBase.toSeq != pSpiked.toSeq)
    // and the spiked fit must match fitting the full spiked series directly
    val (_, min0, range0) = Lstm.minMaxScale(spiked)
    assert(min0 == spiked.map(_(0)).min)
    assert(range0 == spiked.map(_(0)).max - spiked.map(_(0)).min)
    // out-of-range start indices are refused (the serving layer 400s first)
    assertThrows[IllegalArgumentException](
      Lstm.predictCases(net, base, Lstm.Lookback - 1, fr, classes.length, 3))
    assertThrows[IllegalArgumentException](
      Lstm.predictCases(net, base, 61, fr, classes.length, 3))
    // startIdx == length (forecast from the end) is a documented extension
    // beyond the reference's reachable states (round-9 advice resolution:
    // the serving layer enforces the reference's row-at/after-start guard;
    // direct callers may roll out from the series end — the golden tests do)
    assert(Lstm.predictCases(net, base, base.length, fr, classes.length, 3).length == 3)
  }

  test("prepareOwid + countryHistory apply the reference filters") {
    import spark.implicits._
    val owid = Seq(
      ("France", "2020-03-01", Some(100.0), Some(10.0), Some(0.0)),
      ("France", "2020-03-02", None, Some(10.0), Some(0.0)), // null cases: drop
      ("France", "2020-03-03", Some(0.0), Some(10.0), Some(0.0)), // non-positive: drop
      ("France", "2019-12-31", Some(50.0), Some(10.0), Some(0.0)), // pre-2020: drop
      ("France", "2020-03-04", Some(200.0), None, None), // null feats → 0
      ("France", "2020-03-05", Some(300.0), Some(1.0), Some(2.0)),
      ("Atlantis", "2020-03-01", Some(9.0), Some(1.0), Some(1.0)), // unknown location
    ).toDF("location", "date", "new_cases", "new_tests", "people_vaccinated")
    val prepared = Lstm.prepareOwid(owid, Set("France", "Italy"))
    // the FULL filtered series comes back (rows at/after any start_date
    // included — the scaler needs them), with aligned ISO dates
    val (dates, hist) = Lstm.countryHistory(prepared, "France")
    assert(dates.toSeq == Seq("2020-03-01", "2020-03-04", "2020-03-05"))
    assert(hist.toSeq.map(_.toSeq) == Seq(
      Seq(100.0, 10.0, 0.0), Seq(200.0, 0.0, 0.0), Seq(300.0, 1.0, 2.0)))
  }
}
