package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantic checks for the data-mixing family (mx01 DSIR importance
  * weights, mx02 UniMax allocation) and the gv05 geometric-mechanism DP
  * release. Value-level equality with DuckDB is the driver gate's job;
  * these pin the algorithmic invariants a hash compare can't explain when
  * it breaks.
  */
class MixingSpec extends AnyFunSuite with SparkSpec {

  private val dir = sfSmoke

  test("mx01: covers every scoreable doc; keep flag consistent with the mean ratio") {
    val rows = Mixing.mx01(spark, dir).collect()
    val scoreable = graft.Tables.documents(spark, dir)
      .filter(size(filter(split(TextAnalysis.normalize(col("text")), " "),
        x => x =!= "")) >= 2)
      .count()
    assert(rows.length == scoreable, s"${rows.length} scored vs $scoreable scoreable")
    rows.foreach { r =>
      val (n, w, avg, keep) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(n >= 1 && w >= 0)
      assert(avg == w / n, s"avg_wppm $avg != $w div $n")
      assert(keep == (avg >= 1000000L))
    }
  }

  test("mx01: target-language docs score higher on average than the rest") {
    // The whole point of importance weighting: the target sample's own
    // feature mix must be preferred. Compare mean avg_wppm by language.
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "lang")
    val scored = Mixing.mx01(spark, dir).join(docs, "doc_id")
    val byLang = scored.groupBy(col("lang") === Mixing.TargetLang)
      .agg(avg(col("avg_wppm")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"target mean ${byLang(true)} not above non-target ${byLang(false)}")
  }

  test("mx02: allocations respect caps, exhaust the budget, and level the unsaturated") {
    val rows = Mixing.mx02(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val budget = 3L * total / 4L
    rows.foreach { r =>
      val (nTok, cap, alloc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cap == nTok * Mixing.MaxEpochs)
      assert(alloc <= cap, s"${r.getString(0)}: alloc $alloc exceeds cap $cap")
      assert(alloc >= 0)
    }
    // waterfill exhausts the budget exactly unless everything saturated
    val allSat = rows.forall(_.getBoolean(4))
    if (!allSat)
      assert(rows.map(_.getLong(3)).sum == budget,
        s"allocs sum ${rows.map(_.getLong(3)).sum} != budget $budget")
    // unsaturated languages all sit within 1 token of the water level
    val unsat = rows.filterNot(_.getBoolean(4)).map(_.getLong(3))
    if (unsat.nonEmpty)
      assert(unsat.max - unsat.min <= 1,
        s"unsaturated allocations not level: ${unsat.toSeq}")
    // saturation is a prefix of the cap-ascending order
    val byCap = rows.sortBy(r => (r.getLong(2), r.getString(0)))
    val firstUnsat = byCap.indexWhere(!_.getBoolean(4))
    if (firstUnsat >= 0)
      assert(byCap.drop(firstUnsat).forall(!_.getBoolean(4)),
        "saturated set is not a prefix of the cap-sorted order")
  }

  test("unimaxAlloc closed form equals a sequential waterfill on 100 random instances") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val instances = (0L until 100L).map { inst =>
      val k = 1 + rnd.nextInt(8)
      inst -> (0 until k).map(j => (s"k$j", 1L + rnd.nextInt(1000)))
    }
    val df = instances.flatMap { case (inst, keys) =>
      keys.map { case (key, n) => (inst, key, n) }
    }.toDF("inst", "key", "n_tokens")
    val maxEpochs = 2L
    val got = Mixing.unimaxAlloc(df, maxEpochs, budgetNum = 3L, budgetDen = 4L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    // independent reference: the textbook sequential waterfill
    instances.foreach { case (inst, keys) =>
      val caps = keys.map { case (key, n) => (n * maxEpochs, key) }.sorted
      val budget = 3L * keys.map(_._2).sum / 4L
      val k = caps.length
      var rem = budget
      var idx = 0
      val alloc = scala.collection.mutable.Map[String, Long]()
      // saturate smallest caps while they fit under the even split
      while (idx < k && caps(idx)._1 * (k - idx) <= rem) {
        alloc(caps(idx)._2) = caps(idx)._1
        rem -= caps(idx)._1
        idx += 1
      }
      val unsat = k - idx
      if (unsat > 0) {
        val level = rem / unsat
        val extra = rem % unsat
        caps.drop(idx).zipWithIndex.foreach { case ((_, key), j) =>
          alloc(key) = level + (if (j < extra) 1L else 0L)
        }
      }
      keys.foreach { case (key, _) =>
        assert(got((inst, key)) == alloc(key),
          s"inst $inst key $key: closed-form ${got((inst, key))} != sequential ${alloc(key)}")
      }
    }
  }

  test("mx02: at this budget both branches are exercised") {
    val rows = Mixing.mx02(spark, dir).collect()
    assert(rows.exists(_.getBoolean(4)), "no language saturated — budget too small a test")
    assert(rows.exists(!_.getBoolean(4)), "every language saturated — budget too large a test")
  }

  test("mx03: tempered shares sum to exactly 1e6 and flatten toward uniform") {
    val rows = Mixing.mx03(spark, dir).collect()
    assert(rows.nonEmpty)
    val temp = rows.map(_.getLong(4))
    assert(temp.sum == 1000000L, s"shares sum ${temp.sum} != 1e6")
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(4) > r.getLong(3)))
      // isqrt is exact: sq^2 <= n < (sq+1)^2
      val (n, sq) = (r.getLong(1), r.getLong(2))
      assert(sq * sq <= n && n < (sq + 1) * (sq + 1), s"isqrt wrong for $n: $sq")
    }
    // temperature flattens: the head language's tempered share is below its
    // raw share, the smallest language's is above
    val byN = rows.sortBy(_.getLong(1))
    assert(byN.last.getLong(4) < byN.last.getLong(3), "head not flattened")
    assert(byN.head.getLong(4) > byN.head.getLong(3), "tail not boosted")
    // tempered distribution is closer to uniform than the raw one
    val k = rows.length
    def dev(xs: Array[Long]) = xs.map(x => math.abs(x - 1000000L / k)).sum
    assert(dev(temp) < dev(rows.map(_.getLong(3))), "temperature did not flatten")
  }

  test("c11: covers every doc; verdict consistent; classifier beats chance in-sample") {
    val rows = Mixing.c11(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (n, avg, pred) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(n >= 1)
      assert(pred == (avg >= 1000000L))
    }
    val acc = rows.count(r => r.getBoolean(1) == r.getBoolean(4)).toDouble / rows.length
    assert(acc > 0.5, s"in-sample accuracy $acc not above chance")
    // class means separate in the right direction
    val (cur, crawl) = rows.partition(_.getBoolean(1))
    def mean(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(_.getLong(3)).sum.toDouble / xs.length
    assert(mean(cur) > mean(crawl),
      s"curated mean ${mean(cur)} not above crawl ${mean(crawl)}")
  }

  test("gv05: noise bounded, release clamped, deterministic per key") {
    val a = Profile.gv05(spark, dir).collect()
    val b = Profile.gv05(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "gv05 is not deterministic")
    a.foreach { r =>
      val (n, noise, rel) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(noise >= -60 && noise <= 60, s"noise $noise out of range")
      assert(rel == math.max(n + noise, 0L))
    }
  }

  test("gv06: full domain grid released — empty cells noised too") {
    import org.apache.spark.sql.functions._
    val rows = Profile.gv06(spark, dir).collect()
    val docs = graft.Tables.documents(spark, dir)
    val nSources = docs.select("source").distinct().count()
    val nLangs = docs.select("lang").distinct().count()
    assert(rows.length == nSources * nLangs,
      s"${rows.length} cells != $nSources x $nLangs grid")
    // absence must not leak: empty cells carry a real draw from the same
    // sampler as occupied cells. Falsifiable form (round-10 advice — the
    // old `exists(!=0) || forall(==0)` was a tautology): recompute every
    // cell's noise INDEPENDENTLY (own MessageDigest md5 + bitlen walk, no
    // Spark expressions) and require an exact match, empty or not.
    def independentNoise(source: String, lang: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"gv06:$source:$lang".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = 3L * java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val pow60 = 1L << 60
      if (v < pow60) java.lang.Long.toBinaryString(v).length.toLong - 61L
      else 61L - java.lang.Long.toBinaryString(3L * pow60 - 1L - v).length
    }
    val empty = rows.filter(_.getLong(2) == 0L)
    assert(empty.nonEmpty, "grid has no empty cell — the property is vacuous at this SF")
    rows.foreach { r =>
      assert(r.getLong(3) == independentNoise(r.getString(0), r.getString(1)),
        s"cell (${r.getString(0)}, ${r.getString(1)}) noise ${r.getLong(3)} " +
          s"!= independent ${independentNoise(r.getString(0), r.getString(1))}")
      assert(r.getLong(3) >= -60 && r.getLong(3) <= 60)
      assert(r.getLong(4) == math.max(r.getLong(2) + r.getLong(3), 0L))
    }
    // and the draws are non-degenerate across the grid
    assert(rows.map(_.getLong(3)).distinct.length > 1,
      "noise column is constant across the full grid")
  }

  test("gv05: sampler matches the two-sided geometric distribution on a large uniform stream") {
    import spark.implicits._
    // 60-bit uniforms from the same md5 pipeline the release uses
    val n = 200000L
    val u = conv(substring(md5(concat(lit("gv05test:"), $"id".cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val hist = spark.range(n).select(Profile.geometricNoise(u).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // P(k) = (1/3)·2^{-|k|}: check the five central masses within 3σ-ish
    def p(k: Int): Double = math.pow(2.0, -math.abs(k)) / 3.0
    Seq(-2, -1, 0, 1, 2).foreach { k =>
      val got = hist.getOrElse(k.toLong, 0L).toDouble / n
      val want = p(k)
      val tol = 4.0 * math.sqrt(want * (1 - want) / n)
      assert(math.abs(got - want) <= tol,
        s"P($k): got $got want $want ± $tol")
    }
    // symmetry ⇒ mean ≈ 0
    val mean = hist.map { case (k, c) => k.toDouble * c }.sum / n
    assert(math.abs(mean) < 0.02, s"noise mean $mean not ~0")
  }
}
