package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the ppl01 KN-perplexity operator's three load-bearing pieces:
  * the fixed-point Kneser–Ney arithmetic (against an independent scalar
  * reimplementation in this spec — a third implementation next to the
  * Spark plan and the DuckDB oracle), the OOV floor path, and the
  * histogram threshold-cut bucket semantics (ties inclusive), plus the
  * self-training signature on real testdata.
  */
class LangModelSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private val Nano = LangModel.Nano
  private val D = LangModel.DiscountNano

  /** JVM mirror of the engine-neutral md5 train split. */
  private def isTrain(id: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"ppl:$id".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % LangModel.TrainMod == 0
  }

  /** Scalar reimplementation of the whole scoring pipeline (train-side
    * counts + fixed-point KN + bin-length bits), independent of both the
    * Spark plan and the oracle SQL.
    */
  private def scalarScore(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    def toks(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
    def bigs(t: String) = { val w = toks(t); (1 until w.length).map(i => (w(i - 1), w(i))) }
    val train = docs.filter { case (id, _) => isTrain(id) }
    val big = train.flatMap { case (_, t) => bigs(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val uni = big.toSeq.groupBy(_._1._1).map { case (w1, xs) =>
      w1 -> (xs.map(_._2).sum, xs.size.toLong) // (c1, n1l)
    }
    val rgt = big.toSeq.groupBy(_._1._2).map { case (w2, xs) => w2 -> xs.size.toLong }
    val t = big.size.toLong
    val v = rgt.size.toLong
    def pNano(w1: String, w2: String): Long = {
      val pcont = ((rgt.getOrElse(w2, 0L) + 1) * Nano) / (t + v + 1)
      uni.get(w1) match {
        case None => pcont
        case Some((c1, n1l)) =>
          val term1 = big.get((w1, w2)).map(c => (c * Nano - D) / c1).getOrElse(0L)
          term1 + ((D * n1l / c1) * pcont) / Nano
      }
    }
    def bits(p: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(p + 1)
    docs.flatMap { case (id, text) =>
      val bs = bigs(text)
      if (bs.isEmpty) None
      else {
        val sb = bs.map { case (a, b) => bits(pNano(a, b)) }.sum
        Some(id -> (bs.size.toLong, sb, (sb * 100) / bs.size))
      }
    }.toMap
  }

  // planted ids with a known split: isTrain varies with the md5, so pick
  // a window wide enough to contain both kinds
  private val ids = (0L until 24L)
  private val trainIds = ids.filter(isTrain)

  test("the md5 split selects both train and held-out docs in the window") {
    assert(trainIds.nonEmpty && trainIds.size < ids.size)
  }

  test("fixed-point KN scoring matches the independent scalar reimplementation") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat",
      "the dog sat on the log",
      "a cat and a dog and a bird",
      "the bird sat on the cat",
      "completely novel vocabulary here",
      "the the the the",
      "one token-pair",
      "x", // single token → no bigram → excluded
      "  spaced   out   words  ",
    )
    val docs = ids.map(id => (id, texts((id % texts.size).toInt)))
    val df = docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = LangModel.score(df.select($"doc_id", $"lang", $"text"))
      .select($"doc_id", $"n_bigrams", $"sum_bits", $"avg_cb")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = scalarScore(docs)
    assert(got.keySet === want.keySet) // single-token docs excluded on both sides
    for ((id, w) <- want) assert(got(id) === w, s"doc $id")
  }

  test("a fully-OOV doc scores every bigram at the continuation floor") {
    import spark.implicits._
    // one guaranteed-train doc provides the model; one held-out doc shares
    // no vocabulary with it
    val trainId = ids.find(isTrain).get
    val oovId = ids.find(!isTrain(_)).get
    val df = Seq(
      (trainId, "alpha beta gamma alpha beta"),
      (oovId, "zeta eta theta iota"),
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val row = LangModel.score(df.select($"doc_id", $"lang", $"text"))
      .filter($"doc_id" === oovId).collect().head
    // model: 3 bigram types (alpha→beta repeats), 3 continuation words →
    // pcont floor = 1e9/7
    val floorBits = 63 - java.lang.Long.numberOfLeadingZeros(Nano / 7 + 1)
    assert(row.getAs[Long]("n_bigrams") === 3L)
    assert(row.getAs[Long]("sum_bits") === 3L * floorBits)
  }

  test("threshold cuts are tie-inclusive and land at ceil(N/3)/ceil(2N/3)") {
    import spark.implicits._
    // 9 docs, avg_cb 90,80,80,70,60,50,40,30,20: N=9 → positions 3 and 6
    // (desc) give h_cut=80 (ties pull BOTH 80s into head), m_cut=50
    val scored = Seq(
      (1L, 90L), (2L, 80L), (3L, 80L), (4L, 70L), (5L, 60L),
      (6L, 50L), (7L, 40L), (8L, 30L), (9L, 20L),
    ).toDF("doc_id", "avg_cb")
      .select($"doc_id", lit("en").as("lang"), lit(false).as("trained_on"),
        lit(1L).as("n_bigrams"), $"avg_cb".as("sum_bits"), $"avg_cb")
    val got = LangModel.bucketed(scored)
      .select($"doc_id", $"bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "middle", 5L -> "middle", 6L -> "middle",
      7L -> "tail", 8L -> "tail", 9L -> "tail"))
  }

  test("tie straddling a cut pulls the whole tie group up (threshold, not rank)") {
    import spark.implicits._
    // N=6: k1=2 → value at desc position 2 is 70, but three docs tie at 70
    // → head has 4 docs (thresholds are tie-inclusive, CCNet semantics)
    val scored = Seq(
      (1L, 90L), (2L, 70L), (3L, 70L), (4L, 70L), (5L, 40L), (6L, 30L),
    ).toDF("doc_id", "avg_cb")
      .select($"doc_id", lit("en").as("lang"), lit(false).as("trained_on"),
        lit(1L).as("n_bigrams"), $"avg_cb".as("sum_bits"), $"avg_cb")
    val buckets = LangModel.bucketed(scored)
      .groupBy($"bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets("head") === 4L)
    assert(buckets.getOrElse("middle", 0L) === 0L) // h_cut == m_cut=70 → middle empty
    assert(buckets("tail") === 2L)
  }

  test("fixed-point KN is a (sub-)probability: per-context mass stays under Nano") {
    // For every seen context w1, the true KN distribution sums to exactly 1
    // over an infinite vocabulary; our fixed-point form only ever rounds
    // DOWN (integer div) and adds the +1-smoothed continuation floor, so
    // over the SEEN vocabulary the mass must stay ≤ Nano plus the floor
    // mass the unseen tail would claim. A regression that double-counts
    // the discount or drops a div shows up as mass far past Nano.
    val docs = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "a cat and a dog and a bird", "the bird sat on the cat",
      "the the the the", "one two three four five six seven",
    )
    // scalar model over ALL docs as train (ids chosen all-train not needed:
    // reuse scalarScore's internals by building the model directly)
    def toks(t: String) = t.split(" ")
    val big = docs.flatMap { t => val w = toks(t); (1 until w.length).map(i => (w(i - 1), w(i))) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val uni = big.toSeq.groupBy(_._1._1).map { case (w1, xs) =>
      w1 -> (xs.map(_._2).sum, xs.size.toLong)
    }
    val rgt = big.toSeq.groupBy(_._1._2).map { case (w2, xs) => w2 -> xs.size.toLong }
    val t = big.size.toLong
    val v = rgt.size.toLong
    val vocab = (uni.keySet ++ rgt.keySet).toSeq
    for ((w1, (c1, n1l)) <- uni) {
      val mass = vocab.map { w2 =>
        val pcont = ((rgt.getOrElse(w2, 0L) + 1) * Nano) / (t + v + 1)
        val term1 = big.get((w1, w2)).map(c => (c * Nano - D) / c1).getOrElse(0L)
        term1 + ((D * n1l / c1) * pcont) / Nano
      }.sum
      // the +1 smoothing adds ≤ |vocab|·Nano/(t+v+1) of floor mass
      val slack = vocab.size.toLong * Nano / (t + v + 1)
      assert(mass <= Nano + slack, s"context '$w1' mass $mass > ${Nano + slack}")
      assert(mass >= Nano / 2, s"context '$w1' mass $mass suspiciously low")
    }
  }

  test("self-training signature on sf0.001: train docs concentrate in the head") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("ppl01_kn_perplexity_buckets")(spark, sfSmoke)
      .collect()
    val byBucket = out.groupBy(_.getString(0)).map { case (b, rs) =>
      b -> (rs.filter(_.getBoolean(2)).map(_.getLong(3)).sum, // trained docs
        rs.map(_.getLong(3)).sum) // all docs
    }
    val (ht, ha) = byBucket("head")
    val (tt, ta) = byBucket("tail")
    assert(ht.toDouble / ha > tt.toDouble / ta,
      s"head train-frac ${ht}/${ha} should exceed tail ${tt}/${ta}")
  }
}
