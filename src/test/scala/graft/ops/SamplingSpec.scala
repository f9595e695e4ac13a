package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.Tables

class SamplingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("hash sample: deterministic, near-target rate, monotone in percent") {
    val docs = Tables.documents(spark, sfSmoke)
    val s30a = Sampling.hashSample(docs, $"doc_id", 30).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s30b = Sampling.hashSample(docs, $"doc_id", 30).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s30a == s30b) // pure function of the key
    val rate = s30a.size.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"rate $rate")
    // smaller sample is a subset of the larger one (prefix-threshold property)
    val s10 = Sampling.hashSample(docs, $"doc_id", 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30a))
  }

  test("c03 mixing: per-source rates follow the weight tiers; downweight is a subset") {
    val docs = Tables.documents(spark, sfSmoke)
    val kept = docs.filter(Sampling.mixFilter($"doc_id", $"source", Sampling.MixWeights))
    val rateOf: Map[String, Double] = {
      val total = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      kept.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / total(r.getString(0))).toMap
    }
    // tier means separate: 90% tier must clearly exceed the 10% tier
    val hi = Sampling.MixWeights.head._1.flatMap(rateOf.get)
    val lo = Sampling.MixWeights.last._1.flatMap(rateOf.get)
    assert(hi.nonEmpty && lo.nonEmpty)
    assert(hi.sum / hi.size > 0.6, s"high tier ${hi.sum / hi.size}")
    assert(lo.sum / lo.size < 0.4, s"low tier ${lo.sum / lo.size}")
    // halving every weight keeps a strict subset (prefix-threshold property)
    val halved = Sampling.MixWeights.map { case (srcs, pct) => (srcs, pct / 2) }
    val keptHalf = docs.filter(Sampling.mixFilter($"doc_id", $"source", halved))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFull = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptHalf.subsetOf(keptFull))
  }

  test("q49 budget selection keeps a best-first prefix within the token budget") {
    val rows = Sampling.q49(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 1 && kept <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_kept") <= Sampling.TokenBudget)
    }
  }

  test("ml03 k-fold: every row lands in exactly one fold, folds roughly balanced") {
    val rows = Sampling.ml03(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Int]("fold")).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.customer(spark, sfSmoke).count()) // a partition, not a sample
    val perFold = rows.groupBy(_.getAs[Int]("fold")).view.mapValues(_.map(_.getAs[Long]("n_rows")).sum)
    val (mn, mx) = (perFold.values.min, perFold.values.max)
    assert(mx <= 2 * mn, s"fold imbalance $perFold") // md5 quartiles ≈ uniform
    // fold assignment is a pure function of the key: recompute one row
    val f0 = Tables.customer(spark, sfSmoke)
      .select(Sampling.foldOf($"c_custkey").as("fold")).collect().map(_.getInt(0))
    val f1 = Tables.customer(spark, sfSmoke)
      .select(Sampling.foldOf($"c_custkey").as("fold")).collect().map(_.getInt(0))
    assert(f0.toSeq == f1.toSeq)
  }

  test("c05 domain caps: kept = min(40, total) per source, char volume matches the hash-priority recompute") {
    val rows = Sampling.c05(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sfSmoke)
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { case (src, nDocs, nKept, nDropped, keptChars) =>
      val ds = bySource(src)
      assert(nDocs == ds.length)
      assert(nKept == math.min(40, ds.length))
      assert(nDropped == nDocs - nKept)
      val expectChars = ds.sortBy { case (_, id, _) => (md5hex(id.toString), id) }
        .take(40).map(_._3).sum
      assert(keptChars == expectChars, s"kept set diverges for $src")
    }
  }

  test("stratified sample honors per-stratum fractions") {
    val docs = Tables.documents(spark, sfSmoke)
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "fr" -> 0.0, "es" -> 0.0, "zh" -> 0.0)
    val sampled = Sampling.stratifiedSample(docs, "lang", fractions, seed = 42)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr") && !byLang.contains("zh"))
    val en = Tables.documents(spark, sfSmoke).filter($"lang" === "en").count()
    val enRate = byLang.getOrElse("en", 0L).toDouble / en
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate")
  }

  test("ml04 leakage audit: group-keyed split cannot leak, id-keyed split does") {
    val rows = Sampling.ml04(spark, sfSmoke).collect()
    val byMethod = rows.groupBy(_.getAs[String]("method"))
    assert(byMethod.keySet == Set("by_doc_id", "by_source"))
    // the group-keyed split has zero straddling sources BY CONSTRUCTION;
    // the id-keyed split must demonstrate the leak it exists to prevent
    assert(byMethod("by_source").forall(_.getAs[Long]("n_leaky_sources") == 0L))
    assert(byMethod("by_doc_id").forall(_.getAs[Long]("n_leaky_sources") > 0L))
    // both methods partition all docs; by_source moves whole groups
    val total = graft.Tables.documents(spark, sfSmoke).count()
    byMethod.values.foreach(m => assert(m.map(_.getAs[Long]("n_docs")).sum == total))
    val srcSplits = byMethod("by_source").map(_.getAs[Long]("n_sources")).sum
    val nSources = 20L // sources are disjoint across splits iff they sum to the distinct count
    assert(srcSplits == nSources, s"source splits overlap: $srcSplits != $nSources")
  }

  test("Ranks.globalRank == single-partition row_number on a skewed, tie-heavy key") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // heavy ties in the first order column (the c08 shape: many docs share
    // a length) and a skewed distribution so range partitions are uneven;
    // id makes the order total
    val df = spark.range(0, 997).toDF("id")
      .withColumn("k", (col("id") * col("id")) % 13)
    val got = Ranks.globalRank(df, 7, col("k"), col("id"))
      .select(col("id"), col("rnk"))
    val want = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select(col("id"), col("rnk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // ranks are exactly 1..n
    assert(got.agg(min("rnk"), max("rnk"), countDistinct("rnk"))
      .collect()(0).toSeq == Seq(1L, 997L, 997L))
  }

  test("c08 shards: round-robin-by-rank invariant, strata split evenly, volumes partition the corpus") {
    val rows = Sampling.c08(spark, sfSmoke).collect()
    assert(rows.length == Sampling.NumShards)
    val total = graft.Tables.documents(spark, sfSmoke).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // shard sizes differ by at most one (the round-robin deal)
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { r =>
      // within a shard consecutive ranks differ by exactly NumShards
      assert(r.getAs[Long]("max_rank") - r.getAs[Long]("min_rank")
        == (r.getAs[Long]("n_docs") - 1) * Sampling.NumShards)
      // shard s holds exactly the ranks ≡ s+1 (mod NumShards)
      assert((r.getAs[Long]("min_rank") - 1) % Sampling.NumShards
        == r.getAs[Long]("shard"))
      assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
    }
    // every shard spans (nearly) the whole difficulty range: each stratum
    // is dealt across shards, so per-shard min/max chars must bracket the
    // global min/max up to the NumShards-1 docs at each extreme
    val gl = graft.Tables.documents(spark, sfSmoke)
      .agg(org.apache.spark.sql.functions.min("n_chars"),
        org.apache.spark.sql.functions.max("n_chars")).collect()(0)
    // ranks 1..NumShards land one per shard, as do ranks n−NumShards+1..n,
    // so EVERY shard's difficulty span brackets [max(bottom-8), min(top-8)]
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    val docs = graft.Tables.documents(spark, sfSmoke)
    val loDocs = docs.orderBy(org.apache.spark.sql.functions.asc("n_chars"),
        org.apache.spark.sql.functions.asc("doc_id"))
      .limit(Sampling.NumShards).agg(fmax("n_chars")).collect()(0).getLong(0)
    val hiDocs = docs.orderBy(org.apache.spark.sql.functions.desc("n_chars"),
        org.apache.spark.sql.functions.desc("doc_id"))
      .limit(Sampling.NumShards).agg(fmin("n_chars")).collect()(0).getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_chars") <= loDocs,
        s"shard ${r.getAs[Long]("shard")} missed the easy stratum")
      assert(r.getAs[Long]("max_chars") >= hiDocs,
        s"shard ${r.getAs[Long]("shard")} missed the hard stratum")
    }
    assert(gl.getLong(0) <= loDocs && hiDocs <= gl.getLong(1))
  }
}
