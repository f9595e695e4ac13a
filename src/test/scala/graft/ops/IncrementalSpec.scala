package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IncrementalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq

  test("partial-merge rollup is split-invariant and matches the one-shot aggregate") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val oneShot = rows(Incremental.mergeWeekly(Incremental.weeklyPartial(ev)))
    assert(oneShot.nonEmpty)
    // two different split points → identical merged view, bit-for-bit
    for (split <- Seq("2024-01-08", "2024-01-23")) {
      val s = org.apache.spark.sql.functions.lit(split).cast("timestamp")
      val merged = rows(Incremental.mergeWeekly(
        Incremental.weeklyPartial(ev.filter($"ts" < s)),
        Incremental.weeklyPartial(ev.filter($"ts" >= s))))
      assert(merged == oneShot, s"split at $split diverged")
    }
    // three-way split (two "daily loads" after the base) also converges
    val (a, b) = (org.apache.spark.sql.functions.lit("2024-01-10").cast("timestamp"),
      org.apache.spark.sql.functions.lit("2024-01-20").cast("timestamp"))
    val threeWay = rows(Incremental.mergeWeekly(
      Incremental.weeklyPartial(ev.filter($"ts" < a)),
      Incremental.weeklyPartial(ev.filter($"ts" >= a && $"ts" < b)),
      Incremental.weeklyPartial(ev.filter($"ts" >= b))))
    assert(threeWay == oneShot)
  }

  test("i01 incremental index equals the from-scratch rebuild restricted to new-endpoint pairs") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfSmoke)
    val incremental = Incremental.i01(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val scratch = Dedup.minhashCandidates(Dedup.minhashSignatures(docs))
      .filter(col("a") >= 400 || col("b") >= 400)
      .orderBy(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(incremental.toSeq == scratch.toSeq,
      "base-signature reuse changed the candidate set")
    // signature purity — the property that makes reuse sound: a doc's
    // signature is identical whether signed alone or with the full corpus
    val alone = Dedup.minhashSignatures(docs.filter(col("doc_id") < 10))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val full = Dedup.minhashSignatures(docs)
      .filter(col("doc_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(alone == full)
  }

  test("merging an empty delta is a no-op") {
    val ev = graft.Tables.events(spark, sfSmoke)
    val base = Incremental.weeklyPartial(ev)
    val emptyDelta = Incremental.weeklyPartial(ev.limit(0))
    assert(rows(Incremental.mergeWeekly(base, emptyDelta)) ==
      rows(Incremental.mergeWeekly(base)))
  }

  test("dq03 diff classes match their membership predicates exactly; unchanged rows never surface") {
    import spark.implicits._
    val out = Incremental.dq03(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val byClass = out.groupBy(_.getAs[String]("change_type"))
    assert(byClass.keySet == Set("added", "removed", "changed"))
    // recompute each class's key set from the defining predicates
    val keys = graft.Tables.orders(spark, sfSmoke)
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val added = keys.filter(k => k % 11 == 0 && k % 10 != 0)
    val removed = keys.filter(k => k % 10 == 0 && k % 11 != 0)
    val changed = keys.filter(k => k % 7 == 0 && k % 10 != 0 && k % 11 != 0)
    def classKeys(c: String) = byClass(c).map(_.getAs[Long]("o_orderkey")).toSet
    assert(classKeys("added") == added)
    assert(classKeys("removed") == removed)
    assert(classKeys("changed") == changed)
    // delta-cardinality contract: output is exactly the three classes
    assert(out.length == added.size + removed.size + changed.size)
    // sides carry the right nulls: adds have no old, removals no new
    byClass("added").foreach(r => assert(r.isNullAt(r.fieldIndex("old_price"))))
    byClass("removed").foreach(r => assert(r.isNullAt(r.fieldIndex("new_price"))))
    byClass("changed").foreach { r =>
      assert(r.getAs[Double]("new_price") == r.getAs[Double]("old_price") * 1.1)
    }
  }

  test("sign-LSH signature purity: a vector's band keys ignore the rest of the index") {
    // reuse of stored base signatures is sound only if signing a batch in
    // isolation yields exactly what a full-corpus signing pass yields for
    // the same ids — the i02 analogue of i01's minhash purity pin
    import org.apache.spark.sql.functions._
    val all = Similarity.plantNearDups(graft.Tables.embeddings(spark, sfSmoke))
    val subset = all.filter(col("vec_id") % 3 === 0)
    def keysOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.signBandKeys(df, planes = 128, bands = 16).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val fromFull = keysOf(all).view.filterKeys(_ % 3 == 0).toMap
    assert(keysOf(subset) == fromFull)
  }

  test("i02 incremental probe finds exactly what the full d07 rebuild finds") {
    import org.apache.spark.sql.functions._
    val inc = Incremental.i02(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Similarity.d07(spark, sfSmoke)
      .filter(col("b") >= Similarity.PlantOffset).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == full)
    assert(inc.nonEmpty, "planted delta must produce near-dup pairs")
  }

  test("i03 pruned index == rebuild on survivors: no ghosts, no collateral") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfSmoke)
    val pruned = Incremental.i03(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // no ghosts: no surviving pair touches a tombstoned id
    assert(pruned.forall { case (a, b) => a % 13 != 0 && b % 13 != 0 })
    // no collateral: from-scratch rebuild on the surviving corpus agrees
    val rebuilt = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs.filter(col("doc_id") % 13 =!= 0)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == rebuilt)
    // the tombstones actually removed something: the full-corpus index
    // must contain at least one pair with a deleted endpoint
    val full = Dedup.minhashCandidates(Dedup.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.exists { case (a, b) => a % 13 == 0 || b % 13 == 0 },
      "fixture too weak: no pair touches a tombstone")
    assert(full.filter { case (a, b) => a % 13 != 0 && b % 13 != 0 } == pruned)
  }

  test("i04 postings maintenance equals a from-scratch rebuild over the live set") {
    import org.apache.spark.sql.functions._
    val maintained = Incremental.i04(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained.nonEmpty && maintained.length <= 20)
    // scratch rebuild: tokenize the live docs directly (delta supersedes a
    // same-id tombstone — live = delta batch ∪ untombstoned base)
    val live = graft.Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") % 10 === 9 || col("doc_id") % 13 =!= 0)
    val scratch = live
      .select(col("doc_id"), explode(filter(
        split(TextAnalysis.normalize(col("text")), " "), x => x =!= "")).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("term")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained == scratch)
    // the maintenance actually did something at both ends: some base doc
    // was tombstoned and some delta doc exists
    assert(graft.Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 13 === 0).count() > 0)
    assert(graft.Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") % 10 === 9).count() > 0)
  }

  test("i05 LM-state merge survives bigram collisions across base and delta") {
    import org.apache.spark.sql.functions._
    // the merge path only differs from a concat when the SAME bigram has
    // counts in BOTH halves — prove the gate corpus actually exercises
    // that collision path, then prove merge == rebuild on it
    val docs = graft.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"), col("text"))
    def trainBigrams(d: org.apache.spark.sql.DataFrame) =
      LangModel.bigrams(d).filter(col("trained_on"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val base = trainBigrams(docs.filter(col("doc_id") % 7 =!= 0))
    val delta = trainBigrams(docs.filter(col("doc_id") % 7 === 0))
    val collisions = base.join(delta, Seq("w1", "w2"), "left_semi").count()
    assert(collisions > 0, "split produced no shared bigrams — test corpus too small")
    val maintained = Incremental.i05(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val scratch = trainBigrams(docs)
      .groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"), count(lit(1)).as("n1l"))
      .orderBy(col("w1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(maintained == scratch)
  }
}
