package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dedup + text ops on a corpus with PLANTED duplicates (the driver testdata
  * has none, so the pair-finding paths are proven here).
  */
class TextDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // 0 and 1: exact dups modulo case/whitespace. 2: near-dup of 0 (one word
  // changed). 3, 4: unrelated. 5: near-dup of 3 (two words changed).
  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from " +
      "the warm windowsill and the birds sing in the tall green trees outside"
  private val other =
    "a completely different document about spark query engines and columnar " +
      "storage formats with vectorized execution and whole stage code generation"
  lazy val corpus = Seq(
    (0L, base),
    (1L, "  " + base.toUpperCase + "  "),
    (2L, base.replace("lazy", "sleepy")),
    (3L, other),
    (4L, "unrelated third text on completely orthogonal topics like cooking pasta and gardening tomatoes in the summer sun with fresh basil"),
    // one changed word: J ≈ 0.8 → 16×4 banding detects with prob ≈ 1
    // (two changed words would put J near the s-curve threshold where
    // detection depends on the hash family — a luck-dependent test)
    (5L, other.replace("different", "distinct")),
  ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    .withColumn("source", lit("test"))
    .withColumn("n_chars", length($"text"))

  test("exact dedup collapses case/whitespace variants") {
    val groups = Dedup.d01Groups(corpus).collect()
    val dupGroup = groups.find(_.getAs[Long]("n_copies") == 2L)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keep_id") == 0L)
    assert(groups.length == 5) // 6 docs, one pair collapsed
  }

  test("minhash LSH finds the planted near-dup pairs with high est jaccard") {
    val sigs = Dedup.minhashSignatures(corpus)
    val pairs = Dedup.minhashCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact dup pair: signature identical
    assert(pairs((0L, 1L)) == 1.0)
    // near-dups: high estimated jaccard
    assert(pairs((0L, 2L)) > 0.5)
    assert(pairs((3L, 5L)) > 0.4)
    // unrelated docs never become candidates
    assert(!pairs.contains((0L, 3L)) || pairs((0L, 3L)) < 0.2)
    assert(!pairs.contains((0L, 4L)) || pairs((0L, 4L)) < 0.2)
  }

  test("simhash: identical docs hash equal, near-dups within small hamming") {
    val sigs = Dedup.simhashSignatures(corpus).cache()
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == byId(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(byId(0L), byId(2L)) <= 12)
    assert(hamming(byId(0L), byId(3L)) > 12)
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("exact ngram jaccard verifies candidates correctly") {
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val j = Dedup.ngramJaccard(corpus, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) == 1.0) // canonical texts identical
    assert(j((0L, 2L)) > 0.5 && j((0L, 2L)) < 1.0)
    assert(j((0L, 3L)) == 0.0)
  }

  test("lang-id marker counting picks the dominant-marker language") {
    val docs = Seq(
      (100L, "the cat and the dog saw a bird near a tree"),
      (101L, "der hund und der mann und der baum und der weg"),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("x")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
    val out = TextAnalysis.langPred(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out(100L) == "en")
    assert(out(101L) == "de")
  }

  test("t10 winnowing pairs prune to verified near-dups that match the minhash pipeline") {
    val n = graft.Tables.documents(spark, sfSmoke).count()
    val pairs = TextAnalysis.t10(spark, sfSmoke).collect()
    assert(pairs.nonEmpty)
    assert(pairs.length < n * (n - 1) / 2 / 100,
      s"${pairs.length} candidates from ${n * (n - 1) / 2} pairs — index must prune")
    pairs.foreach { r =>
      assert(r.getAs[Double]("winnow_jaccard") >= TextAnalysis.WinnowJaccardFloor)
      assert(r.getAs[Double]("jaccard") > 0.5,
        s"candidate (${r.getLong(0)},${r.getLong(1)}) failed exact verify")
    }
    // two independent sketches (winnowing fps, minhash bands) surface the
    // SAME verified near-dup set on this corpus
    val winnow = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = Dedup.d04(spark, sfSmoke).collect()
      .filter(_.getAs[Double]("jaccard") > 0.5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winnow == minhash,
      s"winnow-only=${winnow -- minhash} minhash-only=${minhash -- winnow}")
  }

  test("c02 consolidation log partitions each cluster into one kept rep + dropped rest") {
    val log = Dedup.c02(spark, sfSmoke).collect()
    assert(log.nonEmpty)
    val clusters = Dedup.d06(spark, sfSmoke).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    log.foreach { r =>
      val kept = r.getAs[Long]("kept_doc_id")
      // dropped_ids ships as a canonical CSV string (driver comparator
      // can't sort array cells); numeric-sorted before serialization
      val dropped = r.getAs[String]("dropped_ids").split(",").map(_.toLong).toSeq
      assert(dropped.forall(_ > kept)) // min-label rep is the cluster min
      assert(dropped.sorted == dropped)
      assert(r.getAs[Long]("cluster_size") == dropped.size + 1)
      assert(r.getAs[Long]("saved_chars") > 0)
      // kept + dropped is exactly the d06 cluster membership
      assert(clusters(kept) == (dropped.toSet + kept))
    }
    assert(log.length == clusters.size)
  }

  test("c10 leakage-safe splits cover every doc once and split whole clusters") {
    val splits = Dedup.c10(spark, sfSmoke).collect()
    assert(splits.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    val docsN = graft.Tables.documents(spark, sfSmoke).count()
    assert(splits.map(_.getAs[Long]("n_docs")).sum == docsN)
    // cluster bookkeeping: clustered docs collapse to their component,
    // everything else is its own singleton cluster
    val d06Rows = Dedup.d06(spark, sfSmoke).collect()
    val expectedClusters =
      docsN - d06Rows.length + d06Rows.map(_.getAs[Long]("cluster_id")).distinct.length
    assert(splits.map(_.getAs[Long]("n_clusters")).sum == expectedClusters)
    // split is a pure function of the cluster representative, so members of
    // one cluster can never straddle a boundary — what CAN differ is the
    // naive per-doc assignment, and the audit column counts exactly those
    splits.foreach(r => assert(r.getAs[Long]("n_leak_prevented") >= 0))
    // ~80/10/10 by hash: train strictly largest on any non-tiny corpus
    val byName = splits.map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(byName("train") > byName.getOrElse("val", 0L))
    assert(byName("train") > byName.getOrElse("test", 0L))
  }

  test("d09 chunk dedup drops the planted repeated chunk and keeps unique text intact") {
    // plant one shared 4-word chunk ("alpha beta gamma delta") at a chunk
    // boundary in two otherwise-distinct docs; pad doc B so the repeated
    // chunk lands exactly on a window boundary in both
    val boiler = "alpha beta gamma delta"
    val docs = Seq(
      (10L, s"$boiler one two three four five six seven eight"),
      (11L, s"$boiler nine ten eleven twelve thirteen fourteen fifteen sixteen"),
      (12L, "totally unrelated words with no shared window at all here"),
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"), r.getAs[String]("kept_text"))))
      .toMap
    assert(out(10L)._2 == 1 && out(11L)._2 == 1, s"boilerplate chunk should drop: $out")
    assert(out(10L)._3 == "one two three four five six seven eight")
    assert(out(11L)._3 == "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    assert(out(12L)._2 == 0)
    assert(out(12L)._3 == "totally unrelated words with no shared window at all here")
    // chunk accounting: ceil(words/4)
    assert(out(10L)._1 == 3 && out(12L)._1 == 3)
  }

  test("t13 decontamination flags the doc containing a benchmark n-gram verbatim") {
    val out = TextAnalysis.t13(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // benchmark docs themselves are excluded from the audit
    assert(out.forall(_.getAs[Long]("doc_id") % 100 != 7))
    // verdict is consistent with the match count on every row
    out.foreach { r =>
      assert(r.getAs[Boolean]("contaminated") == (r.getAs[Long]("n_matched") > 0))
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_grams"))
    }
  }

  test("t14 dup-substring grams: per-doc totals match a driver-side sliding window") {
    val rows = TextAnalysis.t14(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"))
      assert(dup >= 0 && dup <= n)
      if (n > 0) {
        val ratio = r.getAs[Double]("dup_ratio")
        assert(ratio >= 0.0 && ratio <= 1.0 && math.abs(ratio - dup.toDouble / n) < 1e-12)
      }
    }
    // recompute one document's distinct-gram count by hand
    val doc = graft.Tables.documents(spark, sfSmoke)
      .orderBy($"doc_id").select($"doc_id", $"text").head()
    val canon = doc.getString(1).trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
    val k = TextAnalysis.DupGramK
    val expected =
      if (canon.length < k) 0 else (0 to canon.length - k).map(i => canon.substring(i, i + k)).distinct.size
    val got = rows.find(_.getAs[Long]("doc_id") == doc.getLong(0)).get.getAs[Long]("n_grams")
    assert(got == expected, s"doc ${doc.getLong(0)}: got $got grams, expected $expected")
  }

  test("d10 containment join finds every planted excerpt with containment 1.0") {
    val rows = Dedup.d10(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("containment") >= 0.8 - 1e-12)
      assert(r.getAs[Int]("n_common") <= r.getAs[Int]("n_shingles_a"))
    }
    // every planted half-doc is contained in its source with containment 1.0
    val nPlants = graft.Tables.documents(spark, sfSmoke)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0).count()
    val planted = rows.filter { r =>
      r.getAs[Long]("a") >= Dedup.ExcerptOffset &&
        r.getAs[Long]("b") == r.getAs[Long]("a") - Dedup.ExcerptOffset
    }
    assert(planted.length == nPlants, s"${planted.length} of $nPlants excerpts found")
    planted.foreach(r => assert(r.getAs[Double]("containment") == 1.0))
  }

  test("d10 positional filter prunes prefix candidates losslessly") {
    import org.apache.spark.sql.functions.col
    // Construct a pair the PREFIX filter admits but the POSITIONAL bound
    // must prune: docs 3 and 4 share exactly one shingle ("S1 S2 S3");
    // two filler copies of doc 3's tail push its other shingles to df=3,
    // so the shared df=2 shingle sorts FIRST in doc 3's order (inside its
    // prefix, k=2) — while doc 4's own shingles are df=1 and sort ahead,
    // leaving the shared shingle LAST (j = |B|). First-match bound =
    // 1 + min(|A|-1, |B|-|B|) = 1 < ceil(0.8·6): prefix admits, position
    // prunes. Docs 1/2 are a true containment pair that must survive.
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r s t u v w"),
      (3L, "S1 S2 S3 A1 A2 A3 A4 A5"),
      (4L, "B1 B2 B3 B4 B5 S1 S2 S3"),
      (5L, "S2 S3 A1 A2 A3 A4 A5"), // fillers: df boost for 3's tail
      (6L, "S2 S3 A1 A2 A3 A4 A5"),
    ).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"), Dedup.shingleArray(col("text")).as("sh"))
    val cand = Dedup.containmentCandidates(sets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), s"true candidate lost: $cand")
    assert(!cand.contains((3L, 4L)) && !cand.contains((4L, 3L)),
      s"positional filter failed to prune: $cand")
  }

  test("c04 capstone agrees with its component stages") {
    val c04 = TextAnalysis.c04(spark, sfSmoke).collect()
    assert(c04.nonEmpty)
    // survivors are exactly c01's kept representatives
    val c01Ids = TextAnalysis.c01(spark, sfSmoke).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(c04.map(_.getAs[Long]("doc_id")).toSet == c01Ids)
    // packing arithmetic: cum_tokens strictly accumulates per source and
    // every cut point is consistent
    c04.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum)
        val start = cum - r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("seq_id") == start / TextAnalysis.PackContextLen)
        assert(r.getAs[Long]("seq_offset") == start % TextAnalysis.PackContextLen)
      }
    }
  }

  test("t15 chunks tile the token stream: strided starts, full windows except the tail, hash = recompute") {
    val rows = TextAnalysis.t15(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    val docs = graft.Tables.documents(spark, sfSmoke)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpeishPattern)
    byDoc.foreach { case (docId, chunks) =>
      val m = pat.matcher(docs(docId))
      val toks = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toVector
      val n = toks.length
      val sorted = chunks.sortBy(_._2)
      // chunk ids are 0..k-1 with strided starts
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, cid, start, nTok, hash) =>
        assert(start == cid * 48 + 1)
        val slice = toks.slice((start - 1).toInt, (start - 1 + 64).toInt)
        assert(nTok == slice.length)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.mkString(" ").getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        assert(hash == md, s"chunk hash mismatch doc=$docId chunk=$cid")
      }
      // full windows except possibly the tail; chunks jointly cover all n tokens
      sorted.init.foreach { case (_, _, _, nTok, _) => assert(nTok == 64L) }
      val last = sorted.last
      assert(last._3 - 1 + last._4 >= n, "chunks must cover the token stream")
    }
  }

  test("c06 blast radius: a contaminated doc drags its whole near-dup cluster, bystanders stay") {
    val filler = "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty " +
      "twentyone twentytwo twentythree twentyfour twentyfive twentysix"
    val blast = Seq(
      (7L, "alpha beta gamma delta epsilon"),               // eval split doc
      (1L, s"alpha beta gamma delta epsilon $filler"),      // direct hit
      // near-dup of 1 with the eval 5-gram BROKEN (one word swapped
      // inside it) — flagged only through the cluster
      (2L, s"alpha beta gamma XRAY epsilon $filler"),
      (3L, other + " " + other),                            // unrelated bystander
    ).toDF("doc_id", "text")
    val rows = Dedup.blastRadius(blast).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.toSeq == Seq((1L, true, true), (2L, false, true)),
      s"got ${rows.toSeq}")
  }

  test("t16 BPE merges match hand-computed rules on a toy corpus, incl. non-overlapping application") {
    // "abab" ×3, "abc" ×2: pair counts r1 — (a,b): 3·2+2 = 8 wins;
    // after merging, "ab ab" ×3 gives (ab,ab)=3, "ab c" gives (ab,c)=2 →
    // r2 = (ab,ab); r3 then sees "abab" ×3 exhausted → (ab,c)=2.
    val toy = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(spark, toy, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m(0) == ((1L, "a", "b", "ab", 8L)))
    assert(m(1) == ((2L, "ab", "ab", "abab", 3L)))
    assert(m(2) == ((3L, "ab", "c", "abc", 2L)))
    // non-overlapping application: "aaaa" must become two "aa" symbols,
    // so round 2's top pair is (aa, aa), not a chain through "aaa"
    val runs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeMerges(spark, runs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m2(0) == ((1L, "a", "a", "aa", 9L))) // 3 overlapping pairs × 3 words
    assert(m2(1) == ((2L, "aa", "aa", "aaaa", 3L)))
    // degenerate corpus: single-symbol words leave no pair to merge — the
    // loop must terminate with the merges learned so far, not throw
    val single = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(spark, single, rounds = 3).count() == 0)
    // and mid-run exhaustion stops early: "ab" ×2 yields exactly one merge
    val short = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m3 = TextAnalysis.bpeMerges(spark, short, rounds = 5).collect()
    assert(m3.length == 1 && m3(0).getString(3) == "ab")
  }

  test("q60 weighted sample equals the driver-side priority recompute and favors weight") {
    val got = Sampling.q60(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sfSmoke)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def priority(docId: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val u = java.lang.Long.parseLong(hex, 16) + 1L
      w * 4294967296L / u
    }
    val want = docs.map { case (id, w) => (id, w, priority(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }.take(20)
    assert(got.toSeq == want.toSeq)
  }

  test("t11 repetition stats are internally consistent and bounded") {
    val rows = TextAnalysis.t11(spark, sfSmoke).collect()
    assert(rows.length == graft.Tables.documents(spark, sfSmoke).count())
    rows.foreach { r =>
      val nWords = r.getAs[Int]("n_words")
      val distinct = r.getAs[Int]("distinct_words")
      assert(distinct >= 1 && distinct <= nWords)
      val dup = r.getAs[Double]("dup_word_ratio")
      assert(dup >= 0.0 && dup <= 1.0)
      val top = r.getAs[Long]("top_bigram_n")
      val total = r.getAs[Long]("n_bigrams")
      assert(top >= 1 && top <= total && total == nWords - 1)
      val frac = r.getAs[Double]("top_bigram_frac")
      assert(frac > 0.0 && frac <= 1.0)
      // the verdict is exactly the documented rule
      assert(r.getAs[Boolean]("repetitive") ==
        (dup > TextAnalysis.DupWordRatioMax || frac > TextAnalysis.TopBigramFracMax))
    }
  }

  test("t12 packing: per-shard cumulative cut points are consistent") {
    val rows = TextAnalysis.t12(spark, sfSmoke).collect()
    assert(rows.length == graft.Tables.documents(spark, sfSmoke).count())
    // multiple shards → the packing window is genuinely partitioned
    assert(rows.map(_.getAs[String]("source")).distinct.length > 1)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val start = cum
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum)
        assert(r.getAs[Long]("seq_id") == start / TextAnalysis.PackContextLen)
        assert(r.getAs[Long]("seq_offset") == start % TextAnalysis.PackContextLen)
      }
    }
  }

  test("winnowing guarantee: shared substrings of length >= w+k-1 share a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val a = TextAnalysis.winnowFingerprints(s"intro words here $shared and a tail")
    val b = TextAnalysis.winnowFingerprints(s"completely different opening $shared closing words")
    val c = TextAnalysis.winnowFingerprints("no overlap with either document at all whatsoever")
    assert(a.intersect(b).nonEmpty) // the winnowing guarantee
    assert(a.intersect(c).isEmpty && b.intersect(c).isEmpty)
    // deterministic + sorted-distinct contract
    assert(a.toSeq == TextAnalysis.winnowFingerprints(s"intro words here $shared and a tail").toSeq)
    assert(a.toSeq == a.toSeq.distinct.sorted)
  }

  test("connected components: chains merge, disjoint clusters stay apart") {
    // 1-2-3-4 is a diameter-3 chain (needs >1 propagation round), 7-8 is
    // a separate pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val comps = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("vocab growth curve: hand-counted checkpoints, monotone, plateaus") {
    // docs at ids straddling the 50/100/200 checkpoint boundaries:
    //   cp 50  covers docs 0,1     → types {a,b,c}, 4 occurrences
    //   cp 100 covers + doc 60     → +{d}: 4 types, 5 occurrences
    //   cp 200 covers + doc 150    → +{e} (a repeats): 5 types, 7 occurrences
    //   cp ≥ 500: plateau — the whole corpus is covered
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (60L, "d"), (150L, "a e"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1) == TextAnalysis.VocabCheckpoints)
    assert(out.take(3) == Seq((50, 3L, 4L), (100, 4L, 5L), (200, 5L, 7L)))
    assert(out.drop(3).forall(c => c._2 == 5L && c._3 == 7L), "plateau")
    // Heaps-curve invariant: both series are non-decreasing
    assert(out.sliding(2).forall { case Seq(p, n) => p._2 <= n._2 && p._3 <= n._3 })
  }

  test("t20 html extraction: exact round-trip on every doc; boilerplate fully accounted") {
    val rows = TextAnalysis.t20(spark, sfSmoke).collect()
    val nDocs = graft.Tables.documents(spark, sfSmoke).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (html, ext, boiler, ok) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))
      assert(ok, s"doc ${r.getLong(0)}: extraction did not round-trip")
      assert(boiler == html - ext)
      // the fixed page skeleton is ~190 chars + the doc-id digits; every
      // dropped byte must be boilerplate, never payload
      assert(boiler >= 180 && boiler <= 220, s"boilerplate $boiler outside skeleton range")
    }
  }
}
