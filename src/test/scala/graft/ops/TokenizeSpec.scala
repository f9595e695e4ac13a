package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TokenizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("t18 BPE encode matches hand-computed token counts on the t16 toy corpus") {
    // merges learned (see t16's spec): (a,b)→ab, (ab,ab)→abab, (ab,c)→abc.
    // Encoding: "abab" → [abab] (1 token, 4 base symbols), "abc" → [abc]
    // (1 token, 3 base): 5 words, 18 base symbols, 5 tokens.
    val toy = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val got = Tokenize.bpeEncode(spark, toy, rounds = 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 5L, 18L, 5L, 5000000L / 18L)))
  }

  test("t18 with no learnable merges leaves every word a single base token") {
    val single = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val r = Tokenize.bpeEncode(spark, single, rounds = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 4L, 4L, 1000000L)))
  }

  test("t18 gate query: tokens never exceed base symbols (merges only fuse)") {
    val rows = Tokenize.t18(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"doc ${r.getLong(0)}: n_tokens > n_base_symbols")
      assert(r.getLong(4) <= 1000000L)
    }
  }

  test("t19 surprisal bits and tercile buckets match the hand computation") {
    // bc: (c,c)=4, (c,d)=2, (d,c)=1; pc: c=6, d=1.
    // bits: (c,c) = floor(log2(6/4)) = 0, (c,d) = floor(log2(3)) = 1,
    //       (d,c) = 0. Scores: docA 0, docB 1000, docC 500.
    // n=3 → t1 = 0, t2 = 500 → head / tail / middle.
    val toy = Seq(
      (1L, "c c c c c"),
      (2L, "c d"),
      (3L, "c d c"),
    ).toDF("doc_id", "text")
    val got = Tokenize.lmQualityBuckets(toy).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0L, 0L, "head"),
      (2L, 1L, 1L, 1000L, "tail"),
      (3L, 2L, 1L, 500L, "middle")))
  }

  test("t19 boundary ties share a bucket (cut by score, not by row)") {
    // scores: doc1 0 (3 bigrams × bits 0), doc3 0, doc2 2000 — two docs tie
    // at the head cut, so both are head and nothing is middle.
    val toy = Seq(
      (1L, "a a a a"),
      (2L, "a b"),
      (3L, "b b b"),
    ).toDF("doc_id", "text")
    val got = Tokenize.lmQualityBuckets(toy).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    assert(got.toSeq == Seq((1L, "head"), (2L, "tail"), (3L, "head")))
  }

  test("c07 datasheet matches hand-computed per-source counts incl. cross-source dups") {
    val t = "the cat sat on the mat and the dog ran to the park while " +
      "the sun set over the hills and the birds sang loud" // 25 words, en
    val toy = Seq(
      (1L, t, "A"),                       // quality-ok, en
      (2L, "The" + t.drop(3), "B"),       // exact dup of 1 modulo case
      (3L, "der hund und 99", "A"),       // too short, de
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.datasheet(toy).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("A", 2L, 29L, 1L, 1L, 1L),
      ("B", 1L, 25L, 1L, 1L, 1L)))
  }

  test("t19 gate query: every scored doc gets a bucket and terciles are ordered") {
    val rows = Tokenize.t19(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getString(4)).map { case (b, rs) =>
      b -> (rs.map(_.getLong(3)).min, rs.map(_.getLong(3)).max)
    }
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    for {
      (_, hMax) <- byBucket.get("head")
      (mMin, mMax) <- byBucket.get("middle")
    } assert(hMax < mMin && mMin <= mMax)
    for {
      (_, mMax) <- byBucket.get("middle")
      (tMin, _) <- byBucket.get("tail")
    } assert(mMax < tMin)
  }

  test("c09 kappa: counts partition the corpus, ppm fields recompute from the confusion") {
    val r = Tokenize.c09(spark, sfSmoke).collect()(0)
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n == n11 + n10 + n01 + n00)
    assert(n == graft.Tables.documents(spark, sfSmoke).count())
    assert(r.getAs[Long]("po_ppm") == (n11 + n00) * 1000000L / n)
    val pe2 = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    assert(r.getAs[Long]("pe_ppm") == pe2 * 1000000L / (n * n))
    val num = n * (n11 + n00) - pe2
    val den = n * n - pe2
    val wantKappa: Option[Long] =
      if (den == 0) None
      else if (num >= 0) Some(num * 1000000L / den)
      else Some(-((-num) * 1000000L / den))
    assert(Option(r.getAs[java.lang.Long]("kappa_ppm")).map(_.toLong) == wantKappa)
  }

  test("c09 degenerate corpus: unanimous raters give pe = 1, kappa NULL") {
    import spark.implicits._
    // every doc identical, 24 words, no digits: H passes all; all docs
    // share one millibits value, so t2 >= it and M passes all — pe = 1
    val text = (1 to 24).map(i => "w" + ("abc" (i % 3))).mkString(" ")
    val docs = (1L to 5L).map(i => (i, text)).toDF("doc_id", "text")
    val r = Tokenize.filterAgreement(docs).collect()(0)
    assert(r.getAs[Long]("n11") == 5 && r.getAs[Long]("n00") == 0)
    assert(r.getAs[Long]("po_ppm") == 1000000L)
    assert(r.getAs[Long]("pe_ppm") == 1000000L)
    assert(Option(r.getAs[java.lang.Long]("kappa_ppm")).isEmpty)
  }
}
