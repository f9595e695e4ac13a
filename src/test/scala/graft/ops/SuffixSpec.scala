package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The prefix-doubling suffix labels: equality classes pinned against
  * direct substring grouping (the first-principles formulation the DuckDB
  * oracle also uses), the short-suffix sentinel contract, and the
  * interval-union span semantics of sa01.
  */
class SuffixSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private def labelsOf(texts: Seq[(Long, String)], target: Int) = {
    import spark.implicits._
    Suffix.suffixLabels(texts.toDF("doc_id", "t"), target)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
  }

  test("label equality == prefix equality, across and within documents") {
    val texts = Seq(
      1L -> "abcabcab",
      2L -> "xabcabcq",
      3L -> "abcabcab") // exact duplicate of doc 1
    for (target <- Seq(1, 2, 4, 8)) {
      val lab = labelsOf(texts, target)
      // brute-force truth: padded-prefix equality of min(target, len) chars
      def pref(doc: Long, pos: Int): String = {
        val t = texts.find(_._1 == doc).get._2
        t.substring(pos - 1, math.min(t.length, pos - 1 + target))
      }
      val keys = lab.keys.toSeq
      for (a <- keys; b <- keys) {
        val want = pref(a._1, a._2.toInt) == pref(b._1, b._2.toInt)
        val got = lab(a) == lab(b)
        assert(got == want,
          s"target=$target $a(${pref(a._1, a._2.toInt)}) vs " +
            s"$b(${pref(b._1, b._2.toInt)}): labels ${lab(a)}/${lab(b)}")
      }
    }
  }

  test("doubling rounds past the seed: label(64) == 64-prefix equality") {
    // the seed covers lengths <= 32, so target 64 forces exactly one
    // doubling round (32 -> 64) — this pins the lead/min recurrence itself,
    // which sa01's production target of 32 no longer executes
    val block = "abcdefgh" * 6 // 48 chars, repeated in both docs
    val texts = Seq(
      1L -> (block + "11" + block),     // 98 chars: the two block copies'
      2L -> (block + "22" + block))     // suffixes agree for 48 < 64 chars
    val target = 64
    val lab = labelsOf(texts, target)
    def pref(doc: Long, pos: Int): String = {
      val t = texts.find(_._1 == doc).get._2
      t.substring(pos - 1, math.min(t.length, pos - 1 + target))
    }
    val keys = lab.keys.toSeq
    for (a <- keys; b <- keys) {
      val want = pref(a._1, a._2.toInt) == pref(b._1, b._2.toInt)
      val got = lab(a) == lab(b)
      assert(got == want,
        s"$a(${pref(a._1, a._2.toInt)}) vs " +
          s"$b(${pref(b._1, b._2.toInt)}): labels ${lab(a)}/${lab(b)}")
    }
  }

  test("short suffixes classify by their truncated string, never by accident") {
    // doc 1 ends in "ab"; doc 2 ends in "ab" too; doc 3 contains "ab" with
    // a full window behind it — at target 4 the two 2-char tails must share
    // a class with each other but NOT with the long "ab.." suffix
    val lab = labelsOf(Seq(1L -> "xxab", 2L -> "yyab", 3L -> "zabcd"), 4)
    assert(lab((1L, 3L)) == lab((2L, 3L)))   // both suffixes are "ab"
    assert(lab((1L, 3L)) != lab((3L, 2L)))   // "ab" != "abcd"
  }

  test("sa01 spans: interval union with the 31-gap rule, per document") {
    import spark.implicits._
    // two docs sharing two separated 32-char blocks with unique filler
    // between: positions {1, 69} duplicated in two islands per doc. The
    // fillers are non-periodic (all-distinct chars) and mutually reversed,
    // so no 32-window inside or across them duplicates anywhere.
    val block1 = "a" * 32
    val block2 = "b" * 32
    val filler = "cdefghijklmnopqrstuvwxyz0123456789!@" // 36 > 31-gap rule
    val t1 = block1 + filler + block2
    val t2 = block1 + filler.reverse + block2
    val docs = Seq(1L -> t1, 2L -> t2).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sa_fixture")
    // run the sa01 pipeline on the fixture via the same building blocks
    val labs = Suffix.suffixLabels(
      docs.select($"doc_id", TextAnalysis.normalize($"text").as("t")), Suffix.MinLen)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id").orderBy($"pos")
    val dup = labs.filter($"pos" <= $"n" - (Suffix.MinLen - 1))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lab")))
      .filter($"cnt" >= 2)
    val dupPos = dup.select($"doc_id", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the duplicated windows are exactly the two aligned blocks: pos 1 and
    // pos 69 (1 + 32 + 36) in each doc
    assert(dupPos == Set((1L, 1L), (1L, 69L), (2L, 1L), (2L, 69L)), dupPos)
  }

  test("one label row per character position; singletons are their own class") {
    import spark.implicits._
    val lab = Suffix.suffixLabels(Seq(1L -> "hello").toDF("doc_id", "t"), 4)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(lab.size == 5)
    // "hello" has no repeated 4-prefix; all classes distinct
    assert(lab.values.toSet.size == 5)
  }
}
