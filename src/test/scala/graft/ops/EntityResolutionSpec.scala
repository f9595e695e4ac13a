package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EntityResolutionSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("blocked fuzzy pairs == brute force restricted to the block invariant") {
    val blocked = EntityResolution.e01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(blocked.nonEmpty)
    assert(blocked.forall { case (_, _, d) => d >= 1 && d <= EntityResolution.MaxEditDistance })
    // brute force over the (small) distinct-entity table
    val e = graft.Tables.part(spark, sfSmoke).select($"p_name").distinct()
    val a = e.select($"p_name".as("a_name"))
    val b = e.select($"p_name".as("b_name"))
    val brute = a.crossJoin(b).filter($"a_name" < $"b_name")
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist".between(1, EntityResolution.MaxEditDistance))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // blocking trades recall for tractability EXPLICITLY: it finds exactly
    // the brute-force pairs that agree on the head noun (the block key);
    // pairs whose edit touches the noun are the documented miss class
    val sameBlock = brute.filter { case (x, y, _) =>
      x.split(" ").last == y.split(" ").last
    }
    assert(blocked == sameBlock)
    assert(blocked.subsetOf(brute))
  }

  test("blocking key is the last word for ANY word count, engine == oracle expression") {
    // Round-3 latent bug: Spark blocked on the LAST word while the oracle
    // blocked on the SECOND word — they agreed only because every generated
    // part name happened to be exactly two words. Both sides now share one
    // expression family (`[^ ]+$`, full match); this fixture pins the
    // semantics on 1/2/3/4-word names so a testdata change can't silently
    // diverge the engines again.
    val names = Seq(
      "azure",                              // 1 word
      "burnished azure",                    // 2 words
      "burnished pale azure",               // 3 words
      "deep burnished pale azure",          // 4 words
      "goldenrod lavender spring chiffon midnight") // 5 words (TPC-H shape)
    val got = names.toDF("p_name")
      .select(EntityResolution.blockKey($"p_name").as("blk"))
      .as[String].collect().toSeq
    // oracle-side semantics, mirrored independently: regexp_extract full
    // match of [^ ]+$ == the last space-separated word
    val oracleSide = names.map(n => "[^ ]+$".r.findFirstIn(n).get)
    assert(got == oracleSide)
    assert(got == names.map(_.split(" ").last))
  }

  test("e02 clusters are the transitive closure of e01 pairs, support adds up") {
    val pairs = EntityResolution.e01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val clusters = EntityResolution.e02(spark, sfSmoke).collect()
    assert(clusters.nonEmpty)
    // variants ships as a canonical CSV string (driver comparator can't
    // sort array cells); names never contain commas
    def variants(r: org.apache.spark.sql.Row): Seq[String] =
      r.getAs[String]("variants").split(",").toSeq
    val memberOf = clusters.flatMap { r =>
      variants(r).map(_ -> r.getAs[String]("canonical_name"))
    }.toMap
    // every matched pair lands in the same cluster (transitivity held)
    pairs.foreach { case (a, b) => assert(memberOf(a) == memberOf(b), s"($a, $b) split") }
    // canonical = min variant; clusters partition the matched names
    clusters.foreach { r =>
      val vs = variants(r)
      assert(vs.min == r.getAs[String]("canonical_name"))
      assert(vs.length == r.getAs[Long]("n_variants"))
      assert(vs == vs.sorted, "variants CSV must be in sorted order")
    }
    assert(memberOf.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // support equals the fact-side row count of the matched names
    val support = graft.Tables.part(spark, sfSmoke)
      .filter($"p_name".isin(memberOf.keySet.toSeq: _*)).count()
    assert(clusters.map(_.getAs[Long]("total_support")).sum == support)
  }

  test("e04 distributed global rank + window == plain sorted-sequence SNM") {
    // synthetic vocabulary with known sort order: matches at rank gaps
    // 1 (ab/ac), 3 (ab/ax across two names), and one far pair (ab vs zb)
    // that NO window w=10 may catch — pins both the offsets-based global
    // rank (8 range partitions over 12 names forces several empty/short
    // partitions) and the window cut
    val names = Seq(
      "ab", "ac", "ad", "ax", "be", "bf", "ca", "cb", "dd", "de", "zb", "zc")
    val got = EntityResolution.snmPairs(names.toDF("p_name"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    // plain-Scala oracle: sort, slide w, levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(
          d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val sorted = names.sorted
    val want = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + EntityResolution.SnmWindow, sorted.length)
      dist = lev(sorted(i), sorted(j))
      if dist >= 1 && dist <= EntityResolution.MaxEditDistance
    } yield (sorted(i), sorted(j), (j - i).toLong, dist)).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the far pair is cut by the window even though lev("ab","zb") == 1
    assert(!got.exists { case (a, b, _, _) => a == "ab" && b == "zb" })
  }

  test("e04 on the part table: every pair is a true match within the window") {
    val rows = EntityResolution.e04(spark, sfSmoke).collect()
    rows.foreach { r =>
      assert(r.getInt(3) >= 1 && r.getInt(3) <= EntityResolution.MaxEditDistance)
      assert(r.getLong(2) >= 1 && r.getLong(2) < EntityResolution.SnmWindow)
    }
    // complement evidence: SNM (whole-name sort) and e01 (head-noun block)
    // are different indexes — on a last-word-block vocabulary the nearest
    // SNM matches differ in a NON-final word, which e01's key keeps
    val gotPairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val e01Pairs = EntityResolution.e01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // no containment either way is required, but flags must be consistent
    rows.foreach { r =>
      val sameHead = r.getString(0).split(" ").last == r.getString(1).split(" ").last
      assert(r.getBoolean(4) == !sameHead, s"missed_by_blocking flag wrong for $r")
    }
    // and any SNM pair the head-noun index also covers must appear in e01
    gotPairs.filter { case (a, b) => a.split(" ").last == b.split(" ").last }
      .foreach(p => assert(e01Pairs.contains(p), s"$p in SNM+same-block but not e01"))
  }
}
