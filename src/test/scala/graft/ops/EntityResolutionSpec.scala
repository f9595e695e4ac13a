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

  test("e02 clusters are the transitive closure of e01 pairs, support adds up") {
    val pairs = EntityResolution.e01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val clusters = EntityResolution.e02(spark, sfSmoke).collect()
    assert(clusters.nonEmpty)
    val memberOf = clusters.flatMap { r =>
      r.getAs[scala.collection.Seq[String]]("variants").map(_ -> r.getAs[String]("canonical_name"))
    }.toMap
    // every matched pair lands in the same cluster (transitivity held)
    pairs.foreach { case (a, b) => assert(memberOf(a) == memberOf(b), s"($a, $b) split") }
    // canonical = min variant; clusters partition the matched names
    clusters.foreach { r =>
      val vs = r.getAs[scala.collection.Seq[String]]("variants")
      assert(vs.min == r.getAs[String]("canonical_name"))
      assert(vs.length == r.getAs[Long]("n_variants"))
    }
    assert(memberOf.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // support equals the fact-side row count of the matched names
    val support = graft.Tables.part(spark, sfSmoke)
      .filter($"p_name".isin(memberOf.keySet.toSeq: _*)).count()
    assert(clusters.map(_.getAs[Long]("total_support")).sum == support)
  }
}
