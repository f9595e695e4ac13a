package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The skew decision rule Skew.scala's header sketches, demonstrated:
  * AQE's runtime skew-join split covers the sort-merge JOIN case
  * automatically, so manual salting is reserved for (a) skewed
  * AGGREGATION (q28 — AQE never splits a hot group) and (b)
  * broadcast-ineligible skewed joins on engines/configs without AQE.
  * This spec pins the AQE half of that rule: on the same shape of
  * skewed data q29 salts by hand, AQE splits the hot partition at
  * runtime — visible as `skew=true` on the final SortMergeJoin.
  */
class SkewSpec extends AnyFunSuite with SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the size thresholds so test-scale data counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // forbid broadcast so the join is sort-merge (the skew-split target)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      // one key owns 75% of the big side — the q29 shape
      val big = spark.range(0, 200000)
        .select(when($"id" < 150000, lit(0L)).otherwise($"id").as("k"),
          $"id".as("v"))
      val small = spark.range(0, 2000)
        .select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = big.join(small, Seq("k"))
      // materialize THIS plan (count() would build its own QueryExecution,
      // leaving joined's adaptive plan unexecuted / isFinalPlan=false)
      val n = joined.toLocalIterator().asScala.length
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    }
  }

  test("salted aggregation result is identical to the plain groupBy (AQE can't split hot groups)") {
    import spark.implicits._
    val df = spark.range(0, 50000)
      .select(when($"id" < 40000, lit("hot")).otherwise(lit("cold")).as("k"),
        lit(1.0).as("v"), $"id")
    val salted = Skew.saltedAgg(df, $"k", $"v", saltSource = Seq($"id"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy($"k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
  }
}
