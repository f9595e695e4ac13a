package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WindowTopKToHeapSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // non-nullable score/id come out of toDF on primitive tuples
  private def scored = Seq(
    ("a", 5.0, 1L), ("a", 3.0, 2L), ("a", 9.0, 3L), ("a", 9.0, 4L), ("a", 1.0, 5L),
    ("b", 2.0, 6L), ("b", 8.0, 7L),
  ).toDF("g", "score", "id")

  private def topk = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
  }

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+
      org.apache.spark.sql.graft.WindowTopKToHeap
    try body
    finally spark.experimental.extraOptimizations = before
  }

  test("rewrites row_number<=k into the bounded-heap aggregate, same rows") {
    val (plan, got) = withRule {
      val df = topk
      (df.queryExecution.executedPlan.toString,
        df.orderBy($"g", $"rn").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))))
    }
    assert(!plan.contains("Window ["), plan) // no window exec
    assert(!plan.contains("WindowGroupLimit"), plan) // pre-limit stripped too
    assert(!plan.contains("Sort ["), plan) // the whole sort path is gone
    assert(plan.contains("top_k_by"), plan)
    assert(plan.contains("partial_top_k_by"), plan) // map-side combine
    // hard-coded window semantics (ties at 9.0 resolve to the smaller id,
    // rn reconstructed from heap position) — independent of the rule being
    // active by default in the shared test session
    assert(got.toSeq == Seq(
      ("a", 9.0, 3L, 1), ("a", 9.0, 4L, 2),
      ("b", 8.0, 7L, 1), ("b", 2.0, 6L, 2)))
  }

  test("bails out when the score is nullable (heap drops nulls, window ranks them)") {
    val nullable = Seq(("a", Some(5.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L))
      .toDF("g", "score", "id")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val df = nullable.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    val plan = withRule(df.queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan) // not rewritten
    assert(withRule(df.count()) == 2)
  }

  test("bails out when an extra column is not reconstructable from the heap") {
    val extra = Seq(("a", 5.0, 1L, "x"), ("a", 3.0, 2L, "y")).toDF("g", "score", "id", "tag")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val df = extra.withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
    val plan = withRule(df.queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
  }
}
