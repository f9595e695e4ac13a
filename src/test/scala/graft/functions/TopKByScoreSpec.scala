package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKByScoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    VectorFunctions.register(spark)
    df.groupBy($"g")
      .agg(VectorFunctions.top_k_by($"score", $"id", k).as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t.score".as("score"), $"t.id".as("id"))
      .orderBy($"g", $"score".desc, $"id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
  }

  test("selects top-k per group, ordered score desc") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 4.0, 4L),
      ("b", 9.0, 5L),
    ).toDF("g", "score", "id").repartition(4) // force partial/merge paths
    assert(topk(df, 2).toSeq == Seq(("a", 5.0, 2L), ("a", 4.0, 4L), ("b", 9.0, 5L)))
  }

  test("usable from SQL text (same resolution path GraftExtensions injects)") {
    VectorFunctions.register(spark)
    Seq(("a", 1.0, 10L), ("a", 3.0, 30L), ("a", 2.0, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("tkb_sql")
    val ids = spark.sql(
      "SELECT g, top_k_by(score, id, 2) AS top FROM tkb_sql GROUP BY g")
      .select(explode($"top").as("t")).select($"t.id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(30L, 20L))
  }

  test("ties resolve to the smaller id (window parity)") {
    val df = Seq(
      ("a", 7.0, 30L), ("a", 7.0, 10L), ("a", 7.0, 20L), ("a", 1.0, 1L),
    ).toDF("g", "score", "id").repartition(3)
    assert(topk(df, 2).toSeq == Seq(("a", 7.0, 10L), ("a", 7.0, 20L)))
  }

  test("k larger than the group returns the whole group; nulls skipped") {
    val df = Seq(
      ("a", Some(2.0), 1L), ("a", None, 2L), ("a", Some(1.0), 3L),
    ).toDF("g", "score", "id")
    assert(topk(df.select($"g", $"score".as("score"), $"id"), 10).toSeq ==
      Seq(("a", 2.0, 1L), ("a", 1.0, 3L)))
  }

  test("works from SQL with a literal k") {
    VectorFunctions.register(spark)
    Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "score", "id")
      .createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, top_k_by(score, id, 1) AS top FROM topk_in GROUP BY g")
      .select(explode($"top")).collect()
    assert(out.length == 1 && out(0).getStruct(0).getDouble(0) == 2.0)
  }
}
