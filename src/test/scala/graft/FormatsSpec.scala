package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse format round-trips beyond parquet: ORC (the other columnar
  * option, with pushdown), JSON lines, CSV-with-schema (SURVEY.md §2.1
  * source family). Same DataFrame in → same rows out, per format.
  */
class FormatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val base = Tables.nation(spark, sfSmoke)
  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString

  test("ORC round-trip with predicate pushdown") {
    base.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val back = spark.read.orc(s"$tmp/nation_orc")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      base.orderBy("n_nationkey").collect().toSeq)
    val plan = back.filter($"n_regionkey" === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(n_regionkey,2)"), plan)
  }

  test("JSON-lines round-trip with explicit read schema") {
    base.write.mode("overwrite").json(s"$tmp/nation_json")
    val back = spark.read.schema(base.schema).json(s"$tmp/nation_json")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      base.orderBy("n_nationkey").collect().toSeq)
  }

  test("CSV round-trip with explicit schema (no inferSchema scan)") {
    base.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").schema(base.schema)
      .csv(s"$tmp/nation_csv")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      base.orderBy("n_nationkey").collect().toSeq)
  }
}
