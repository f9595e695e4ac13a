package graft

import org.scalatest.funsuite.AnyFunSuite

/** JDBC sink/source round-trip (SURVEY.md §2.1 S3/S8 — the reference's
  * actual warehouse is Postgres over JDBC, app/etl.py:170-172). Driven
  * against embedded Derby (in Spark's classpath) through the exact
  * `df.write.jdbc` / `spark.read.jdbc` API a Postgres deployment would use —
  * only the URL differs.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()

  test("star-schema dimension round-trips through JDBC write/read") {
    val disease = Seq((1, "COVID-19")).toDF("id", "name")
    disease.write.mode("overwrite").jdbc(url, "disease", props)
    val back = spark.read.jdbc(url, "disease", props)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "COVID-19")))
  }

  test("append mode accumulates; predicate pushes into the JDBC scan") {
    val weekly = Seq(
      ("FR", "2021-03-01", 100), ("DE", "2021-03-01", 50),
    ).toDF("country_short_code", "week", "cases")
    weekly.write.mode("overwrite").jdbc(url, "weekly_stats", props)
    Seq(("IT", "2021-03-01", 75)).toDF("country_short_code", "week", "cases")
      .write.mode("append").jdbc(url, "weekly_stats", props)
    val back = spark.read.jdbc(url, "weekly_stats", props)
    assert(back.count() == 3)
    val filtered = back.filter($"cases" > 60)
    // JDBC source pushes the predicate into the generated SQL
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(cases,60)"), plan)
    assert(filtered.count() == 2)
  }

  test("partitioned parallel read: per-partition bounds on the key column") {
    val back = spark.read.jdbc(url, "weekly_stats",
      columnName = "cases", lowerBound = 0L, upperBound = 200L,
      numPartitions = 4, connectionProperties = props)
    assert(back.rdd.getNumPartitions == 4) // 4 concurrent range queries
    assert(back.count() == 3)
  }
}
