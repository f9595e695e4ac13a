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

  test("EtlJob.writeJdbc lands a star schema, order-free") {
    import java.sql.Date
    val star = graft.etl.StarSchema(
      whoRegion = Seq(("EURO", "European Region")).toDF("who_region_short_code", "who_region_name"),
      country = Seq(("FR", "France", "EURO"))
        .toDF("country_short_code", "country_name", "who_region_short_code"),
      disease = Seq((1, "COVID-19")).toDF("id", "name"),
      vaccine = Seq((0, "unknown", 1)).toDF("id", "name", "treated_disease"),
      weeklyStatistics = Seq(("FR", Date.valueOf("2021-03-01"), 10, 1, 1))
        .toDF("country_short_code", "date_of_report", "week_new_reported_cases",
          "week_new_reported_deaths", "disease_id"),
      dailyVaccineStatistics = Seq(("FR", Date.valueOf("2021-03-01"), 0, 5L))
        .toDF("country_short_code", "day_of_report", "vaccine_id", "new_reported_shots"),
    )
    graft.etl.EtlJob.writeJdbc(star, url, props)
    star.tables.foreach { case (name, df) =>
      assert(spark.read.jdbc(url, name, props).count() == df.count(), name)
    }
    // overwrite is idempotent — no FK-ordered pre-clean needed
    graft.etl.EtlJob.writeJdbc(star, url, props)
    assert(spark.read.jdbc(url, "weekly_statistics", props).count() == 1)
  }

  test("partitioned parallel read: per-partition bounds on the key column") {
    val back = spark.read.jdbc(url, "weekly_stats",
      columnName = "cases", lowerBound = 0L, upperBound = 200L,
      numPartitions = 4, connectionProperties = props)
    assert(back.rdd.getNumPartitions == 4) // 4 concurrent range queries
    assert(back.count() == 3)
  }
}
