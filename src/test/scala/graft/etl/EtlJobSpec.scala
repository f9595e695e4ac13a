package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** End-to-end ETL over the reference's real WHO CSVs (SURVEY.md §5.4 golden
  * fixture run): row counts and aggregates derived from the committed data
  * (SURVEY.md §1.1: 62,640 fact rows, 261 weekly dates, 240 country codes,
  * 215 vaccination snapshot rows, 38 distinct vaccine names).
  */
class EtlJobSpec extends AnyFunSuite with SparkSpec {

  lazy val star: StarSchema = EtlJob.run(spark, referenceDataDir)

  test("who_region: 8 short codes, OTHER and UNKNOWN both display as Other") {
    val rows = star.whoRegion.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 8)
    assert(rows("OTHER") == "Other")
    assert(rows("UNKNOWN") == "Other")
    assert(rows("EURO") == "European Region")
    assert(rows("AFRO") == "African Region")
  }

  test("country: 240 distinct codes, one row per code") {
    assert(star.country.count() == 240)
    assert(star.country.select("country_short_code").distinct().count() == 240)
  }

  test("disease: exactly [(1, COVID-19)]") {
    assert(star.disease.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "COVID-19")))
  }

  test("vaccine: 38 named + sentinel, ids sequential in name order") {
    val rows = star.vaccine.orderBy("id").collect()
    assert(rows.length == 39)
    assert(rows.head.getInt(0) == 0 && rows.head.getString(1) == "unknown")
    val named = rows.tail
    assert(named.map(_.getInt(0)).toSeq == (1 to 38))
    val names = named.map(_.getString(1)).toSeq
    assert(names == names.sorted) // id order == name order
  }

  test("weekly_statistics: 261 Monday buckets, per-country totals preserved") {
    val ws = star.weeklyStatistics.cache()
    assert(ws.select("date_of_report").distinct().count() == 261)
    assert(ws.select("country_short_code").distinct().count() == 240)
    // Monday-start weeks: every bucket date is a Monday
    assert(ws.filter(dayofweek(col("date_of_report")) =!= 2).count() == 0)
    // fill-0 + sum preserves the grand total of the raw feed
    val rawTotal = EtlJob.readWhoCovid(spark, s"$referenceDataDir/WHO-COVID-19-global-data.csv")
      .agg(sum("New_cases")).collect()(0).getLong(0)
    val weeklyTotal = ws.agg(sum("week_new_reported_cases")).collect()(0).getLong(0)
    assert(weeklyTotal == rawTotal)
  }

  test("partitioned write: year filter prunes partitions at planning time") {
    val out = java.nio.file.Files.createTempDirectory("graft_wh").toString
    EtlJob.write(star, out)
    val back = spark.read.parquet(s"$out/weekly_statistics")
    val pruned = back.filter(col("report_year") === 2021)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("report_year"), plan)
    assert(pruned.count() == back.filter(year(col("date_of_report")) === 2021).count())
    // all six tables round-trip
    val names = star.tables.map(_._1)
    names.foreach { n =>
      assert(spark.read.parquet(s"$out/$n").count() > 0, s"table $n empty")
    }
  }

  test("daily_vaccine_statistics: snapshot degenerates to totals, sentinel vaccine") {
    val d = star.dailyVaccineStatistics.cache()
    // one snapshot row per country; some COUNTRY names don't match the WHO
    // country dim (left join + isNotNull filter drops them)
    assert(d.count() <= 215 && d.count() > 150)
    // every VACCINES_USED is blank in the committed snapshot → sentinel id 0
    assert(d.filter(col("vaccine_id") =!= 0).count() == 0)
    // lag over one-row partitions is always null → shots == TOTAL_VACCINATIONS
    assert(d.filter(col("new_reported_shots") < 0).count() == 0)
  }
}
