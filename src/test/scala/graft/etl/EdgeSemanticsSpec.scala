package graft.etl

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit tests for the SURVEY.md §1.4 edge semantics, on literal DataFrames
  * (FIXTURES.md "edge-case mini-fixtures").
  */
class EdgeSemanticsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def covidRow(
      date: String, code: String, country: String, region: String,
      newCases: Integer, cumCases: Long, newDeaths: Integer, cumDeaths: Long) =
    (Date.valueOf(date), code, country, region, newCases, cumCases, newDeaths, cumDeaths)

  private val covidCols = Seq("Date_reported", "Country_code", "Country", "WHO_region",
    "New_cases", "Cumulative_cases", "New_deaths", "Cumulative_deaths")

  test("typed fill: a week with only-null New_cases sums to 0, not null") {
    val covid = EtlJob.prepareCovid(Seq(
      covidRow("2021-03-07", "AA", "Aland", "EURO", null, 10L, null, 1L),
      covidRow("2021-03-14", "AA", "Aland", "EURO", null, 10L, null, 1L),
    ).toDF(covidCols: _*))
    val star = EtlJob.build(spark, covid, emptyVacc, emptyMeta)
    val sums = star.weeklyStatistics
      .select("week_new_reported_cases", "week_new_reported_deaths").collect()
    assert(sums.forall(r => r.getInt(0) == 0 && r.getInt(1) == 0))
  }

  test("region recode: blank and literal OTHER both display as Other") {
    val covid = EtlJob.prepareCovid(Seq(
      covidRow("2021-03-07", "AA", "Aland", null, 1, 1L, 0, 0L),
      covidRow("2021-03-07", "BB", "Borduria", "OTHER", 1, 1L, 0, 0L),
      covidRow("2021-03-07", "CC", "Cordillera", "EMRO", 1, 1L, 0, 0L),
    ).toDF(covidCols: _*))
    val star = EtlJob.build(spark, covid, emptyVacc, emptyMeta)
    val byCode = star.whoRegion.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCode("UNKNOWN") == "Other") // blank was filled to UNKNOWN
    assert(byCode("OTHER") == "Other")   // literal OTHER falls through too
    assert(byCode("EMRO") == "Eastern Mediterranean Region")
  }

  test("vaccine split: 'A, B,C' joins all three names (per-element trim)") {
    val vacc = vaccRows(Seq(("Wonderland", "2021-05-05", 300.0, "VaxA, VaxB,VaxC")))
    val meta = metaRows(Seq("VaxA", "VaxB", "VaxC"))
    val covid = EtlJob.prepareCovid(Seq(
      covidRow("2021-03-07", "WL", "Wonderland", "EURO", 1, 1L, 0, 0L),
    ).toDF(covidCols: _*))
    val star = EtlJob.build(spark, covid, vacc, meta)
    val ids = star.dailyVaccineStatistics.select("vaccine_id")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == Seq(1, 2, 3)) // all three matched; none fell to sentinel 0
  }

  test("lag fallback: first snapshot reports the running total, later ones the delta") {
    val vacc = vaccRows(Seq(
      ("Wonderland", "2021-05-05", 300.0, ""),
      ("Wonderland", "2021-06-05", 450.0, ""),
    ))
    val covid = EtlJob.prepareCovid(Seq(
      covidRow("2021-03-07", "WL", "Wonderland", "EURO", 1, 1L, 0, 0L),
    ).toDF(covidCols: _*))
    val star = EtlJob.build(spark, covid, vacc, emptyMeta)
    val byDay = star.dailyVaccineStatistics
      .collect().map(r => r.getDate(1).toString -> r.getLong(3)).toMap
    assert(byDay("2021-05-05") == 300L) // lag null → fallback to total
    assert(byDay("2021-06-05") == 150L) // 450 - 300
  }

  test("ISO week at the year boundary: Jan 1 2021 is week 53 (of ISO-2020)") {
    // the serving join key (year, weekofyear) disagrees with the ETL's
    // date_trunc('week') bucket across the boundary — SURVEY.md §2.8
    val wk = Seq(Date.valueOf("2021-01-01")).toDF("d")
      .select(year($"d").as("y"), weekofyear($"d").as("w")).collect()(0)
    assert(wk.getInt(0) == 2021 && wk.getInt(1) == 53)
  }

  private def emptyVacc =
    vaccRows(Seq.empty)

  private def emptyMeta =
    metaRows(Seq.empty)

  /** Minimal vaccination-data frame with the committed schema. */
  private def vaccRows(rows: Seq[(String, String, Double, String)]) = {
    val full = rows.map { case (country, day, total, used) =>
      (country, "XXX", "EURO", "REPORTING", Date.valueOf(day), total,
        null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
        null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double],
        null.asInstanceOf[java.lang.Double], used, null.asInstanceOf[Date],
        null.asInstanceOf[Integer], null.asInstanceOf[java.lang.Double],
        null.asInstanceOf[java.lang.Double])
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(full.map(org.apache.spark.sql.Row.fromTuple)),
      Schemas.vaccinationData)
  }

  private def metaRows(names: Seq[String]) = {
    val rows = names.map(n => org.apache.spark.sql.Row(
      "XXX", s"$n product", n, s"$n corp",
      null.asInstanceOf[Date], null.asInstanceOf[Date], null.asInstanceOf[Date],
      null, "SRC"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.vaccinationMetadata)
  }
}
