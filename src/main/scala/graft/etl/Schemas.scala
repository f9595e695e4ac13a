package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's source CSVs (SURVEY.md §1.1).
  *
  * The reference reads all CSVs with `header=true` and NO schema, so every
  * column is a string until individually cast (reference: app/etl.py:59-61).
  * This engine reads with explicit typed schemas instead — which makes the
  * reference's silent `fillna`-on-string no-op (app/etl.py:65, SURVEY.md
  * §1.4) a REAL fill here; the observable delta is documented at the fill
  * site in [[EtlJob]].
  */
object Schemas {

  /** WHO-COVID-19-global-data.csv — 62,640 rows, weekly cadence. */
  val whoCovid: StructType = StructType(Seq(
    StructField("Date_reported", DateType),
    StructField("Country_code", StringType),
    StructField("Country", StringType),
    StructField("WHO_region", StringType),
    StructField("New_cases", IntegerType),
    StructField("Cumulative_cases", LongType),
    StructField("New_deaths", IntegerType),
    StructField("Cumulative_deaths", LongType),
  ))

  /** vaccination-data.csv — one snapshot row per country (215 rows). */
  val vaccinationData: StructType = StructType(Seq(
    StructField("COUNTRY", StringType),
    StructField("ISO3", StringType),
    StructField("WHO_REGION", StringType),
    StructField("DATA_SOURCE", StringType),
    StructField("DATE_UPDATED", DateType),
    StructField("TOTAL_VACCINATIONS", DoubleType), // scientific notation e.g. 2.296475E7
    StructField("PERSONS_VACCINATED_1PLUS_DOSE", DoubleType),
    StructField("TOTAL_VACCINATIONS_PER100", DoubleType),
    StructField("PERSONS_VACCINATED_1PLUS_DOSE_PER100", DoubleType),
    StructField("PERSONS_LAST_DOSE", DoubleType),
    StructField("PERSONS_LAST_DOSE_PER100", DoubleType),
    StructField("VACCINES_USED", StringType), // comma-joined list; empty in every committed row
    StructField("FIRST_VACCINE_DATE", DateType),
    StructField("NUMBER_VACCINES_TYPES_USED", IntegerType),
    StructField("PERSONS_BOOSTER_ADD_DOSE", DoubleType),
    StructField("PERSONS_BOOSTER_ADD_DOSE_PER100", DoubleType),
  ))

  /** vaccination-metadata.csv — 1,105 rows, 38 distinct VACCINE_NAME. */
  val vaccinationMetadata: StructType = StructType(Seq(
    StructField("ISO3", StringType),
    StructField("PRODUCT_NAME", StringType),
    StructField("VACCINE_NAME", StringType),
    StructField("COMPANY_NAME", StringType),
    StructField("AUTHORIZATION_DATE", DateType),
    StructField("START_DATE", DateType),
    StructField("END_DATE", DateType),
    StructField("COMMENT", StringType),
    StructField("DATA_SOURCE", StringType),
  ))

  /** OWID subset read by the ML path
    * (reference: app/routes/predict_france_with_model.py:25). */
  val owidCovid: StructType = StructType(Seq(
    StructField("location", StringType),
    StructField("date", DateType),
    StructField("new_cases", DoubleType),
    StructField("new_tests", DoubleType),
    StructField("people_vaccinated", DoubleType),
  ))
}
