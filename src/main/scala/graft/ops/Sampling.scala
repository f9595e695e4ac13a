package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Sampling operators for training-data curation.
  *
  * The workhorse is CONTENT-HASH sampling: a row is kept iff the md5 of its
  * key falls below a threshold prefix. Unlike `rand()`/Bernoulli samplers,
  * membership is a pure function of the key — identical across engines,
  * reruns, task retries, partitionings, and cluster sizes, and it degrades
  * to set-stable incremental samples (a 30% sample is a superset of the 20%
  * one). That reproducibility is what makes it oracle-checkable at all.
  */
object Sampling {

  /** Keep ≈ `percent`% of rows, decided by md5(key) < thresholdPrefix. */
  def hashSampleFilter(key: Column, percent: Int): Column = {
    require(percent > 0 && percent < 100, "percent in (0, 100)")
    // first 8 hex chars span 16^8 values uniformly; threshold = fraction
    val threshold = f"${(percent / 100.0 * 0xFFFFFFFFL).toLong}%08x"
    substring(md5(key.cast("string")), 1, 8) < threshold
  }

  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashSampleFilter(key, percent))

  /** Per-stratum fractions via Spark's `sampleBy` (seeded Bernoulli; not
    * engine-portable → spec-checked, not oracle-checked).
    */
  def stratifiedSample(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)

  /** q38 — deterministic 30% content-hash sample of documents, summarized
    * per language. The oracle applies the identical md5-prefix rule.
    */
  def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hashSample(Tables.documents(s, dir), $"doc_id", percent = 30)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"), min($"doc_id").as("first_id"))
      .orderBy($"lang")
  }

  val q38Oracle: String = {
    val threshold = f"${(30 / 100.0 * 0xFFFFFFFFL).toLong}%08x"
    s"""SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id
       |FROM documents
       |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$threshold'
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q38_hash_sample", q38, Some(q38Oracle)),
  )
}
