package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sf0.1 self-audit's restricted-input materializer: deterministic,
  * FK-consistent, and query-shape preserving — if this rots, the d05/d07
  * 10×-scale verification silently stops being reproducible.
  */
class AuditSampleSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  test("keep() is deterministic and splits near the requested percentage") {
    import spark.implicits._
    val ids = spark.range(0, 10000).toDF("id")
    val kept = ids.filter(AuditSample.keep($"id", 32)).count()
    // md5-bucket split: binomial-ish around 32% of 10k
    assert(kept > 2900 && kept < 3500, s"kept $kept of 10000 at pct=32")
    assert(kept == ids.filter(AuditSample.keep($"id", 32)).count(),
      "same filter, same rows")
    // monotone in pct: a wider cut is a superset
    val kept50 = ids.filter(AuditSample.keep($"id", 50))
    assert(ids.filter(AuditSample.keep($"id", 32))
      .join(kept50, Seq("id"), "left_anti").count() == 0,
      "pct=32 keep-set must be a subset of pct=50")
  }

  test("materialized restriction preserves shapes the audited queries rely on") {
    val out = java.nio.file.Files.createTempDirectory("auditsample").toString
    AuditSample.materialize(spark, sfSmoke, out)
    def load(t: String) = spark.read.parquet(s"$out/$t.parquet")
    // every table present
    val full = Seq("region", "nation", "customer", "supplier", "part", "lineitem")
    full.foreach { t =>
      assert(load(t).count() == spark.read.parquet(s"$sfSmoke/$t.parquet").count(),
        s"$t is copied whole")
    }
    // the similarity queries' probe set (vec_id < 5) must survive restriction
    val e = load("embeddings")
    assert(e.filter(col("vec_id") < 5).count() ==
      spark.read.parquet(s"$sfSmoke/embeddings.parquet")
        .filter(col("vec_id") < 5).count(),
      "query vectors are always kept")
    // restriction is by PRIMARY key: per-user event sequences stay intact
    val evFull = spark.read.parquet(s"$sfSmoke/events.parquet")
    val evKeptUsers = load("events").select("user_id").distinct()
    val perUserFull = evFull.groupBy(col("user_id")).count()
      .join(evKeptUsers, Seq("user_id"), "left_semi")
    val perUserKept = load("events").groupBy(col("user_id")).count()
    assert(perUserFull.exceptAll(perUserKept).count() == 0 &&
      perUserKept.exceptAll(perUserFull).count() == 0,
      "a kept user keeps every one of its events")
    // documents restriction is in the documented band
    val d = load("documents").count().toDouble /
      spark.read.parquet(s"$sfSmoke/documents.parquet").count()
    assert(d > 0.2 && d < 0.45, s"documents keep-rate $d outside the 32% band")
  }
}
