package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

class WarehouseScd2Spec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val t1 = ts("2024-01-01 00:00:00")
  private val t2 = ts("2024-02-01 00:00:00")
  private val t3 = ts("2024-03-01 00:00:00")

  private val empty = Seq.empty[(Long, String, Timestamp, Option[Timestamp], Boolean)]
    .toDF("id", "segment", "valid_from", "valid_to", "is_current")

  test("scd2: insert, change closes old version, unchanged is a no-op") {
    val v1 = Warehouse.scd2Merge(empty,
      Seq((1L, "GOLD"), (2L, "SILVER")).toDF("id", "segment"),
      "id", Seq("segment"), t1)
    assert(v1.count() == 2)
    assert(v1.filter($"is_current").count() == 2)

    // id 1 changes segment, id 2 unchanged
    val v2 = Warehouse.scd2Merge(v1,
      Seq((1L, "PLATINUM"), (2L, "SILVER")).toDF("id", "segment"),
      "id", Seq("segment"), t2)
    assert(v2.count() == 3) // 2 current + 1 closed
    val id1 = v2.filter($"id" === 1L).orderBy($"valid_from").collect()
    assert(id1.length == 2)
    assert(!id1(0).getAs[Boolean]("is_current") &&
      id1(0).getAs[Timestamp]("valid_to") == t2)
    assert(id1(1).getAs[Boolean]("is_current") &&
      id1(1).getAs[String]("segment") == "PLATINUM")
    assert(v2.filter($"id" === 2L).count() == 1) // untouched

    // idempotence: re-applying the same state changes nothing
    val v3 = Warehouse.scd2Merge(v2,
      Seq((1L, "PLATINUM"), (2L, "SILVER")).toDF("id", "segment"),
      "id", Seq("segment"), t3)
    assert(v3.count() == 3)

    // a third change keeps the full version chain
    val v4 = Warehouse.scd2Merge(v3,
      Seq((1L, "GOLD")).toDF("id", "segment"), "id", Seq("segment"), t3)
    assert(v4.filter($"id" === 1L).count() == 3)
    assert(v4.filter($"id" === 1L && $"is_current").collect()(0)
      .getAs[String]("segment") == "GOLD")
  }

  test("scd2: duplicate-pk update rows reduce to one version, deterministically") {
    // identical duplicates collapse; conflicting duplicates pick exactly one
    // stable winner — never two concurrent is_current rows for the same pk
    val v1 = Warehouse.scd2Merge(empty,
      Seq((1L, "GOLD"), (1L, "GOLD"), (2L, "SILVER"), (2L, "BRONZE"))
        .toDF("id", "segment"),
      "id", Seq("segment"), t1)
    assert(v1.count() == 2)
    assert(v1.filter($"id" === 2L && $"is_current").count() == 1)
    val winner = v1.filter($"id" === 2L).collect()(0).getAs[String]("segment")
    // rerun of the same batch is bit-stable AND a no-op against the result
    val v1again = Warehouse.scd2Merge(empty,
      Seq((2L, "BRONZE"), (2L, "SILVER"), (1L, "GOLD"), (1L, "GOLD"))
        .toDF("id", "segment"),
      "id", Seq("segment"), t1)
    assert(v1again.filter($"id" === 2L).collect()(0)
      .getAs[String]("segment") == winner)
    val v2 = Warehouse.scd2Merge(v1,
      Seq((2L, "SILVER"), (2L, "BRONZE")).toDF("id", "segment"),
      "id", Seq("segment"), t2)
    assert(v2.filter($"id" === 2L).count() == 1) // winner unchanged → no-op
  }

  test("upsert: duplicate-pk update rows pick one deterministic winner") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val merged = Warehouse.upsert(existing, updates, "id")
    assert(merged.count() == 3)
    assert(merged.groupBy($"id").count().filter($"count" > 1).count() == 0)
    val w1 = merged.filter($"id" === 2L).collect()(0).getAs[String]("v")
    val mergedAgain = Warehouse.upsert(existing,
      Seq((3L, "z"), (2L, "y"), (2L, "x")).toDF("id", "v"), "id")
    assert(mergedAgain.filter($"id" === 2L).collect()(0).getAs[String]("v") == w1)
    assert(Set("x", "y").contains(w1))
  }

  test("cdcApply: confluent over batch splits, idempotent on replay") {
    // changelog of versioned rows: (pk, version, payload)
    val log = Seq(
      (1L, 1L, "a1"), (1L, 3L, "a3"), (1L, 2L, "a2"),
      (2L, 5L, "b5"), (2L, 4L, "b4"),
      (3L, 7L, "c7"),
    ).toDF("id", "ver", "v")
    val empty = log.limit(0)
    def applyAll(batches: Seq[org.apache.spark.sql.DataFrame]) =
      batches.foldLeft(empty)((st, b) => Warehouse.cdcApply(st, b, "id", Seq("ver")))
        .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val oneShot = applyAll(Seq(log))
    assert(oneShot == Seq((1L, 3L, "a3"), (2L, 5L, "b5"), (3L, 7L, "c7")))
    // chop three ways, apply in opposite orders → same converged table
    val chunks = (0 until 3).map(k => log.filter($"ver" % 3 === k))
    assert(applyAll(chunks) == oneShot)
    assert(applyAll(chunks.reverse) == oneShot)
    // replaying a stale batch is a no-op (unlike upsert, version wins)
    val state = Warehouse.cdcApply(empty, log, "id", Seq("ver"))
    val stale = Seq((1L, 1L, "a1")).toDF("id", "ver", "v")
    val replayed = Warehouse.cdcApply(state, stale, "id", Seq("ver"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(replayed == oneShot)
  }

  test("compact: many small files rewrite to few, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = spark.range(0, 10000).selectExpr("id", "id % 7 AS grp")
    df.repartition(64).write.mode("overwrite").parquet(dir) // 64 tiny files
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 64)
    val n = Warehouse.compact(spark, dir, targetBytes = 1L << 20)
    assert(parquetFiles == n && n < 64)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).collect()(0)
      .getLong(0) == 49995000L)
  }

  test("compactManifest: manifest-committed compaction is crash-safe and non-destructive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString + "/t"
    val df = spark.range(0, 10000).selectExpr("id", "id % 7 AS grp")
    df.repartition(32).write.mode("overwrite").parquet(dir)
    assert(Warehouse.Manifest.latest(spark, dir).isEmpty) // plain-dir fallback
    assert(Warehouse.Manifest.read(spark, dir).count() == 10000)

    val v1 = Warehouse.compactManifest(spark, dir, targetBytes = 1L << 20)
    assert(v1 == 1)
    val (ver1, files1) = Warehouse.Manifest.latest(spark, dir).get
    assert(ver1 == 1 && files1.nonEmpty && files1.forall(_.contains("data-v00000001")))
    assert(Warehouse.Manifest.read(spark, dir).count() == 10000)

    // second compaction: version bumps, v1's files remain on disk — an
    // in-flight reader of v1 is undisturbed
    val v2 = Warehouse.compactManifest(spark, dir, targetBytes = 1L << 20)
    assert(v2 == 2)
    assert(files1.forall(p => new java.io.File(new java.net.URI(p).getPath).exists ||
      new java.io.File(p.stripPrefix("file:")).exists))
    assert(Warehouse.Manifest.read(spark, dir).count() == 10000)

    // crash simulation: data files written but NO manifest PUT — readers
    // still see the last committed version, untouched
    val orphan = new java.io.File(new java.io.File(dir), "data-v00000099")
    spark.range(0, 5).toDF("id").write.parquet(orphan.toString)
    val (verAfter, _) = Warehouse.Manifest.latest(spark, dir).get
    assert(verAfter == 2)
    assert(Warehouse.Manifest.read(spark, dir).count() == 10000)

    val total = Warehouse.Manifest.read(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"id")).collect()(0).getLong(0)
    assert(total == 49995000L)
  }

  test("scd2: null attribute values compare null-safely") {
    val v1 = Warehouse.scd2Merge(empty,
      Seq((1L, Option.empty[String])).toDF("id", "segment"),
      "id", Seq("segment"), t1)
    assert(v1.count() == 1)
    // same null value again → no new version
    val v2 = Warehouse.scd2Merge(v1,
      Seq((1L, Option.empty[String])).toDF("id", "segment"),
      "id", Seq("segment"), t2)
    assert(v2.count() == 1)
    // null → value is a change
    val v3 = Warehouse.scd2Merge(v2,
      Seq((1L, Some("GOLD"))).toDF("id", "segment"),
      "id", Seq("segment"), t2)
    assert(v3.count() == 2)
  }
}
