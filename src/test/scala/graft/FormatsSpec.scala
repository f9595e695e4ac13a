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

  test("binaryFile source: opaque media payloads ingest with path/length/content") {
    // the real ingestion path for the multimodal pipeline (ops.Multimodal
    // synthesizes payloads from documents only because this container has
    // no media): arbitrary bytes in, (path, modificationTime, length,
    // content) out, filterable by glob
    val dir = java.nio.file.Paths.get(tmp, "media")
    java.nio.file.Files.createDirectories(dir)
    val payload = Array.tabulate[Byte](256)(i => (i % 251).toByte)
    java.nio.file.Files.write(dir.resolve("clip1.bin"), payload)
    java.nio.file.Files.write(dir.resolve("clip2.bin"), payload.take(10))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "skip me".getBytes)
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
    assert(media.count() == 2) // glob filtered
    val row = media.filter($"path".endsWith("clip1.bin")).collect()(0)
    assert(row.getAs[Long]("length") == 256L)
    assert(row.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
    // feeds the existing typed pipeline unchanged
    val decoded = graft.ops.Multimodal.decode(
      media.select(
        when($"path".endsWith("clip1.bin"), 1L).otherwise(2L).as("media_id"),
        lit("video").as("modality"),
        $"content".as("payload")).as[graft.ops.Multimodal.MediaRow])
    assert(decoded.filter($"media_id" === 1L).collect()(0).byte_len == 256)
  }

  test("XML source (built-in since Spark 4) round-trips with an explicit schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString + "/t"
    val df = Seq((1L, "alpha", 9.5), (2L, "beta", 1.25)).toDF("id", "name", "score")
    df.write.option("rootTag", "rows").option("rowTag", "row").format("xml").save(dir)
    val back = spark.read
      .schema("id BIGINT, name STRING, score DOUBLE")
      .option("rowTag", "row").format("xml").load(dir)
      .orderBy($"id")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 9.5), (2L, "beta", 1.25)))
  }

  test("text and wholetext sources round-trip line/document granularity") {
    val dir = java.nio.file.Paths.get(tmp, "txt")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("doc.txt"), "alpha\nbeta\ngamma".getBytes)
    assert(spark.read.text(dir.toString).count() == 3) // one row per line
    val whole = spark.read.option("wholetext", "true").text(dir.toString).collect()
    assert(whole.length == 1 && whole(0).getString(0) == "alpha\nbeta\ngamma")
  }
}
