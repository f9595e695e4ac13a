package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits correctly on known values") {
    // z(0b101, 0b011) = a-bits at even positions, b-bits at odd:
    // a=5 (101), b=3 (011) → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b").as("z")).collect()(0).getLong(0)
    assert(out == 27L)
    // identity checks: z(x, 0) spreads x's bits to even positions
    val z40 = Seq((4L, 0L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b").as("z")).collect()(0).getLong(0)
    assert(z40 == 16L) // bit 2 of a → position 4
  }

  test("zorderWrite produces files whose min/max spans are tight on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/li"
    val li = graft.Tables.lineitem(spark, sfSmoke)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val nFiles = 16
    ZOrder.zorderWrite(li, dir, "l_orderkey", "l_partkey", nFiles)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == nFiles)
    // per-file spans of both clustering keys vs their global spans
    val m = 1 << ZOrder.Bits
    def spans(path: String): (Long, Long) = {
      val r = spark.read.parquet(path)
        .select(($"l_orderkey" % m).as("a"), ($"l_partkey" % m).as("b"))
        .agg(org.apache.spark.sql.functions.expr("max(a) - min(a)"),
          org.apache.spark.sql.functions.expr("max(b) - min(b)"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val global = spans(dir)
    val perFile = files.map(spans)
    val avgA = perFile.map(_._1).sum.toDouble / nFiles
    val avgB = perFile.map(_._2).sum.toDouble / nFiles
    // a single-column sort would give ~global span on the second key in
    // every file; the z-layout must shrink BOTH dimensions substantially
    assert(avgA < global._1 * 0.5, s"avg a-span $avgA vs global ${global._1}")
    assert(avgB < global._2 * 0.5, s"avg b-span $avgB vs global ${global._2}")
    // layout is a re-ordering only: content unchanged
    assert(spark.read.parquet(dir).count() == li.count())
  }

  test("z05 compaction plan: bins consecutive, bytes conserved, order preserved") {
    val rows = ZOrder.z05(spark, sfSmoke).collect()
    assert(rows.length >= 2, "expected multiple rewrite bins at smoke SF")
    // bins are dense from 0 (consecutive packing — no gaps, no reorder)
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    // conservation: Σ bin bytes == rows × width (every row filed exactly once)
    val manifestBytes = graft.Tables.lineitem(spark, sfSmoke).count() * ZOrder.RowWidth
    assert(rows.map(_.getLong(2)).sum == manifestBytes)
    // month ranges are ordered across bins (a boundary month can be
    // shared: several shard-files of one month may straddle two bins);
    // ISO strings order lexicographically = chronologically
    val spans = rows.sortBy(_.getLong(0)).map(r => (r.getString(3), r.getString(4)))
    spans.foreach { case (a, b) => assert(a <= b) }
    spans.sliding(2).foreach {
      case Array((_, prevTo), (nextFrom, _)) => assert(prevTo <= nextFrom)
      case _ =>
    }
    // every bin's first file starts inside it: fill can overshoot the
    // target by at most one file, so a bin is never more than one file
    // over-full AND never empty
    rows.foreach(r => assert(r.getLong(1) >= 1))
  }
}
