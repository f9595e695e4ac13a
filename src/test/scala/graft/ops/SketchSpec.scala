package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class SketchSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def md5Bucket(seed: Int, token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$token".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % Sketch.Width
  }

  test("sk01 matches a driver-side sketch recompute; overcounts are non-negative") {
    val rows = Sketch.sk01(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    // full recompute: token stream → exact counts → 4×512 counters → min
    val toks = Tables.documents(spark, sfSmoke).select($"text").collect()
      .flatMap(r => TextAnalysis.normalizeJvm(r.getString(0)).split(' '))
      .filter(_.nonEmpty)
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- toks; s <- 0 until Sketch.Depth) {
      val k = (s, md5Bucket(s, t))
      cells(k) = cells.getOrElse(k, 0L) + 1L
    }
    def est(t: String): Long =
      (0 until Sketch.Depth).map(s => cells((s, md5Bucket(s, t)))).min
    val top = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(rows.toSeq == top.map { case (t, n) => (t, n, est(t), est(t) - n) })
    rows.foreach { case (t, n, e, over) =>
      assert(e >= n, s"CM must never undercount ($t)")
      assert(over == e - n)
    }
  }

  test("sk02 HLL: merged and global estimates inside the 5% envelope at BOTH gate and bench scale, exact counts right") {
    // both SFs deliberately: union-vs-direct register parity held at
    // sf0.001/sf0.01 cardinalities and broke at sf0.1 (union gadget lands
    // a different valid state past sparse mode) — the envelope contract is
    // the one that survives scale, so pin it at the larger SF too
    for (dir <- Seq(sfSmoke, "/root/testdata/sf0.1")) {
      val rows = Sketch.sk02(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      assert(rows.nonEmpty)
      val exact = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach { case (et, n, mergedOk, globalOk) =>
        assert(n == exact(et), s"exact distinct wrong for $et at $dir")
        assert(mergedOk, s"shard-union estimate outside 5% of exact for $et at $dir")
        assert(globalOk, s"global estimate outside 5% of exact for $et at $dir")
      }
    }
  }

  test("counters merge: disjoint halves cell-wise add to the full sketch") {
    val docs = Tables.documents(spark, sfSmoke)
    val a = Sketch.counters(Sketch.tokens(docs.filter($"doc_id" % 2 === 0)))
    val b = Sketch.counters(Sketch.tokens(docs.filter($"doc_id" % 2 =!= 0)))
    val merged = a.unionByName(b)
      .groupBy($"seed", $"bucket").agg(org.apache.spark.sql.functions.sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketch.counters(Sketch.tokens(docs))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
    // bounded size: the sketch never exceeds its D×W footprint
    assert(full.size <= Sketch.Depth * Sketch.Width)
  }
}
