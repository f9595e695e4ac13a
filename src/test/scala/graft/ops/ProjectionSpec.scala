package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins s11's JL projection: the distance-preservation property the
  * operator exists for (on real testdata, deterministic), the
  * Rademacher sign balance, and output shape invariants.
  */
class ProjectionSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private lazy val projs: Map[Long, Array[Double]] = {
    val rows = graft.SparkEntry.queries("s11_jl_projection")(spark, sfSmoke).collect()
    rows.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
    }
  }

  private lazy val embs: Map[Long, Array[Float]] =
    graft.Tables.embeddings(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("output shape: K coordinates per vector, all finite") {
    assert(projs.nonEmpty)
    assert(projs.values.forall(_.length == Projection.K))
    assert(projs.values.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
  }

  test("JL distance preservation on real pairs (K=16 → loose but real bounds)") {
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i).toDouble - b(i)) * (a(i) - b(i).toDouble)).sum
    def p2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val ids = embs.keys.toSeq.sorted.take(20)
    val ratios = for {
      i <- ids.indices; k <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(k))
    } yield (p2(projs(a), projs(b)) / Projection.K) / d2(embs(a), embs(b))
    // E[ratio] = 1 per pair; K=16 has heavy per-pair variance, so assert
    // per-pair sanity loosely and the MEAN tightly (190 pairs average out)
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"some pair grossly distorted: min ${ratios.min}, max ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, s"mean distortion $mean drifted from 1")
  }

  test("md5 Rademacher signs are balanced over the (j, d) grid") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val plus = (for {
      j <- 0 until Projection.K; d <- 0 until Projection.D
    } yield {
      md.reset()
      val h = md.digest(s"jl:$j:$d".getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(h.take(4).map(b => f"$b%02x").mkString, 16)
      if (v % 2 == 0) 1 else 0
    }).sum
    val frac = plus.toDouble / (Projection.K * Projection.D)
    assert(frac > 0.4 && frac < 0.6, s"sign balance $frac")
  }
}
