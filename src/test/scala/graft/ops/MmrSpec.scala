package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MMR re-ranking (s10): greedy math pinned by hand, the diversity
  * property on planted near-clones, and the distributed invariants.
  */
class MmrSpec extends AnyFunSuite with SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def rerank(df: org.apache.spark.sql.DataFrame, k: Int = 8,
      pool: Int = 30): Seq[(Int, Long, Double, Double)] =
    Similarity.mmrRerank(df, k, pool).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq

  test("near-clone of the top hit is demoted below a diverse candidate") {
    // When the top hit sits OFF-AXIS from the query, a clone hugging it
    // has sim(clone, top) ≫ rel(clone) and loses its round-2 slot to an
    // equally-relevant candidate on the other side:
    //   query (1,0); top A at 45° (rel .707); clone at 50° (rel .643,
    //   sim to A = cos5° ≈ .996); diverse at −50° (rel .643, sim to A =
    //   cos95° ≈ −.087).
    //   round 2: clone  → 0.7·.643 − 0.3·.996  ≈ 0.151
    //            diverse → 0.7·.643 − 0.3·(−.087) ≈ 0.476 → diverse wins.
    // Pure relevance (with the cid tiebreak) would rank A, clone, diverse.
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val df = emb(
      0L -> Seq(1f, 0f), // query
      5L -> at(45), // A — top relevance
      6L -> at(50), // near-clone of A
      7L -> at(-50), // diverse, same relevance as the clone
    )
    val out = rerank(df, k = 3)
    assert(out.map(_._2) == Seq(5L, 7L, 6L),
      s"MMR must pick the diverse candidate second, got $out")
    // rank-1 carries raw weighted relevance (empty-set ms = literal 0.0)
    val first = out.head
    assert(first._4 == 0.7 * first._3 - 0.3 * 0.0)
    // the demoted clone's score is dented by its redundancy with A
    val clone = out.find(_._2 == 6L).get
    assert(clone._4 < 0.7 * clone._3,
      "clone mmr must be penalized below pure weighted relevance")
  }

  test("greedy math exact on a hand-built matrix") {
    // two candidates, orthogonal: no redundancy penalty ever applies
    val df = emb(
      0L -> Seq(1f, 0f, 0f),
      5L -> Seq(1f, 0f, 0f), // rel 1.0
      6L -> Seq(0f, 1f, 0f), // rel 0.0, orthogonal to 5
    )
    val out = rerank(df, k = 2)
    assert(out.size == 2)
    assert(out(0) == ((1, 5L, 1.0, 0.7 * 1.0 - 0.3 * 0.0)))
    // round 2: ms = sim(6,5) = 0.0 exactly (orthogonal)
    assert(out(1) == ((2, 6L, 0.0, 0.7 * 0.0 - 0.3 * 0.0)))
  }

  test("negative cosines flow through the max unclamped") {
    // candidate 6 is ANTI-correlated with selected 5: ms = −1, so the
    // redundancy term REWARDS it: mmr = 0.7·rel − 0.3·(−1) = 0.7·rel + 0.3
    val df = emb(
      0L -> Seq(1f, 0f),
      5L -> Seq(1f, 0f), // rel 1 — first pick
      6L -> Seq(-1f, 0f), // rel −1, sim to 5 = −1
    )
    val out = rerank(df, k = 2)
    assert(out(1)._2 == 6L)
    assert(out(1)._4 == 0.7 * -1.0 - 0.3 * -1.0)
  }

  test("k beyond the pool truncates; pool of one works (self-pair path)") {
    val df = emb(0L -> Seq(1f, 0f), 5L -> Seq(1f, 1f))
    val out = rerank(df, k = 8)
    assert(out.map(_._2) == Seq(5L))
  }

  test("greedy matches a naive reference on random instances (property)") {
    // mmrGreedy is a single-pass argmax with explicit tie rules; the
    // reference below recomputes the textbook objective from scratch every
    // round. Identical doubles in, identical selections out — exactly.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(12)
      val ids = (0 until n).map(i => (i * 7 + 3).toLong) // non-contiguous ids
      val rel = ids.map(_ -> (rnd.nextDouble() * 2 - 1)).toMap
      val sim = (for (a <- ids; b <- ids) yield {
        (a, b) -> (if (a == b) 1.0 else rnd.nextDouble() * 2 - 1)
      }).toMap
      val k = 1 + rnd.nextInt(n + 2)
      val rows = for (a <- ids; b <- ids) yield (a, rel(a), b, sim((a, b)))
      val got = Similarity.mmrGreedy(rows.iterator, k).toSeq
      // naive reference
      var selected = Vector.empty[Long]
      val want = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
      for (r <- 1 to math.min(k, n)) {
        val scored = ids.filterNot(selected.contains).map { c =>
          val ms = if (selected.isEmpty) 0.0 else selected.map(s => sim((c, s))).max
          c -> (0.7 * rel(c) - 0.3 * ms)
        }
        val (bid, bm) = scored.minBy { case (c, m) => (-m, c) }
        want += ((r, bid, rel(bid), bm))
        selected :+= bid
      }
      assert(got == want.toSeq, s"n=$n k=$k")
    }
  }

  test("selection is independent of candidate partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L +: (5L to 60L)).map { id =>
      id -> Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    }
    val ref = rerank(rows.toDF("vec_id", "embedding"))
    for (p <- Seq(1, 7)) {
      val out = rerank(rows.toDF("vec_id", "embedding").repartition(p))
      assert(out == ref, s"partitioning $p changed the MMR selection")
    }
  }
}
