package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Wall-clock regression tripwires for the historically slowest gated
  * queries (round-3 bench at sf0.1/local[32]: t14 9.0 s, c02 8.5 s,
  * d10 8.2 s, t10 7.1 s, d06 5.1 s — all audited as the right plan shape,
  * their cost is genuine work volume).
  *
  * Run here at sf0.01/local[4] where each completes in seconds. Ceilings
  * are ~3x a measured warm median on the dev box, so only a plan-shape
  * regression (lost broadcast, new unbounded shuffle, lineage blowup in
  * the iterative ops) trips them — not JIT or machine noise. A >2x jump
  * should fail HERE, before the driver's sf0.1 bench ever sees it.
  */
class BudgetSpec extends AnyFunSuite with SparkSpec {

  private val sfGate = "/root/testdata/sf0.01"

  private def seconds(name: String): Double = {
    val df = graft.SparkEntry.queries(name)(spark, sfGate)
    val t0 = System.nanoTime()
    df.collect()
    spark.catalog.clearCache() // same hygiene as Bench: no cross-query piling
    (System.nanoTime() - t0) / 1e9
  }

  private def budget(name: String, ceilingSec: Double): Unit =
    test(s"$name stays under ${ceilingSec}s at sf0.01 (3x warm median)") {
      val t = seconds(name)
      info(f"$name: $t%.2f s (ceiling ${ceilingSec}s)")
      assert(t < ceilingSec, f"$name took $t%.2f s — plan regression? " +
        "Check .explain for a lost broadcast / new exchange before raising this.")
    }

  // one throwaway execution so the first measured query does not pay the
  // whole-stage-codegen + parquet-footer warmup for the suite
  test("warmup (unmeasured)") {
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfGate).collect()
  }

  budget("t14_dup_substrings", 30.0)
  budget("c02_neardup_consolidation", 30.0)
  budget("d10_containment_join", 30.0)
  budget("t10_winnowing_pairs", 30.0)
  budget("d06_dup_clusters", 30.0)
  // the iterative graph loops — cost is per-round scheduling, so a lost
  // lineage cut or a width regression shows up as a multiple, not noise
  budget("pr01_pagerank", 30.0)
  budget("sp01_bfs_hops", 30.0)
}
