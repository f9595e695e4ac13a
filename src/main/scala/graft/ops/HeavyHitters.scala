package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.misra_gries
import graft.queries.Q

/** Heavy-hitters detection with a bounded-memory mergeable sketch
  * ([[org.apache.spark.sql.graft.MisraGries]]): find the keys that
  * dominate a stream/table without a full frequency shuffle. At 100 TB the
  * exact form (groupBy key → count → filter) exchanges every distinct key;
  * the sketch form exchanges k·tasks counters total, and its deterministic
  * guarantees (no false negatives above the n/(k+1) threshold, bounded
  * undercount) hold under ANY merge tree — so hot-key discovery for skew
  * mitigation (feeding `Skew.saltedAgg`'s key list) costs one narrow pass.
  */
object HeavyHitters {

  val K = 15 // sketch capacity → detection threshold n/(k+1) = n/16

  /** hh01 — the sketch's guarantees gated cross-engine. The key domain is
    * deliberately skew-shaped (one hot key owning ~1/3 of lineitem + a
    * ~40k-key unique-ish cold tail) so the 15-counter buffer is under
    * constant eviction pressure — the regime the sketch exists for.
    *
    * Which EXTRA counters survive and their raw estimates depend on merge
    * order (partition count, scheduling), so the gated output carries only
    * the ORDER-INVARIANT facts, each decidable in exact integer
    * arithmetic: for every TRUE heavy hitter (exact count · (k+1) > n,
    * computed exactly by the oracle) — membership in the sketch (the
    * no-false-negative guarantee) and the undercount bound
    * (0 ≤ exact − est, (exact − est)·(k+1) ≤ n). The oracle recomputes the
    * exact counts and pins both booleans TRUE.
    */
  def hh01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables.lineitem(s, dir).select(
      when($"l_orderkey" % 3 === 0, lit("hot"))
        .otherwise(concat(lit("cold_"), $"l_orderkey".cast("string")))
        .as("item"))
    val sketch = keyed.agg(
      misra_gries($"item", K).as("mg"),
      count(lit(1)).as("n"))
    val exact = keyed.groupBy($"item").agg(count(lit(1)).as("exact_cnt"))
    exact
      .crossJoin(broadcast(sketch))
      .filter($"exact_cnt" * (K + 1) > $"n") // true heavy hitters only
      .withColumn("entry", filter($"mg", e => e.getField("item") === $"item"))
      .select(
        $"item", $"exact_cnt",
        (size($"entry") === 1).as("in_sketch"),
        (size($"entry") === 1 &&
          element_at($"entry", 1).getField("est") <= $"exact_cnt" &&
          ($"exact_cnt" - element_at($"entry", 1).getField("est")) * (K + 1) <= $"n")
          .as("bounds_ok"))
      .orderBy($"item")
  }

  val hh01Oracle: String =
    s"""WITH keys AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot'
       |    ELSE 'cold_' || CAST(l_orderkey AS VARCHAR) END AS item FROM lineitem),
       |tot AS (SELECT COUNT(*) AS n FROM keys),
       |cnt AS (SELECT item, COUNT(*) AS exact_cnt FROM keys GROUP BY item)
       |SELECT item, exact_cnt, TRUE AS in_sketch, TRUE AS bounds_ok
       |FROM cnt, tot WHERE exact_cnt * ${K + 1} > n ORDER BY item""".stripMargin

  def all: Seq[Q] = Seq(
    Q("hh01_heavy_hitters", hh01, Some(hh01Oracle)),
  )
}
