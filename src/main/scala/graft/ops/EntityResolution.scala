package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Entity resolution: find records that denote the same real-world entity
  * under name variation — the classic block → compare → match pipeline.
  * Fuzzy matching is the record-linkage sibling of document dedup (d02/d04
  * work on token sets; this works on edit distance over short strings —
  * names, brands, addresses).
  */
object EntityResolution {

  val MaxEditDistance = 2

  /** Blocking key: the LAST word of the name (the head noun in
    * modifier–noun part names). Engine and oracle MUST compute the same
    * key from the same expression family — a previous revision blocked on
    * the last word Spark-side but the second word oracle-side, which only
    * coincided because every generated name happened to be exactly two
    * words. `[^ ]+$` is portable: Spark `regexp_extract(_, _, 0)` and
    * DuckDB `regexp_extract(_, _)` both return the full match.
    */
  def blockKey(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(name, "[^ ]+$", 0)

  val blockKeySql: String = "regexp_extract(p_name, '[^ ]+$')"

  /** e01 — fuzzy candidate pairs over the part-name vocabulary:
    * canonicalize to DISTINCT names first (the entity table is orders of
    * magnitude smaller than the fact — dedup before comparing, never
    * pairwise over raw rows), block on the head noun (comparisons only
    * within a block: pair work is Σ blockᵢ², not n²), then exact
    * levenshtein ≤ 2 inside each block. Output: the candidate merge pairs
    * with each variant's support count — what a steward (or an automatic
    * min-support rule) consumes to pick canonical forms.
    *
    * At 100 TB the same three stages hold: the distinct-entity groupBy is
    * the only fact-scale shuffle, blocks are the unit of quadratic work
    * (skewed blocks get salted or length-sub-blocked like any hot key),
    * and the edit-distance compare never leaves a block bucket.
    */
  def e01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val entities = Tables.part(s, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", blockKey($"p_name"))
    val a = entities.select($"p_name".as("a_name"), $"n_parts".as("n_a"), $"blk")
    val b = entities.select($"p_name".as("b_name"), $"n_parts".as("n_b"), $"blk")
    a.join(b, Seq("blk"))
      .filter($"a_name" < $"b_name")
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist".between(1, MaxEditDistance))
      .select($"a_name", $"b_name", $"dist", $"n_a", $"n_b")
      .orderBy($"a_name", $"b_name")
  }

  val e01Oracle: String =
    s"""WITH e AS (SELECT p_name, COUNT(*) AS n_parts,
       |    $blockKeySql AS blk
       |  FROM part GROUP BY p_name)
       |SELECT a.p_name AS a_name, b.p_name AS b_name,
       |  levenshtein(a.p_name, b.p_name) AS dist,
       |  a.n_parts AS n_a, b.n_parts AS n_b
       |FROM e a JOIN e b ON a.blk = b.blk AND a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance
       |ORDER BY a_name, b_name""".stripMargin

  /** e02 — entity CONSOLIDATION: e01's pairwise matches closed into
    * entity clusters (transitive: if A≈B and B≈C, all three are one
    * entity even when lev(A,C) > 2), each cluster collapsed to one
    * canonical row — the min variant name, the variant list, and the
    * total fact-side support. This is the table a golden-record/MDM
    * pipeline actually publishes; e01's pairs are its evidence log.
    * Reuses [[Dedup.connectedComponents]] (min-label propagation +
    * pointer jumping — the label domain here is strings, the algorithm
    * only needs an ordered type); the oracle closes the identical edge
    * set with recursive SQL. Graph-sized shuffles only: the single
    * fact-scale aggregation is e01's distinct-entity groupBy.
    */
  def e02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = e01(s, dir).select($"a_name".as("a"), $"b_name".as("b"))
    val comps = Dedup.connectedComponents(edges)
    val entities = Tables.part(s, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
    comps.join(entities, comps("id") === entities("p_name"))
      .groupBy($"comp")
      .agg(
        count(lit(1)).as("n_variants"),
        sum($"n_parts").cast("long").as("total_support"),
        // canonical CSV string, not a native ARRAY: the driver's
        // comparator sorts rows by every column and cannot hash/sort
        // ndarray cells (q36 precedent)
        array_join(sort_array(collect_list($"id")), ",").as("variants"),
      )
      .select($"comp".as("canonical_name"), $"n_variants", $"total_support",
        $"variants")
      .orderBy($"canonical_name")
  }

  val e02Oracle: String =
    s"""WITH RECURSIVE e AS (SELECT p_name, COUNT(*) AS n_parts,
       |    $blockKeySql AS blk
       |  FROM part GROUP BY p_name),
       |cand AS (SELECT a.p_name AS a, b.p_name AS b
       |  FROM e a JOIN e b ON a.blk = b.blk AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance),
       |nodes AS (SELECT a AS id FROM cand UNION SELECT b FROM cand),
       |sym AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
       |reach AS (
       |  SELECT id, id AS comp FROM nodes
       |  UNION
       |  SELECT s.b AS id, r.comp FROM reach r JOIN sym s ON s.a = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
       |SELECT comp AS canonical_name, COUNT(*) AS n_variants,
       |  CAST(SUM(n_parts) AS BIGINT) AS total_support,
       |  array_to_string(list_sort(list(id)), ',') AS variants
       |FROM comp JOIN e ON comp.id = e.p_name
       |GROUP BY comp ORDER BY canonical_name""".stripMargin

  /** e03 — BLOCKING-QUALITY EVALUATION: the two standard record-linkage
    * index metrics (Christen 2012) for e01's head-noun blocking, as one
    * gated row:
    *  - REDUCTION RATIO: 1 − candidate/all pairs — how much comparison
    *    work the blocking scheme saves (in ppm, integer-exact);
    *  - PAIRS COMPLETENESS: found/true matches — how many true matches
    *    survive blocking (the recall of the INDEX, before any matcher
    *    runs).
    * This is the harness that keeps a blocking scheme honest as data
    * drifts: RR quantifies cost, PC quantifies loss, and both move when
    * someone "optimizes" the block key.
    *
    * Scale shape: neither pair universe is materialized as pairs —
    * all-pairs is arithmetic n(n−1)/2, candidate-pairs is Σ C(blockᵢ,2)
    * over block SIZES (one tiny agg). The exact truth (lev ≤ 2 over
    * distinct names, blocking-independent) is computed under LENGTH
    * pruning: lev(a,b) ≤ 2 ⇒ |len a − len b| ≤ 2, so each name joins only
    * its 5-length window (an equi-join on exploded length keys, never a
    * cross join) — the provably-lossless analogue of d10's prefix filter.
    * In production the truth side runs on a domain sample; here the gate
    * affords it exactly.
    */
  def e03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val entities = graft.util.Eager.cached(
      Tables.part(s, dir).select($"p_name").distinct()
        .select($"p_name", blockKey($"p_name").as("blk"), length($"p_name").as("len")))
    val nAgg = entities.agg(count(lit(1)).as("n_entities"))
    val candAgg = entities.groupBy($"blk").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("cand_pairs"))
    val a = entities.select($"p_name".as("a_name"), $"len".as("la"))
    val b = entities.select($"p_name".as("b_name"), $"len".as("lb"))
    val trueAgg = a
      .select($"a_name", $"la", explode(array((-2 to 2).map($"la" + _): _*)).as("lw"))
      .join(b, $"lw" === $"lb" && $"a_name" < $"b_name")
      .filter(levenshtein($"a_name", $"b_name").between(1, MaxEditDistance))
      .agg(count(lit(1)).as("true_matches"))
    val a2 = entities.select($"p_name".as("a_name"), $"blk")
    val b2 = entities.select($"p_name".as("b_name"), $"blk")
    val foundAgg = a2.join(b2, Seq("blk"))
      .filter($"a_name" < $"b_name")
      .filter(levenshtein($"a_name", $"b_name").between(1, MaxEditDistance))
      .agg(count(lit(1)).as("found_matches"))
    nAgg.crossJoin(candAgg).crossJoin(trueAgg).crossJoin(foundAgg)
      .select($"n_entities",
        expr("n_entities * (n_entities - 1) div 2").as("all_pairs"),
        $"cand_pairs", $"true_matches", $"found_matches")
      .select($"*",
        expr("((all_pairs - cand_pairs) * 1000000) div all_pairs")
          .as("reduction_ppm"),
        when($"true_matches" === 0, lit(null).cast("long"))
          .otherwise(expr("(found_matches * 1000000) div true_matches"))
          .as("completeness_ppm"))
  }

  val e03Oracle: String =
    s"""WITH e AS (SELECT DISTINCT p_name, $blockKeySql AS blk,
       |    length(p_name) AS len
       |  FROM part),
       |n AS (SELECT COUNT(*) AS n_entities FROM e),
       |cand AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS cand_pairs
       |  FROM (SELECT blk, COUNT(*) AS c FROM e GROUP BY blk)),
       |trueM AS (SELECT COUNT(*) AS true_matches
       |  FROM e a JOIN e b
       |    ON b.len BETWEEN a.len - 2 AND a.len + 2 AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance),
       |found AS (SELECT COUNT(*) AS found_matches
       |  FROM e a JOIN e b ON a.blk = b.blk AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance)
       |SELECT n_entities,
       |  CAST(n_entities * (n_entities - 1) // 2 AS BIGINT) AS all_pairs,
       |  cand_pairs, true_matches, found_matches,
       |  CAST(((n_entities * (n_entities - 1) // 2 - cand_pairs) * 1000000)
       |    // (n_entities * (n_entities - 1) // 2) AS BIGINT) AS reduction_ppm,
       |  CASE WHEN true_matches = 0 THEN NULL
       |       ELSE CAST((found_matches * 1000000) // true_matches AS BIGINT)
       |  END AS completeness_ppm
       |FROM n, cand, trueM, found""".stripMargin

  /** Sorted-neighborhood window size — Hernández & Stolfo 1995's default
    * (w=10). On the combinatorial part-name vocabulary the nearest true
    * matches sit at rank gap 8 (the size of the last-word sub-block), so
    * w=10 is also the smallest window that catches any of them — the
    * window-size-vs-recall tradeoff the paper's multi-pass design exists
    * to soften.
    */
  val SnmWindow = 10

  /** e04 — SORTED-NEIGHBORHOOD candidate pairs (Hernández & Stolfo 1995,
    * the merge/purge method): the classic COMPLEMENT to e01's equality
    * blocking. Sort the distinct entity names once, slide a window of
    * [[SnmWindow]] over the sorted sequence, and compare only records
    * whose global ranks are within w−1 of each other — candidate work is
    * n·(w−1) by construction, independent of block-size skew (the failure
    * mode equality blocking has on hot keys). Because the sort key is the
    * whole name, SNM catches exactly the pairs head-noun blocking loses —
    * a typo in the LAST word breaks e01's block key but barely moves the
    * name in sort order — so the output carries `missed_by_blocking`
    * (head-noun keys differ), the evidence for running both indexes and
    * unioning candidates, which is how multi-pass merge/purge is deployed.
    *
    * Scale shape: the one fact-scale operation is the distinct-name
    * groupBy (shared with e01/e03). The global rank is NOT a
    * single-partition window: range-repartition by name, row_number
    * WITHIN each range partition, then add per-partition offsets computed
    * from the (≤ #partitions)-row count relation — one range exchange +
    * one broadcast of a partition-count map, the standard distributed
    * total-order index. RangePartitioner assigns ascending key ranges to
    * ascending partition ids, so local rank + offset is the exact global
    * rank. The window join is an equi-join on (rank + gap) with gap
    * exploded over 1..w−1 — e03's length-window recipe, never a range
    * cross join.
    */
  def e04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    snmPairs(Tables.part(s, dir).select($"p_name").distinct())
  }

  /** [[e04]]'s core over any single-column `p_name` relation of distinct
    * names (separated so the spec can pin the distributed global rank and
    * the window semantics on synthetic vocabularies).
    */
  def snmPairs(entities: DataFrame): DataFrame = {
    val s = entities.sparkSession
    import s.implicits._
    val ranked = graft.util.Eager.cached(
      Ranks.globalRank(entities, 8, $"p_name").select($"p_name", $"rnk"))
    val a = ranked.select($"p_name".as("a_name"), $"rnk")
    val b = ranked.select($"p_name".as("b_name"), $"rnk".as("rnk_b"))
    a.select($"a_name", $"rnk",
        explode(array((1 until SnmWindow).map($"rnk" + lit(_)): _*)).as("nb"))
      .join(b, $"nb" === $"rnk_b")
      .withColumn("dist", levenshtein($"a_name", $"b_name"))
      .filter($"dist".between(1, MaxEditDistance))
      .select($"a_name", $"b_name",
        ($"rnk_b" - $"rnk").as("rank_gap"), $"dist",
        (blockKey($"a_name") =!= blockKey($"b_name")).as("missed_by_blocking"))
      .orderBy($"a_name", $"b_name")
  }

  val e04Oracle: String =
    s"""WITH e AS (SELECT DISTINCT p_name FROM part),
       |r AS (SELECT p_name,
       |    CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS rnk
       |  FROM e)
       |SELECT a.p_name AS a_name, b.p_name AS b_name,
       |  b.rnk - a.rnk AS rank_gap,
       |  levenshtein(a.p_name, b.p_name) AS dist,
       |  regexp_extract(a.p_name, '[^ ]+$$')
       |    <> regexp_extract(b.p_name, '[^ ]+$$') AS missed_by_blocking
       |FROM r a JOIN r b
       |  ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + ${SnmWindow - 1}
       |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance
       |ORDER BY a_name, b_name""".stripMargin

  def all: Seq[Q] = Seq(
    Q("e01_fuzzy_entity_pairs", e01, Some(e01Oracle)),
    Q("e02_entity_clusters", e02, Some(e02Oracle)),
    Q("e03_blocking_quality", e03, Some(e03Oracle)),
    Q("e04_sorted_neighborhood", e04, Some(e04Oracle)),
  )
}
