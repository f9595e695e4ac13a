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
      .withColumn("blk", substring_index($"p_name", " ", -1))
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
       |    split_part(p_name, ' ', 2) AS blk
       |  FROM part GROUP BY p_name)
       |SELECT a.p_name AS a_name, b.p_name AS b_name,
       |  levenshtein(a.p_name, b.p_name) AS dist,
       |  a.n_parts AS n_a, b.n_parts AS n_b
       |FROM e a JOIN e b ON a.blk = b.blk AND a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEditDistance
       |ORDER BY a_name, b_name""".stripMargin

  def all: Seq[Q] = Seq(
    Q("e01_fuzzy_entity_pairs", e01, Some(e01Oracle)),
  )
}
