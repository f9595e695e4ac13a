package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Structural + semantic checks for the lexical-retrieval family (ir01
  * BM25, ir02 phrase match, ir03 RRF fusion). Value-level equality with
  * DuckDB is the driver gate's job; these tests pin the retrieval-theoretic
  * properties a hash compare can't explain when it breaks.
  */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  private val dir = sfSmoke

  test("ir01: top-k per query, ranks dense from 1, scores non-increasing") {
    val rows = Retrieval.ir01(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getInt(0))
    assert(byQuery.keySet == Set(1, 2, 3))
    byQuery.foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q returned ${rs.length} > k")
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to rs.length), s"query $q ranks not dense: $ranks")
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
      assert(scores == scores.sortBy(-_), s"query $q scores not sorted: $scores")
    }
  }

  test("ir01: a document matching more query terms outranks ties by coverage") {
    // every returned doc matched at least one term; n_terms never exceeds
    // the query's own term count
    val termCount = Map(1 -> 2, 2 -> 3, 3 -> 2)
    Retrieval.ir01(spark, dir).collect().foreach { r =>
      val (q, n) = (r.getInt(0), r.getLong(4))
      assert(n >= 1 && n <= termCount(q), s"query $q n_terms $n out of range")
    }
  }

  test("ir02: phrase hits are a subset of docs containing both unigrams") {
    import org.apache.spark.sql.functions._
    val hits = Retrieval.ir02(spark, dir).collect()
    assert(hits.nonEmpty) // the corpus vocabulary makes adjacency likely
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val phrase = Map(1 -> "hash join", 2 -> "window scan", 3 -> "stream batch")
    hits.foreach { r =>
      val (q, d) = (r.getInt(0), r.getLong(2))
      assert(docs(d).contains(phrase(q)),
        s"doc $d ranked for query $q but does not contain '${phrase(q)}'")
    }
  }

  test("ir03: fused list only contains docs from at least one source list") {
    val fused = Retrieval.ir03(spark, dir).collect()
    assert(fused.nonEmpty)
    // RRF score bounded by the two-list maximum 2/(60+1)
    fused.foreach { r =>
      val s = r.getDouble(3)
      assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-12, s"rrf $s out of range")
    }
    // rank-1 fusion scores dominate within each query
    fused.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores == scores.sortBy(-_))
    }
  }

  test("ir01 plan: query set is broadcast; corpus flows through hash joins only") {
    val p = Retrieval.ir01(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast query side:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in ir01:\n$p")
  }
}
