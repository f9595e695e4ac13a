package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Lexical retrieval over the documents corpus (SURVEY.md §2 "similarity
  * search" family, lexical complement to the embedding-based s01–s10): the
  * query side of a RAG / training-data pipeline needs term search next to
  * ANN — BM25 ranking (Robertson-Spärck Jones), exact phrase matching, and
  * reciprocal-rank fusion of the two lists (Cormack 2009) for hybrid
  * retrieval.
  *
  * Determinism contract (repo-wide, SURVEY.md §5.1): no `ln` anywhere — the
  * BM25 idf is kept in its rational form `(N − df + 0.5)/(df + 0.5)`
  * (monotone in the usual log idf, so rankings are unchanged), every
  * floating expression is written with explicit parentheses and evaluated
  * in the SAME order on the DuckDB side, and per-term contributions are
  * floored to integer ppm BEFORE the per-document sum, so aggregation is
  * exact integer arithmetic — order-free, hash-stable across engines.
  *
  * Scale shape: the corpus is scanned once into a term-keyed posting
  * relation (the same one inverted-index shuffle t08 pays); the query set
  * is a literal broadcast; per-term work is bounded by posting-list length
  * and the per-query top-k window is rewritten to a bounded heap by the
  * session's WindowTopKToHeap rule. Nothing corpus-sized crosses a second
  * exchange.
  */
object Retrieval {

  /** BM25 constants (k1 = 1.2, b = 0.75 — the standard Robertson settings).
    * Written as the exact literals 2.2 / 1.2 / 0.25 / 0.75 in BOTH engines
    * so the binary64 values agree.
    */
  private val TopK = 5

  /** The benchmark query set: literal, so the query side is a broadcast in
    * every plan. Terms drawn from the synthetic corpus vocabulary.
    */
  private val queryTerms: Seq[(Int, String)] = Seq(
    1 -> "hash", 1 -> "join",
    2 -> "window", 2 -> "scan", 2 -> "filter",
    3 -> "stream", 3 -> "batch")

  private val queryPhrases: Seq[(Int, String)] = Seq(
    1 -> "hash join", 2 -> "window scan", 3 -> "stream batch")

  /** doc_id → term posting rows (one corpus scan, same normalize as t07). */
  private def words(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread before the posting explode (guide §2.5): single-split corpus
    // ⇒ tokenization + map-side partial aggs ran one-task (identity at
    // real split counts)
    graft.util.Spread.toWidth(
      Tables.documents(s, dir).select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id",
        explode(split(TextAnalysis.normalize($"text"), " ")).as("term"))
      .filter($"term" =!= "")
  }

  /** ir01 — BM25 top-k per query, integer-exact ppm scoring.
    *
    * One corpus scan → (doc_id, term) postings → a single term-keyed agg
    * producing tf / df / doc length; query terms broadcast-join the
    * postings; contributions floor to ppm and SUM exactly; top-5 per query
    * by (score desc, doc_id) through a row_number window (rewritten to a
    * heap by WindowTopKToHeap).
    */
  def ir01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = words(s, dir)
    val tf = w.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dlen = w.groupBy($"doc_id").agg(count(lit(1)).as("dlen"))
    // corpus stats ride ONE broadcast row: n_docs + avgdl (exact ints until
    // the single division)
    val stats = w.agg(
      countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("total_len"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val q = queryTerms.toDF("query_id", "qterm")
    val joined = broadcast(q)
      .join(tf, $"qterm" === tf("term"))
      .join(dlen, "doc_id")
      .join(broadcast(df_.withColumnRenamed("term", "dterm")),
        $"qterm" === $"dterm")
      .crossJoin(broadcast(stats))
    // every float op explicitly parenthesized; mirrored 1:1 in the oracle
    val avgdl = $"total_len".cast("double") / $"n_docs".cast("double")
    val idfR = (($"n_docs" - $"df").cast("double") + lit(0.5)) /
      ($"df".cast("double") + lit(0.5))
    val norm = ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") +
        (lit(1.2) * (lit(0.25) + (lit(0.75) * ($"dlen".cast("double") / avgdl)))))
    val scored = joined
      .select($"query_id", $"doc_id",
        floor((idfR * norm) * lit(1000000.0)).cast("long").as("contrib_ppm"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"contrib_ppm").as("score_ppm"), count(lit(1)).as("n_terms"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy($"score_ppm".desc, $"doc_id")))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"doc_id", $"score_ppm", $"n_terms")
      .orderBy($"query_id", $"rank")
  }

  val ir01Oracle: String =
    """WITH w AS (SELECT doc_id,
      |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
      |  FROM documents),
      |w2 AS (SELECT * FROM w WHERE term <> ''),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY 1, 2),
      |dlen AS (SELECT doc_id, COUNT(*) AS dlen FROM w2 GROUP BY 1),
      |stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS total_len FROM w2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |q(query_id, qterm) AS (VALUES (1,'hash'),(1,'join'),(2,'window'),(2,'scan'),
      |                             (2,'filter'),(3,'stream'),(3,'batch')),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    CAST(floor((
      |      ((CAST(stats.n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
      |      * ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |         (CAST(tf.tf AS DOUBLE) +
      |          (1.2 * (0.25 + (0.75 * (CAST(dlen.dlen AS DOUBLE)
      |                                  / (CAST(stats.total_len AS DOUBLE)
      |                                     / CAST(stats.n_docs AS DOUBLE))))))))
      |    ) * 1000000.0) AS BIGINT) AS contrib_ppm
      |  FROM q JOIN tf ON q.qterm = tf.term
      |         JOIN dlen ON tf.doc_id = dlen.doc_id
      |         JOIN df ON q.qterm = df.term
      |         CROSS JOIN stats),
      |agg AS (SELECT query_id, doc_id,
      |               CAST(SUM(contrib_ppm) AS BIGINT) AS score_ppm,
      |               COUNT(*) AS n_terms
      |        FROM scored GROUP BY 1, 2),
      |ranked AS (SELECT query_id, doc_id, score_ppm, n_terms,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY score_ppm DESC, doc_id) AS rank
      |  FROM agg)
      |SELECT query_id, rank, doc_id, score_ppm, n_terms
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ir02 — exact phrase retrieval: adjacent-bigram match counts per
    * document, top-k per phrase query. Pure integer arithmetic (counts),
    * so the gate is trivially hash-stable. One corpus scan builds the
    * positional bigram relation (the t07 shape keyed by doc); phrases
    * broadcast-join it.
    */
  def ir02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigrams = Tables.documents(s, dir)
      .select($"doc_id",
        split(TextAnalysis.normalize($"text"), " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(
        zip_with($"ws", slice($"ws", lit(2), size($"ws") - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
      // zip_with pads the shorter side with null → drop the tail artifact
      .filter(!$"bigram".endsWith(" ") && $"bigram".contains(" "))
    val q = queryPhrases.toDF("query_id", "phrase")
    broadcast(q)
      .join(bigrams, $"phrase" === $"bigram")
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"n_hits".desc, $"doc_id")))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"doc_id", $"n_hits")
      .orderBy($"query_id", $"rank")
  }

  val ir02Oracle: String =
    """WITH d AS (SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |b AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM d WHERE len(ws) >= 2),
      |q(query_id, phrase) AS (VALUES (1,'hash join'),(2,'window scan'),(3,'stream batch')),
      |hits AS (SELECT q.query_id, b.doc_id, COUNT(*) AS n_hits
      |         FROM q JOIN b ON q.phrase = b.bigram GROUP BY 1, 2),
      |ranked AS (SELECT query_id, doc_id, n_hits,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY n_hits DESC, doc_id) AS rank
      |  FROM hits)
      |SELECT query_id, rank, doc_id, n_hits
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ir03 — reciprocal-rank fusion of the BM25 and phrase lists (Cormack
    * 2009: `Σ 1/(60 + rank)`): the standard hybrid-retrieval merge. Each
    * side contributes exactly one IEEE division and the fusion is ONE
    * addition of two doubles (coalesced to 0 for a single-list doc), so the
    * result is bit-stable without any integerization. Ranks come from the
    * FULL per-query orderings (fusion needs ranks beyond each list's
    * top-k); candidates stay bounded by matched-document counts.
    */
  def ir03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"query_id")
    val bm25 = {
      val full = ir01Full(s, dir)
      full.withColumn("r_bm25", row_number().over(
        w.orderBy($"score_ppm".desc, $"doc_id")))
        .select($"query_id", $"doc_id", $"r_bm25")
    }
    val phrase = {
      val bigrams = Tables.documents(s, dir)
        .select($"doc_id",
          split(TextAnalysis.normalize($"text"), " ").as("ws"))
        .filter(size($"ws") >= 2)
        .select($"doc_id", explode(
          zip_with($"ws", slice($"ws", lit(2), size($"ws") - 1),
            (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .filter(!$"bigram".endsWith(" ") && $"bigram".contains(" "))
      val q = queryPhrases.toDF("query_id", "phrase")
      broadcast(q)
        .join(bigrams, $"phrase" === $"bigram")
        .groupBy($"query_id", $"doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("r_phrase", row_number().over(
          w.orderBy($"n_hits".desc, $"doc_id")))
        .select($"query_id", $"doc_id", $"r_phrase")
    }
    bm25.join(phrase, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id",
        (coalesce(lit(1.0) / (lit(60.0) + $"r_bm25".cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + $"r_phrase".cast("double")), lit(0.0)))
          .as("rrf"))
      .withColumn("rank", row_number().over(
        w.orderBy($"rrf".desc, $"doc_id")))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank", $"doc_id", $"rrf")
      .orderBy($"query_id", $"rank")
  }

  /** The un-truncated BM25 scoring relation ir01 ranks (shared by ir03). */
  private def ir01Full(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = words(s, dir)
    val tf = w.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dlen = w.groupBy($"doc_id").agg(count(lit(1)).as("dlen"))
    val stats = w.agg(
      countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("total_len"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val q = queryTerms.toDF("query_id", "qterm")
    val joined = broadcast(q)
      .join(tf, $"qterm" === tf("term"))
      .join(dlen, "doc_id")
      .join(broadcast(df_.withColumnRenamed("term", "dterm")),
        $"qterm" === $"dterm")
      .crossJoin(broadcast(stats))
    val avgdl = $"total_len".cast("double") / $"n_docs".cast("double")
    val idfR = (($"n_docs" - $"df").cast("double") + lit(0.5)) /
      ($"df".cast("double") + lit(0.5))
    val norm = ($"tf".cast("double") * lit(2.2)) /
      ($"tf".cast("double") +
        (lit(1.2) * (lit(0.25) + (lit(0.75) * ($"dlen".cast("double") / avgdl)))))
    joined
      .select($"query_id", $"doc_id",
        floor((idfR * norm) * lit(1000000.0)).cast("long").as("contrib_ppm"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"contrib_ppm").as("score_ppm"))
  }

  val ir03Oracle: String =
    """WITH w AS (SELECT doc_id,
      |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
      |  FROM documents),
      |w2 AS (SELECT * FROM w WHERE term <> ''),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY 1, 2),
      |dlen AS (SELECT doc_id, COUNT(*) AS dlen FROM w2 GROUP BY 1),
      |stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS total_len FROM w2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |q(query_id, qterm) AS (VALUES (1,'hash'),(1,'join'),(2,'window'),(2,'scan'),
      |                             (2,'filter'),(3,'stream'),(3,'batch')),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    CAST(floor((
      |      ((CAST(stats.n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
      |      * ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |         (CAST(tf.tf AS DOUBLE) +
      |          (1.2 * (0.25 + (0.75 * (CAST(dlen.dlen AS DOUBLE)
      |                                  / (CAST(stats.total_len AS DOUBLE)
      |                                     / CAST(stats.n_docs AS DOUBLE))))))))
      |    ) * 1000000.0) AS BIGINT) AS contrib_ppm
      |  FROM q JOIN tf ON q.qterm = tf.term
      |         JOIN dlen ON tf.doc_id = dlen.doc_id
      |         JOIN df ON q.qterm = df.term
      |         CROSS JOIN stats),
      |bm AS (SELECT query_id, doc_id, SUM(contrib_ppm) AS score_ppm
      |       FROM scored GROUP BY 1, 2),
      |bmr AS (SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY score_ppm DESC, doc_id) AS r_bm25
      |  FROM bm),
      |d AS (SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |b AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM d WHERE len(ws) >= 2),
      |qp(query_id, phrase) AS (VALUES (1,'hash join'),(2,'window scan'),(3,'stream batch')),
      |ph AS (SELECT qp.query_id, b.doc_id, COUNT(*) AS n_hits
      |       FROM qp JOIN b ON qp.phrase = b.bigram GROUP BY 1, 2),
      |phr AS (SELECT query_id, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY n_hits DESC, doc_id) AS r_phrase
      |  FROM ph),
      |fused AS (SELECT COALESCE(bmr.query_id, phr.query_id) AS query_id,
      |    COALESCE(bmr.doc_id, phr.doc_id) AS doc_id,
      |    (COALESCE(1.0 / (60.0 + CAST(bmr.r_bm25 AS DOUBLE)), 0.0)
      |     + COALESCE(1.0 / (60.0 + CAST(phr.r_phrase AS DOUBLE)), 0.0)) AS rrf
      |  FROM bmr FULL OUTER JOIN phr
      |    ON bmr.query_id = phr.query_id AND bmr.doc_id = phr.doc_id),
      |ranked AS (SELECT query_id, doc_id, rrf,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY rrf DESC, doc_id) AS rank
      |  FROM fused)
      |SELECT query_id, rank, doc_id, rrf
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ir01_bm25_topk", ir01, Some(ir01Oracle)),
    Q("ir02_phrase_match", ir02, Some(ir02Oracle)),
    Q("ir03_rrf_fusion", ir03, Some(ir03Oracle)),
  )
}
