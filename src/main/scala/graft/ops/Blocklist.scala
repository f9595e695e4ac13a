package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Multi-phrase blocklist scanning — the C4 "bad words" filter stage
  * (Raffel et al. 2020 dropped any page containing an entry of the
  * "List of Dirty, Naughty, Obscene..." list; RefinedWeb and most crawl
  * pipelines run the same gate) — expressed the way it must run at
  * 100 TB: ONE Aho–Corasick automaton pass per document (Aho & Corasick
  * 1975), not |blocklist| separate contains() scans. The automaton is
  * blocklist-sized, built once and broadcast; the corpus flows through a
  * single narrow mapPartitions with no shuffle until the deterministic
  * output ordering.
  *
  * Matching semantics (documented contract):
  *  - over the t01-normalized text (trim, lower, whitespace collapse);
  *  - SUBSTRING occurrences — every end position counts, INCLUDING
  *    overlapping occurrences and entries ending at the same position
  *    through dictionary-suffix links (the classic AC correctness trap:
  *    text "big hash sort fast" matches `hash sort`, `sort` and
  *    `sort fast` — three different entries, two of them ending inside
  *    one another). C4's word-boundary refinement is one extra
  *    check-on-output away and deliberately out of scope here.
  *
  * Per doc: total occurrence count, distinct entries present, the first
  * (min) 1-based match START position (−1 when clean), and the flag the
  * curation gate consumes.
  *
  * Oracle: the naive quadratic form the automaton replaces — every
  * (doc, entry, position) substring probe in SQL, from the VALUES
  * rendering of the SAME [[entries]] value (the LangId seed-corpus
  * pattern) — so the hash match proves the automaton implements exactly
  * "count all end positions of every entry".
  */
object Blocklist {

  /** The embedded blocklist. Deliberate structure over the synthetic
    * corpus vocabulary: `sort` is a dictionary SUFFIX of `hash sort` and
    * a PREFIX of `sort fast` (exercises goto sharing AND suffix-link
    * outputs at one text position); `slow scan` matches in phrase form
    * only; `quantum flux` can never match (the clean-path control).
    */
  val entries: Seq[String] = Seq(
    "spark", "sort", "hash sort", "sort fast", "slow scan", "quantum flux",
  )

  /** Aho–Corasick automaton over [[entries]]: goto trie + BFS failure
    * links + dictionary-suffix output counts. Immutable arrays, ~|Σ·V|
    * small; serializable, so Spark's task broadcast ships it whole.
    */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    private val roots = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val out0 = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = roots(s).getOrElseUpdate(ch, {
          roots += scala.collection.mutable.Map.empty[Char, Int]
          out0 += Nil
          roots.size - 1
        })
      }
      out0(s) = pi :: out0(s)
    }
    private val n = roots.size
    val fail: Array[Int] = new Array[Int](n)
    /** patterns ending at this state, dictionary-suffix links flattened. */
    val outs: Array[Array[Int]] = new Array[Array[Int]](n)
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      outs(0) = out0(0).toArray
      roots(0).valuesIterator.foreach { c => fail(c) = 0; q += c }
      while (q.nonEmpty) {
        val s = q.dequeue()
        outs(s) = (out0(s) ++ outs(fail(s)).toList).toArray
        roots(s).foreach { case (ch, c) =>
          var f = fail(s)
          while (f != 0 && !roots(f).contains(ch)) f = fail(f)
          fail(c) = roots(f).get(ch).filter(_ != c).getOrElse(0)
          q += c
        }
      }
    }
    private val trans: Array[Map[Char, Int]] = roots.map(_.toMap).toArray
    private val patLen: Array[Int] = patterns.map(_.length).toArray

    /** Scan: (total occurrences, distinct patterns, min 1-based start). */
    def scan(text: String): (Long, Long, Long) = {
      var s = 0
      var total = 0L
      var firstPos = -1L
      val seen = new Array[Boolean](patLen.length)
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !trans(s).contains(ch)) s = fail(s)
        s = trans(s).getOrElse(ch, 0)
        val os = outs(s)
        var k = 0
        while (k < os.length) {
          val pi = os(k)
          total += 1
          seen(pi) = true
          val start = i + 2L - patLen(pi) // 1-based start of this match
          if (firstPos == -1L || start < firstPos) firstPos = start
          k += 1
        }
        i += 1
      }
      (total, seen.count(identity).toLong, firstPos)
    }
  }

  /** t22 — scan every document once; per-doc match audit. */
  def t22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ac = new Automaton(entries) // built once on the driver, task-broadcast
    // spread before the automaton pass (guide §2.5: single-split corpus ⇒
    // the whole scan ran one-task; identity at real split counts)
    graft.util.Spread.toWidth(
      Tables.documents(s, dir).select($"doc_id".cast("long"), $"text"),
      $"doc_id")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (total, distinct, first) = ac.scan(TextAnalysis.normalizeJvm(text))
        (id, total, distinct, first, total > 0)
      })
      .toDF("doc_id", "n_matches", "n_entries", "first_pos", "flagged")
      .orderBy($"doc_id")
  }

  /** The naive (doc × entry × position) probe the automaton replaces. */
  val t22Oracle: String = {
    val values = entries.map(e => s"('$e')").mkString(", ")
    s"""WITH bl(entry) AS (VALUES $values),
       |d AS (SELECT doc_id,
       |        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |      FROM documents),
       |x AS (SELECT d.doc_id, b.entry, d.t FROM d CROSS JOIN bl b),
       |pos AS (SELECT doc_id, entry, t,
       |    unnest(generate_series(1, len(t) - len(entry) + 1)) AS i FROM x),
       |probe AS (
       |  SELECT doc_id, entry, i FROM pos
       |  WHERE substr(t, i, len(entry)) = entry),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       |    CAST(COUNT(DISTINCT entry) AS BIGINT) AS n_entries,
       |    CAST(MIN(i) AS BIGINT) AS first_pos
       |  FROM probe GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_matches, 0) AS n_matches,
       |  COALESCE(a.n_entries, 0) AS n_entries,
       |  COALESCE(a.first_pos, -1) AS first_pos,
       |  COALESCE(a.n_matches, 0) > 0 AS flagged
       |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("t22_blocklist_scan", t22, Some(t22Oracle)),
  )
}
