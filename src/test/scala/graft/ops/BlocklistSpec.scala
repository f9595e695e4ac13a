package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the Aho–Corasick automaton against a naive positional matcher on
  * the adversarial cases (overlapping self-matches, dictionary-suffix
  * chains, shared prefixes, matches at string edges) and the gate's
  * corpus semantics.
  */
class BlocklistSpec extends AnyFunSuite with SparkSpec {

  /** Naive every-position reference matcher (the oracle's shape in JVM). */
  private def naive(patterns: Seq[String], t: String): (Long, Long, Long) = {
    val hits = for {
      p <- patterns
      i <- 1 to (t.length - p.length + 1)
      if t.substring(i - 1, i - 1 + p.length) == p
    } yield (p, i.toLong)
    val first = if (hits.isEmpty) -1L else hits.map(_._2).min
    (hits.size.toLong, hits.map(_._1).distinct.size.toLong, first)
  }

  private def check(patterns: Seq[String], texts: Seq[String]): Unit = {
    val ac = new Blocklist.Automaton(patterns)
    for (t <- texts)
      assert(ac.scan(t) === naive(patterns, t), s"text '$t' patterns $patterns")
  }

  test("overlapping self-matches count every end position") {
    check(Seq("ana"), Seq("banana", "anana", "ana", "anaana", "an", ""))
    check(Seq("aa"), Seq("aaaa", "a", "aa", "baab"))
  }

  test("dictionary-suffix chains fire all entries at one position") {
    // "sort" is a suffix of "hash sort": reaching the long entry's end
    // state must also emit the short one through the output links
    check(Seq("hash sort", "sort"), Seq(
      "big hash sort fast", "sort hash sort", "hash sor", "hashsort"))
    check(Seq("abcde", "cde", "e"), Seq("abcde", "xcdex", "ee"))
  }

  test("shared prefixes diverge correctly") {
    check(Seq("sort", "sort fast"), Seq(
      "sort fast sort slow", "sort", "sort fas", "sorting fast"))
  }

  test("the gate blocklist on representative corpus text") {
    check(Blocklist.entries, Seq(
      "batch part spark line column order small sort a hash sort slow spark",
      "big hash sort fast value slow scan",
      "quantum flu",
      "nothing to see here"))
  }

  test("t22 gate invariants at sf0.001: flag agrees with counts, clean-path control") {
    val out = graft.SparkEntry.queries("t22_blocklist_scan")(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // flagged ⇔ n_matches > 0; first_pos sentinel agrees
    assert(out.forall(r => r.getBoolean(4) == (r.getLong(1) > 0)))
    assert(out.forall(r => (r.getLong(3) == -1L) == (r.getLong(1) == 0)))
    // n_entries never exceeds the list size or n_matches
    assert(out.forall(r => r.getLong(2) <= Blocklist.entries.size &&
      r.getLong(2) <= r.getLong(1)))
    // the never-matching control entry keeps n_entries under the max
    assert(out.forall(_.getLong(2) < Blocklist.entries.size))
  }
}
