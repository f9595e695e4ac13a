package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Exact-substring dedup via distributed suffix equality classes — the
  * corpus-level "remove any substring of ≥ L chars that appears twice"
  * operator of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better", the ExactSubstr dedup), which t14
  * (`TextAnalysis.scala`) only approximates as a per-16-gram signal.
  *
  * Mechanism — prefix doubling over shuffles: label(len) assigns every
  * (doc, pos) the equality class of the first `len` characters of its
  * suffix; label(2·len) is derived from the pair
  * (label(len)(pos), label(len)(pos+len)) in one round. The recurrence is
  * seeded directly at length min(target, 32) by grouping on the raw prefix
  * substring (see the seedLen note in [[suffixLabels]] for the byte math),
  * so the sa01 production target of 32 is the seed window alone and
  * label(64·2ᵏ) takes 1+k rounds. This is the
  * suffix-ARRAY construction recurrence (Manber–Myers prefix doubling)
  * with one deliberate Spark-first deviation: classes are canonicalized by
  * the MIN global position id of the class instead of a dense sorted rank.
  * Downstream only EQUALITY of classes is consumed (duplicated ⇔ class
  * size ≥ 2), so the total order a sorted rank would add is unused — and
  * dropping it removes the one non-scalable piece: a distributed
  * dense_rank needs a global range sort per round, while the min-id
  * canonicalization is a plain hash shuffle. Per round the work is
  * exactly two exchanges over the position relation (a lead() window
  * keyed by doc for the shifted label, a min() window keyed by the label
  * pair for the class id), each partition-parallel with no driver
  * participation; rounds are lineage-cut like the d06/pr01 loops. At
  * 100 TB the position relation is corpus-character-cardinality — big but
  * flat — and 5 bounded rounds of hash shuffles is the same envelope as
  * the CC/k-core loops.
  *
  * Suffixes shorter than the window pair with the −1 sentinel, which can
  * never equal a real class id (ids are positive), so truncated suffixes
  * form their own honest classes — the standard terminator argument.
  *
  * Gate semantics (sa01): positions whose full 32-char window appears at
  * ≥ 2 distinct (doc, pos) sites are "duplicated"; per document the
  * duplicated positions are merged into maximal covered intervals
  * (interval union of [pos, pos+31] — a break opens where the gap
  * exceeds 31), exactly the spans ExactSubstr dedup would cut. The
  * DuckDB oracle recomputes the same spans from first principles —
  * direct substr(t, p, 32) grouping, no labels — so the gate proves the
  * doubling recurrence equals 32-prefix equality on real data;
  * SuffixSpec pins the same equivalence structurally on fixtures.
  */
object Suffix {

  /** ExactSubstr window: a duplicated substring must span ≥ this many
    * characters to count (Lee et al. use 50 BPE tokens; 32 normalized
    * chars is the analogous cut for this corpus's ~5-char words).
    */
  val MinLen = 32

  /** Position-id packing bound: global id = doc_id · 2²⁰ + pos. Normalized
    * doc length must stay below it — asserted at plan build, and 2²⁰ chars
    * (1 MiB of text) is far above any document in the corpus families this
    * engine targets (chunking upstream is the documented recourse).
    */
  val MaxDocLen: Long = 1L << 20

  /** Equality-class labels for every suffix prefix of length
    * min(`target`, suffix length): (doc_id, pos, n, lab) for pos ∈ [1, n].
    * `target` must be a power of two.
    */
  def suffixLabels(docs: DataFrame, target: Int = MinLen): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(target > 0 && (target & (target - 1)) == 0, s"target $target not a power of 2")
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    // one row per character position; gid is the stable class-canonical id.
    // The document relation is repartitioned BEFORE the explode: a small
    // corpus arrives as one parquet split, and without the spread the
    // position explode (corpus-character fan-out) runs in a single task
    // (measured: 1.7 s single-task stage at sf0.1). The hash layout also
    // pre-satisfies every per-doc lead() window below.
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt
    // gid (the class-canonical id) is NOT carried as a column: it is a pure
    // function of (doc_id, pos), so each canonicalization recomputes it
    // inline instead of shuffling/checkpointing 8 extra bytes per position
    // through every round (guide §2.3 — narrower rows through the exchange)
    val gid = $"doc_id" * lit(MaxDocLen) + $"pos"
    val positions = docs
      .select($"doc_id", $"t", length($"t").cast("long").as("n"))
      .filter($"n" >= 1)
      // the packing must be collision-free or two different suffixes could
      // canonicalize to one id; cheap to assert inline, free to codegen
      .withColumn("n",
        when($"n" < lit(MaxDocLen), $"n")
          .otherwise(raise_error(concat(lit("doc too long for sa01: "), $"n"))))
      // explicit width: without it AQE coalesces the tiny pre-explode doc
      // relation back to one partition and the fan-out runs single-task
      .repartition(width, $"doc_id")
      .select($"doc_id", $"n", explode(expr("sequence(1L, n)")).as("pos"), $"t")
    // SEED DIRECTLY AT LENGTH min(target, 32) by grouping on the raw prefix
    // substring: label(L) only needs any equality-preserving key for the
    // first L characters, and substring equality (including its natural
    // length for suffixes shorter than L — the honest-class terminator
    // argument verbatim) IS that key. Seed-vs-doubling byte math (guide
    // §2.3/§1.2): the seed is ONE exchange shipping seedLen chars/row,
    // while each doubling round is TWO window exchanges (a lead() by doc
    // at ~32 B/row and a min() by (lab, labR) at ~40 B/row) plus a
    // checkpoint job — so seeding is strictly cheaper up to seedLen 32
    // (32 B once vs 72 B + a job per round replaced). Round 13 moved the
    // seed from 8 to 32: label(32) = the sa01 production path is now the
    // seed window alone (zero doubling rounds, 4 fewer exchanges over the
    // corpus-character position relation), label(64) takes 1 round, and
    // targets < 32 (spec fixtures) seed at min(target, 32) exactly as
    // before. Beyond 32 chars/row the doubling rounds win, which is why
    // the seed is capped there rather than at `target`.
    val seedLen = math.min(target, 32)
    var cur = positions
      .withColumn("lab",
        min(gid).over(Window.partitionBy(expr(s"substring(t, pos, $seedLen)"))))
      .drop("t")
      .localCheckpoint()
    var len = seedLen
    while (len < target) {
      // label(2·len)(p) ≔ min gid over the (label(len)(p), label(len)(p+len))
      // class; −1 sentinel for suffixes too short to have a right half
      cur = cur
        .withColumn("labR", lead($"lab", len, -1L).over(byDoc))
        .withColumn("lab", min(gid).over(Window.partitionBy($"lab", $"labR")))
        .drop("labR")
        .localCheckpoint()
      len *= 2
    }
    cur.select($"doc_id", $"pos", $"n", $"lab")
  }

  /** sa01 — per-document duplicated-substring spans at the [[MinLen]]
    * threshold: how many window positions are duplicated corpus-wide, how
    * many maximal spans they merge into, how many characters those spans
    * cover (what ExactSubstr dedup would remove), and the longest span.
    */
  def sa01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextAnalysis.normalize($"text").as("t"))
    val labs = suffixLabels(docs, MinLen)
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    // only positions with a FULL 32-char window participate: a shorter
    // suffix's class is the class of a shorter string, not of a
    // MinLen-char duplicated substring
    val dup = labs
      .filter($"pos" <= $"n" - (MinLen - 1))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"lab")))
      .filter($"cnt" >= 2)
    // interval union of [pos, pos+31]: a new span opens when the gap to
    // the previous duplicated position exceeds MinLen−1
    val spans = dup
      .withColumn("prev", lag($"pos", 1).over(byDoc))
      .withColumn("brk",
        when($"prev".isNull || $"pos" - $"prev" > (MinLen - 1), 1L).otherwise(0L))
      .withColumn("span_id", sum($"brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"span_id")
      .agg(min($"pos").as("a"), max($"pos").as("b"), count(lit(1)).as("npos"))
    spans.groupBy($"doc_id")
      .agg(
        sum($"npos").as("n_dup_pos"),
        count(lit(1)).as("n_spans"),
        sum($"b" - $"a" + MinLen).as("covered_chars"),
        max($"b" - $"a" + MinLen).as("max_span_chars"))
      .orderBy($"doc_id")
  }

  /** First-principles recompute: direct 32-gram grouping (no labels, no
    * doubling) + the same interval union — a genuinely different
    * formulation, so a hash match proves the doubling recurrence computes
    * 32-prefix equality on the real corpus.
    */
  val sa01Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(generate_series(1, length(t) - ${MinLen - 1})) AS p, t
       |  FROM d WHERE length(t) >= $MinLen),
       |g AS (SELECT doc_id, p, substr(t, p, $MinLen) AS gram FROM pos),
       |dup AS (
       |  SELECT doc_id, p FROM (
       |    SELECT doc_id, p, COUNT(*) OVER (PARTITION BY gram) AS c FROM g)
       |  WHERE c >= 2),
       |brk AS (
       |  SELECT doc_id, p,
       |    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
       |              > ${MinLen - 1}
       |         OR LAG(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
       |         THEN 1 ELSE 0 END AS b
       |  FROM dup),
       |isl AS (
       |  SELECT doc_id, p,
       |    SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
       |  FROM brk),
       |spans AS (
       |  SELECT doc_id, span_id, MIN(p) AS a, MAX(p) AS b, COUNT(*) AS npos
       |  FROM isl GROUP BY doc_id, span_id)
       |SELECT doc_id,
       |  CAST(SUM(npos) AS BIGINT) AS n_dup_pos,
       |  CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(SUM(b - a + $MinLen) AS BIGINT) AS covered_chars,
       |  CAST(MAX(b - a + $MinLen) AS BIGINT) AS max_span_chars
       |FROM spans GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("sa01_exact_substring_spans", sa01, Some(sa01Oracle)),
  )
}
