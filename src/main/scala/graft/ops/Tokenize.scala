package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q
import graft.util.Eager

/** Tokenizer APPLICATION and LM-based quality scoring — the two stages a
  * training-data pipeline runs after t16 learns a vocabulary and before
  * t12 packs sequences:
  *
  *  - t18 encodes the corpus with the learned BPE merges (Sennrich et al.
  *    2016 §2's apply step) and reports per-document token/compression
  *    stats — the token-count accounting every data budget (q49) and
  *    packing plan (t12) is denominated in.
  *  - t19 scores every document against a corpus bigram language model and
  *    buckets the corpus into head/middle/tail terciles — the CCNet
  *    (Wenzek et al. 2020) perplexity-filtering shape, here with an
  *    integer-exact surprisal so both engines agree bit-for-bit.
  *
  * The reference has no tokenizer surface (its texts go straight to SQL
  * aggregation); these extend the beyond-reference LLM-pipeline family.
  */
object Tokenize {

  import TextAnalysis.{BpeSep, bpeMerges, normalize}

  // ---------------------------------------------------------------------
  // t18 — BPE tokenizer application (encode with t16's learned merges)
  // ---------------------------------------------------------------------

  /** t18 — BPE ENCODING: apply the 5 merge rules t16 learns to every
    * document and account the result — per doc: word count, base symbol
    * count (characters), post-merge token count, and tokens-per-million-
    * base-symbols (the compression ratio a tokenizer is judged by).
    *
    * Scale shape — the word-frequency trick again, now on the apply side:
    * merges are learned once (vocabulary-sized rounds, see [[TextAnalysis.bpeMerges]]),
    * the ≤5 learned rules are a bounded driver collect (t16's argmax
    * posture), and ENCODING runs over the DISTINCT-word vocabulary — each
    * word is encoded exactly once however often it occurs, as a chain of 5
    * literal `replace`s on the terminator-delimited form (non-overlapping
    * by construction, see t16's scaladoc). Documents then join the encoded
    * vocabulary on the word key (vocabulary-cardinality hash join — the
    * zipf-bounded side; AQE broadcasts it when small) and aggregate
    * per doc. Tokenizing 100 TB is therefore: one vocab build + one
    * vocab-sized encode + one word-keyed join — the raw token stream is
    * never re-scanned per merge rule.
    *
    * Oracle: the t16 merge chain extended with the apply step (v5) and the
    * same word-keyed join, all integer arithmetic, hash-matched.
    */
  def t18(s: SparkSession, dir: String): DataFrame =
    bpeEncode(s, Tables.documents(s, dir), rounds = 5)

  /** The encode core of [[t18]], parameterized for the spec's toy corpora. */
  def bpeEncode(s: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
    import s.implicits._
    // ≤ `rounds` learned rules — the only driver touch, bounded by design
    val merges = bpeMerges(s, docs, rounds).collect()

    val dw = docs // NO Spread (measured: t18 +1.27 s with it — see bpeMerges)
      .select($"doc_id", explode(split(normalize($"text"), " ")).as("word"))
      .filter($"word" =!= "" && !$"word".contains(BpeSep))

    val base = concat(
      concat_ws(BpeSep, regexp_extract_all($"word", lit("."), lit(0))),
      lit(BpeSep))
    val encoded = merges.foldLeft(base) { (w, m) =>
      val (l, r) = (m.getString(1), m.getString(2))
      replace(w, lit(l + BpeSep + r + BpeSep), lit(l + r + BpeSep))
    }
    def symCount(w: org.apache.spark.sql.Column) =
      size(filter(split(w, BpeSep), x => x =!= "")).cast("long")
    // encode each distinct word ONCE (vocabulary-sized, zipf-bounded)
    val vt = Eager.cached(dw.select($"word").distinct()
      .select($"word", symCount(base).as("blen"), symCount(encoded).as("tlen")))

    dw.join(vt, "word")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum($"blen").as("n_base_symbols"),
        sum($"tlen").as("n_tokens"))
      .select($"doc_id", $"n_words", $"n_base_symbols", $"n_tokens",
        expr("n_tokens * 1000000 div n_base_symbols").as("tokens_ppm"))
      .orderBy($"doc_id")
  }

  val t18Oracle: String = {
    // the t16 chain (same pair-stats/argmax/merge rounds), keeping the raw
    // word as the join key and applying the 5th merge too (v5 = the
    // encoded vocabulary); see TextAnalysis.t16Oracle for the learn side
    def pairsOf(v: String, p: String) =
      s"""$p AS (
         |  SELECT sy[i] AS l, sy[i+1] AS r, SUM(freq) AS cnt
         |  FROM (SELECT sy, freq, unnest(range(1, len(sy))) AS i
         |        FROM (SELECT list_filter(string_split(w, chr(1)), x -> x <> '') AS sy, freq FROM $v))
         |  GROUP BY l, r)""".stripMargin
    def bestOf(p: String, b: String) =
      s"$b AS (SELECT l, r, cnt FROM $p ORDER BY cnt DESC, l, r LIMIT 1)"
    def mergeOf(v: String, b: String, v2: String) =
      s"$v2 AS (SELECT word, replace(w, l||chr(1)||r||chr(1), l||r||chr(1)) AS w, freq FROM $v, $b)"
    val chain = (1 to 5).map { k =>
      Seq(pairsOf(s"v${k - 1}", s"p$k"), bestOf(s"p$k", s"b$k"),
        mergeOf(s"v${k - 1}", s"b$k", s"v$k")).mkString(",\n")
    }.mkString(",\n")
    s"""WITH v0 AS (
       |  SELECT word,
       |    array_to_string(regexp_extract_all(word, '.'), chr(1)) || chr(1) AS w,
       |    COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' AND NOT contains(word, chr(1)) GROUP BY word),
       |$chain,
       |vt AS (
       |  SELECT v5.word,
       |    len(list_filter(string_split(v0.w, chr(1)), x -> x <> '')) AS blen,
       |    len(list_filter(string_split(v5.w, chr(1)), x -> x <> '')) AS tlen
       |  FROM v5 JOIN v0 USING (word)),
       |dw AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |    FROM documents)
       |  WHERE word <> '' AND NOT contains(word, chr(1)))
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(blen) AS BIGINT) AS n_base_symbols,
       |  CAST(SUM(tlen) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(tlen) AS BIGINT) * 1000000 // CAST(SUM(blen) AS BIGINT) AS BIGINT) AS tokens_ppm
       |FROM dw JOIN vt USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // t19 — LM-surprisal quality buckets (CCNet-style perplexity filtering)
  // ---------------------------------------------------------------------

  /** t19 — LM QUALITY BUCKETS: score every document by its mean bigram
    * surprisal under a corpus bigram model and split the corpus into
    * head / middle / tail terciles — CCNet's (Wenzek et al. 2020)
    * perplexity-filtering stage, the standard LM-based quality gate
    * (heuristic rules are t02/t11; this is their model-based sibling).
    *
    * Integer-exact surprisal: for a bigram (l,r), the model probability is
    * cnt(l,r) / cnt(l·), and the surprisal in WHOLE BITS is
    * floor(log2(cnt(l·)/cnt(l,r))) — computed with no floating point as
    * `length(bin(pc div bc)) - 1`, exact in both engines because for
    * integers a ≥ b ≥ 1 and k ≥ 0: a/b ≥ 2^k  ⟺  a div b ≥ 2^k (b·2^k is
    * an integer), so the floor-log2 of the rational and of the integer
    * quotient agree. Whole-bit granularity per bigram position, summed over
    * ~hundreds of positions per doc, ranks documents the way CCNet's
    * coarse head/middle/tail cut consumes scores. Per-doc score =
    * total_bits·1000 div n_bigrams (milli-bits per bigram).
    *
    * Scale shape: the bigram model is one (l,r)-keyed partial-agg shuffle
    * (vocabulary²-bounded, zipf-concentrated — it never broadcasts);
    * scoring joins the doc bigram stream against the model on (l,r) —
    * every probe hits because the model is trained on the same corpus
    * (in-domain scoring; CCNet's out-of-domain wiki model is the same
    * plan with a different training input). Tercile cuts come from a
    * cumulative HISTOGRAM of the integer scores — ≤ 63000 distinct
    * milli-bit values by arithmetic (≤ 63 bits/bigram × 1000), so the
    * cut-finding window runs on a provably bounded relation (tc01's
    * decile-histogram recipe), never a global sort of the corpus. The
    * 1-row threshold relation broadcasts back over the scored docs.
    * Docs with < 2 tokens have no bigrams and are excluded (a length
    * gate, t02's job, should have dropped them).
    *
    * Oracle: the same model, bit arithmetic, histogram and cuts in SQL,
    * hash-matched.
    */
  def t19(s: SparkSession, dir: String): DataFrame =
    lmQualityBuckets(Tables.documents(s, dir))

  /** The scoring core of [[t19]], unit-testable on toy corpora. */
  def lmQualityBuckets(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // NO Spread on the bigram build (measured, round 13: t19 +0.72 s with
    // it — the explode is cheap next to the text exchange + the 32-wide
    // cache it buys; the md5-heavy passes keep theirs)
    val toks = docs
      .select($"doc_id",
        filter(split(normalize($"text"), " "), x => x =!= "").as("sy"))
      .filter(size($"sy") >= 2)
    val bi = Eager.cached(toks
      .select($"doc_id", explode(sequence(lit(1), size($"sy") - 1)).as("i"), $"sy")
      .select($"doc_id",
        element_at($"sy", $"i").as("l"),
        element_at($"sy", $"i" + 1).as("r")))

    // bigram model + whole-bit surprisal per distinct bigram
    val bc = bi.groupBy($"l", $"r").agg(count(lit(1)).as("bc"))
    val pc = bc.groupBy($"l").agg(sum($"bc").as("pc"))
    val bits = bc.join(pc, "l")
      .select($"l", $"r",
        (length(bin(expr("pc div bc"))) - 1).cast("long").as("bits"))

    val scored = Eager.cached(bi.join(bits, Seq("l", "r"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"bits").as("total_bits"))
      .select($"doc_id", $"n_bigrams", $"total_bits",
        expr("total_bits * 1000 div n_bigrams").as("millibits")))

    // tercile cuts over the bounded score histogram (≤ 63000 rows by
    // arithmetic): t1/t2 = smallest scores covering ceil(n/3), ceil(2n/3)
    val hist = Eager.cached(
      scored.groupBy($"millibits").agg(count(lit(1)).as("nd")))
    val w = Window.orderBy($"millibits")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .select($"millibits", sum($"nd").over(w).as("cum"))
      .crossJoin(broadcast(hist.agg(sum($"nd").as("n"))))
    val th = broadcast(
      cum.filter($"cum" >= expr("(n + 2) div 3")).agg(min($"millibits").as("t1"))
        .crossJoin(
          cum.filter($"cum" >= expr("(2 * n + 2) div 3")).agg(min($"millibits").as("t2"))))

    scored.crossJoin(th)
      .select($"doc_id", $"n_bigrams", $"total_bits", $"millibits",
        when($"millibits" <= $"t1", "head")
          .when($"millibits" <= $"t2", "middle")
          .otherwise("tail").as("bucket"))
      .orderBy($"doc_id")
  }

  val t19Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      x -> x <> '') AS sy
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, sy[i] AS l, sy[i+1] AS r
      |  FROM (SELECT doc_id, sy, unnest(range(1, len(sy))) AS i
      |        FROM toks WHERE len(sy) >= 2)),
      |bc AS (SELECT l, r, CAST(COUNT(*) AS BIGINT) AS bc FROM bi GROUP BY l, r),
      |pcs AS (SELECT l, CAST(SUM(bc) AS BIGINT) AS pc FROM bc GROUP BY l),
      |bits AS (
      |  SELECT bc.l, bc.r, CAST(length(bin(pc // bc)) - 1 AS BIGINT) AS bits
      |  FROM bc JOIN pcs ON bc.l = pcs.l),
      |scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(bits) AS BIGINT) AS total_bits,
      |    CAST(SUM(bits) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT) AS millibits
      |  FROM bi JOIN bits ON bi.l = bits.l AND bi.r = bits.r
      |  GROUP BY doc_id),
      |hist AS (SELECT millibits, CAST(COUNT(*) AS BIGINT) AS nd FROM scored GROUP BY millibits),
      |cum AS (SELECT millibits, SUM(nd) OVER (ORDER BY millibits) AS cum FROM hist),
      |tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM hist),
      |th AS (SELECT
      |  (SELECT MIN(millibits) FROM cum, tot WHERE cum >= (n + 2) // 3) AS t1,
      |  (SELECT MIN(millibits) FROM cum, tot WHERE cum >= (2 * n + 2) // 3) AS t2)
      |SELECT doc_id, n_bigrams, total_bits, CAST(millibits AS BIGINT) AS millibits,
      |  CASE WHEN millibits <= t1 THEN 'head'
      |       WHEN millibits <= t2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM scored, th ORDER BY doc_id""".stripMargin

  /** c09 — FILTER-AGREEMENT AUDIT (Cohen 1960's kappa over two quality
    * raters): every serious curation pipeline runs BOTH a heuristic gate
    * (t02's length/digit rules) and a model-based gate (t19's LM
    * surprisal terciles); this op measures whether they agree beyond
    * chance. Rater H passes a doc iff it has ≥ 20 words and ≤ 20% digit
    * characters (integer form 5·digits ≤ chars — no float ratio); rater
    * M passes iff the t19 bucket is head or middle (docs too short to
    * have bigrams fail M by definition). Output: one row with the 2×2
    * confusion, observed/chance agreement and kappa, all in ppm over
    * exact BIGINTs — kappa near 0 means the expensive LM gate is adding
    * nothing over chance given the marginals; kappa near 1 means it is
    * redundant with the cheap rules; the useful regime in between is
    * what this row quantifies release over release.
    *
    * Integer-exactness: po·N = n11+n00 and pe·N² = a1·b1 + a0·b0, so
    * kappa = (N·(n11+n00) − (a1·b1+a0·b0)) / (N² − (a1·b1+a0·b0)) is a
    * ratio of exact BIGINTs, published in ppm with explicit sign
    * handling (Spark `div` truncates toward zero, DuckDB `//` floors —
    * they agree only on non-negatives, so the sign is factored out).
    *
    * Scale shape: rater H is per-row scalar math on the corpus scan;
    * rater M reuses [[lmQualityBuckets]] (its shuffles are the t19
    * plan); the confusion matrix is ONE conditional aggregate over the
    * doc_id-keyed left join of the two verdict relations. Nothing
    * beyond t19's own exchanges plus one join at corpus grain.
    */
  def c09(s: SparkSession, dir: String): DataFrame =
    filterAgreement(Tables.documents(s, dir))

  /** The [[c09]] audit over any (doc_id, text) relation — unit-testable on
    * toy corpora with hand-derivable verdicts.
    */
  def filterAgreement(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val chars = length($"text")
    val words = size(filter(split($"text", " "), x => x =!= ""))
    val digits = chars - length(regexp_replace($"text", "[0-9]", ""))
    val heur = docs.select(
      $"doc_id",
      (words >= 20 && digits * 5 <= chars).as("pass_h"))
    val lm = lmQualityBuckets(docs)
      .select($"doc_id", ($"bucket" =!= "tail").as("pass_m0"))
    val joined = heur.join(lm, Seq("doc_id"), "left")
      .select($"pass_h", coalesce($"pass_m0", lit(false)).as("pass_m"))
    joined.agg(
        count(lit(1)).as("n_docs"),
        count(when($"pass_h" && $"pass_m", 1)).as("n11"),
        count(when($"pass_h" && !$"pass_m", 1)).as("n10"),
        count(when(!$"pass_h" && $"pass_m", 1)).as("n01"),
        count(when(!$"pass_h" && !$"pass_m", 1)).as("n00"))
      .select($"*",
        expr("((n11 + n00) * 1000000) div n_docs").as("po_ppm"),
        expr("(((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) * 1000000) div (n_docs * n_docs)")
          .as("pe_ppm"))
      .select($"*",
        expr("""CASE WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
                     THEN NULL
                     WHEN n_docs * (n11 + n00) >= (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
                     THEN ((n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))) * 1000000)
                          div (n_docs * n_docs - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)))
                     ELSE -((((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10) - n_docs * (n11 + n00)) * 1000000)
                          div (n_docs * n_docs - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))))
                END""").as("kappa_ppm"))
  }

  val c09Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      x -> x <> '') AS sy
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, sy[i] AS l, sy[i+1] AS r
      |  FROM (SELECT doc_id, sy, unnest(range(1, len(sy))) AS i
      |        FROM toks WHERE len(sy) >= 2)),
      |bc AS (SELECT l, r, CAST(COUNT(*) AS BIGINT) AS bc FROM bi GROUP BY l, r),
      |pcs AS (SELECT l, CAST(SUM(bc) AS BIGINT) AS pc FROM bc GROUP BY l),
      |bits AS (
      |  SELECT bc.l, bc.r, CAST(length(bin(pc // bc)) - 1 AS BIGINT) AS bits
      |  FROM bc JOIN pcs ON bc.l = pcs.l),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(SUM(bits) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT) AS millibits
      |  FROM bi JOIN bits ON bi.l = bits.l AND bi.r = bits.r
      |  GROUP BY doc_id),
      |hist AS (SELECT millibits, CAST(COUNT(*) AS BIGINT) AS nd FROM scored GROUP BY millibits),
      |cum AS (SELECT millibits, SUM(nd) OVER (ORDER BY millibits) AS cum FROM hist),
      |tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM hist),
      |th AS (SELECT
      |  (SELECT MIN(millibits) FROM cum, tot WHERE cum >= (n + 2) // 3) AS t1,
      |  (SELECT MIN(millibits) FROM cum, tot WHERE cum >= (2 * n + 2) // 3) AS t2),
      |lm AS (
      |  SELECT doc_id, millibits <= t2 AS pass_m FROM scored, th),
      |verdicts AS (
      |  SELECT
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
      |      AND (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 5
      |          <= length(text) AS pass_h,
      |    COALESCE(pass_m, false) AS pass_m
      |  FROM documents LEFT JOIN lm USING (doc_id)),
      |conf AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(CASE WHEN pass_h AND pass_m THEN 1 END) AS BIGINT) AS n11,
      |    CAST(COUNT(CASE WHEN pass_h AND NOT pass_m THEN 1 END) AS BIGINT) AS n10,
      |    CAST(COUNT(CASE WHEN NOT pass_h AND pass_m THEN 1 END) AS BIGINT) AS n01,
      |    CAST(COUNT(CASE WHEN NOT pass_h AND NOT pass_m THEN 1 END) AS BIGINT) AS n00
      |  FROM verdicts)
      |SELECT n_docs, n11, n10, n01, n00,
      |  ((n11 + n00) * 1000000) // n_docs AS po_ppm,
      |  (((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) * 1000000)
      |    // (n_docs * n_docs) AS pe_ppm,
      |  CASE WHEN n_docs * n_docs = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
      |       THEN NULL
      |       WHEN n_docs * (n11 + n00) >= (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
      |       THEN ((n_docs * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))) * 1000000)
      |            // (n_docs * n_docs - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)))
      |       ELSE -((((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10) - n_docs * (n11 + n00)) * 1000000)
      |            // (n_docs * n_docs - ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))))
      |  END AS kappa_ppm
      |FROM conf""".stripMargin

  def all: Seq[Q] = Seq(
    Q("t18_bpe_encode", t18, Some(t18Oracle)),
    Q("t19_lm_quality_buckets", t19, Some(t19Oracle)),
    Q("c09_filter_agreement", c09, Some(c09Oracle)),
  )
}
