package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Text-analysis operators for a training-data pipeline over `documents`
  * (beyond the reference surface — BASELINE.json north star): token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All four are pure per-row scalar pipelines: no shuffle except the final
  * presentation ORDER BY — they scale embarrassingly (predicate/column
  * pruning reaches the scan; at 100 TB each task streams its split).
  */
object TextAnalysis {

  /** Whitespace-collapsed, lower-cased canonical text. */
  def normalize(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** JVM mirror of [[normalize]] for mapPartitions operators — matches the
    * SQL pipeline exactly: trim strips SPACES only (String.trim would strip
    * all chars ≤ 0x20), locale-independent lower, then \s+ → ' ' collapse.
    */
  def normalizeJvm(text: String): String = {
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    text.substring(b, e)
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
  }

  /** t01 — token count: non-empty whitespace tokens + char length. */
  def t01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        size(filter(split($"text", "\\s+"), x => x =!= "")).as("n_tokens"),
        length($"text").as("n_chars_computed"),
        $"n_chars",
      )
      .orderBy($"doc_id")
  }

  val t01Oracle: String =
    """SELECT doc_id,
      |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
      |  length(text) AS n_chars_computed,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t02 — quality scoring: word/char stats, punctuation and digit ratios,
    * length bucket (the length/punct/stopword-ratio heuristics of web-scale
    * corpus filtering).
    */
  def t02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chars = length($"text")
    val words = size(filter(split($"text", " "), x => x =!= ""))
    val letters = length(regexp_replace($"text", " ", ""))
    val punct = chars - length(regexp_replace($"text", "[.,;:!?]", ""))
    val digits = chars - length(regexp_replace($"text", "[0-9]", ""))
    // NULLIF guards: an empty/whitespace-only doc must yield NULL ratios in
    // BOTH engines (unguarded, Spark ANSI throws and DuckDB returns inf)
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        chars.as("n_chars_q"),
        words.as("n_words"),
        (letters.cast("double") / when(words =!= 0, words)).as("avg_word_len"),
        punct.as("n_punct"),
        (digits.cast("double") / when(chars =!= 0, chars)).as("digit_ratio"),
        when(words < 20, "short").when(words < 60, "medium").otherwise("long")
          .as("len_bucket"),
      )
      .orderBy($"doc_id")
  }

  val t02Oracle: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_q,
      |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
      |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
      |    / NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0) AS avg_word_len,
      |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
      |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
      |    / NULLIF(length(text), 0) AS digit_ratio,
      |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) < 20 THEN 'short'
      |       WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) < 60 THEN 'medium'
      |       ELSE 'long' END AS len_bucket
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Occurrences of `marker` in ' '||text||' ' via the replace-count trick
    * (identical semantics in Spark and DuckDB → oracle-able; an n-gram
    * language model would not be). Plain string `replace`, not
    * regexp_replace — the marker is a literal, and skipping the regex
    * engine makes the 8-marker scan of t03/c01 measurably cheaper.
    */
  private def markerCount(padded: Column, marker: String): Column =
    ((length(padded) - length(call_function("replace", padded, lit(marker))))
      / marker.length).cast("int")

  /** Per-language marker-hit columns for a text column (en/de/fr/es). */
  def langHits(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), normalize(text), lit(" "))
    Seq(
      "en" -> (markerCount(padded, " the ") + markerCount(padded, " a ")),
      "de" -> (markerCount(padded, " der ") + markerCount(padded, " und ")),
      "fr" -> (markerCount(padded, " le ") + markerCount(padded, " et ")),
      "es" -> (markerCount(padded, " el ") + markerCount(padded, " y ")),
    )
  }

  /** Argmax with the fixed en>de>fr>es tie priority, over hit columns. */
  def langArgmax(en: Column, de: Column, fr: Column, es: Column): Column =
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")

  /** Language-ID heuristic over any (doc_id, text) frame: stopword-marker
    * counts per candidate language, argmax with a fixed priority order for
    * ties.
    */
  def langPred(docs: DataFrame): DataFrame = {
    val hits = langHits(col("text"))
    docs
      .select(col("doc_id") +: hits.map { case (l, c) => c.as(s"${l}_hits") }: _*)
      .withColumn("lang_pred",
        langArgmax(col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits")))
      .orderBy(col("doc_id"))
  }

  /** t03 — language-ID over the documents table. */
  def t03(s: SparkSession, dir: String): DataFrame =
    langPred(Tables.documents(s, dir))

  private def duckMarker(marker: String): String =
    s"CAST((length(p.padded) - length(replace(p.padded, '$marker', ''))) / ${marker.length} AS INT)"

  val t03Oracle: String = {
    val en = s"${duckMarker(" the ")} + ${duckMarker(" a ")}"
    val de = s"${duckMarker(" der ")} + ${duckMarker(" und ")}"
    val fr = s"${duckMarker(" le ")} + ${duckMarker(" et ")}"
    val es = s"${duckMarker(" el ")} + ${duckMarker(" y ")}"
    s"""WITH p AS (SELECT doc_id,
       |  ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS padded
       |  FROM documents),
       |hits AS (SELECT doc_id, $en AS en_hits, $de AS de_hits, $fr AS fr_hits, $es AS es_hits
       |  FROM p)
       |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS lang_pred
       |FROM hits ORDER BY doc_id""".stripMargin
  }

  /** t04 — document fingerprint: MD5 over canonical text (cross-engine-
    * stable content hash; the exact-dedup key) + a 12-char short form.
    */
  def t04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        md5(normalize($"text")).as("fingerprint"),
        substring(md5(normalize($"text")), 1, 12).as("short_fp"),
      )
      .orderBy($"doc_id")
  }

  val t04Oracle: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 12) AS short_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-style pre-tokenizer pattern (ASCII form of the GPT-2 pretokenize
    * classes: space-prefixed letter runs, digit runs, punctuation runs,
    * whitespace runs) — kept to constructs RE2 (DuckDB) and the JVM regex
    * engine (Spark) interpret identically: no lookarounds, no backrefs.
    */
  val BpeishPattern = " ?[a-z]+| ?[A-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"

  /** t05 — token counting with the BPE-ish regex next to whitespace tokens
    * (the "whitespace + BPE-ish regex" pair of a training-data token
    * accounting pass).
    */
  def t05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        size(filter(split($"text", "\\s+"), x => x =!= "")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit(BpeishPattern), lit(0))).as("bpeish_tokens"),
      )
      .orderBy($"doc_id")
  }

  val t05Oracle: String =
    s"""SELECT doc_id,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
       |  len(regexp_extract_all(text, '$BpeishPattern')) AS bpeish_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** PII patterns kept to syntax Java regex (Spark) and RE2 (DuckDB)
    * interpret identically: character classes + bounded quantifiers, no
    * lookarounds/backrefs.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** t06 — PII detection + redaction (the scrub pass of a training-data
    * pipeline): count and mask emails / IPv4s / phone numbers. The corpus
    * is synthetic word-salad with no organic PII, so a deterministic
    * augmentation plants PII in a data-dependent subset of rows first —
    * the detectors and the replacement pipeline are what's under test,
    * end-to-end against the oracle. Redaction order (email → ip → phone)
    * is fixed and identical in both engines.
    */
  def t06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = concat(
      $"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" contact user"), $"doc_id".cast("string"), lit("@"),
          $"source", lit(".example.org"))).otherwise(lit("")),
      when($"doc_id" % 4 === 0,
        concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit(".7")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0, lit(" call 555-867-5309")).otherwise(lit("")),
    )
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(aug, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>")
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        size(regexp_extract_all(aug, lit(EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(aug, lit(Ipv4Pattern), lit(0))).as("n_ips"),
        size(regexp_extract_all(aug, lit(PhonePattern), lit(0))).as("n_phones"),
        redacted.as("redacted"),
      )
      .orderBy($"doc_id")
  }

  val t06Oracle: String = {
    // runtime pattern strings hold single backslashes; DuckDB string
    // literals pass them to RE2 verbatim, so direct interpolation is exact
    val email = EmailPattern
    s"""WITH aug AS (SELECT doc_id,
       |  text
       |    || CASE WHEN doc_id % 3 = 0
       |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.org'
       |            ELSE '' END
       |    || CASE WHEN doc_id % 4 = 0
       |            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
       |            ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_emails,
       |  len(regexp_extract_all(t, '$Ipv4Pattern')) AS n_ips,
       |  len(regexp_extract_all(t, '$PhonePattern')) AS n_phones,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |      '$Ipv4Pattern', '<IP>', 'g'),
       |    '$PhonePattern', '<PHONE>', 'g') AS redacted
       |FROM aug ORDER BY doc_id""".stripMargin
  }

  /** t07 — corpus-level top-20 word bigrams (n-gram frequency accounting):
    * the classic word-count shuffle shape — per-doc bigram generation is
    * narrow, the single exchange carries (bigram, partial count) pairs
    * map-side combined, and top-k is a TakeOrderedAndProject, never a full
    * sort. Total order: count desc, bigram asc.
    */
  def t07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ws = split(normalize($"text"), " ")
    // arrays_zip over two shifted slices, NOT a transform(sequence(...))
    // lambda: higher-order-function lambdas run interpreted (measured 5×
    // slower here); zip/slice/explode/concat_ws all stay inside whole-stage
    // codegen
    graft.util.Spread.toWidth( // single-split spread (guide §2.5)
      Tables.documents(s, dir).select($"text"), $"text")
      .filter(size(ws) >= 2)
      .select(explode(arrays_zip(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1))).as("pair"))
      .select(concat_ws(" ", $"pair.0", $"pair.1").as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram")
      .limit(20)
  }

  val t07Oracle: String =
    """WITH w AS (SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |           FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |      FROM w WHERE len(ws) >= 2)
      |SELECT bigram, COUNT(*) AS n FROM b
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** t08 — TF-IDF-style term importance, log-free: score = tf_total × N/df
    * (one IEEE division — bit-stable across engines, unlike ln/log2 whose
    * last-ulp rounding may differ). Concentrated terms (high term frequency
    * in few documents) rank first — the distinctive-vocabulary surface of a
    * corpus profiler. Two shuffles (term stats, global count broadcast) +
    * TakeOrdered.
    */
  def t08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val words = graft.util.Spread.toWidth( // single-split spread (guide §2.5)
      docs.select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", explode(split(normalize($"text"), " ")).as("term"))
    val stats = words.groupBy($"term")
      .agg(count(lit(1)).as("tf_total"), countDistinct($"doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(broadcast(n))
      .select($"term", $"tf_total", $"df",
        (($"tf_total" * $"n_docs").cast("double") / $"df").as("score"))
      .orderBy($"score".desc, $"term")
      .limit(20)
  }

  val t08Oracle: String =
    """WITH w AS (SELECT doc_id,
      |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
      |  FROM documents),
      |st AS (SELECT term, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT term, tf_total, df, CAST(tf_total * n_docs AS DOUBLE) / df AS score
      |FROM st, n ORDER BY score DESC, term LIMIT 20""".stripMargin

  /** c01 — the composed corpus-curation pipeline (capstone over t02/t03/
    * d01): quality gate (length + digit-ratio) → language gate (predicted
    * en) → exact dedup keeping the lowest doc_id per canonical
    * fingerprint. This is the end-to-end filter a training-data pipeline
    * materializes; each stage is narrow until the single dedup groupBy,
    * whose key is a 128-bit hash — no raw text crosses the exchange.
    */
  def c01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val words = size(filter(split($"text", " "), x => x =!= ""))
    val chars = length($"text")
    val digits = chars - length(regexp_replace($"text", "[0-9]", ""))
    val hits = langHits($"text").toMap
    // quality and language gates FUSED into one projection over one scan —
    // the join-free form of quality ⋈ langPred (both derive from the same
    // row, so the equi-join on doc_id is a needless shuffle)
    docs
      .select($"doc_id", $"text", words.as("n_words"),
        (digits.cast("double") / when(chars =!= 0, chars)).as("digit_ratio"),
        langArgmax(hits("en"), hits("de"), hits("fr"), hits("es")).as("lang_pred"))
      .filter($"n_words" >= 20 && $"digit_ratio" <= 0.2 && $"lang_pred" === "en")
      .groupBy(md5(normalize($"text")).as("fingerprint"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"),
        min($"n_words").as("n_words"))
      .select($"doc_id", $"fingerprint", $"n_copies", $"n_words")
      .orderBy($"doc_id")
  }

  val c01Oracle: String = {
    val en = s"${duckMarker(" the ")} + ${duckMarker(" a ")}"
    val de = s"${duckMarker(" der ")} + ${duckMarker(" und ")}"
    val fr = s"${duckMarker(" le ")} + ${duckMarker(" et ")}"
    val es = s"${duckMarker(" el ")} + ${duckMarker(" y ")}"
    s"""WITH q AS (SELECT doc_id, text,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |      / NULLIF(length(text), 0) AS digit_ratio
       |  FROM documents),
       |k1 AS (SELECT doc_id, text, n_words FROM q
       |       WHERE n_words >= 20 AND digit_ratio <= 0.2),
       |p AS (SELECT doc_id,
       |  ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS padded
       |  FROM documents),
       |hits AS (SELECT doc_id, $en AS en_hits, $de AS de_hits, $fr AS fr_hits, $es AS es_hits
       |  FROM p),
       |lang AS (SELECT doc_id,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS lang_pred FROM hits),
       |kept AS (SELECT k1.* FROM k1 JOIN lang USING (doc_id) WHERE lang_pred = 'en')
       |SELECT MIN(doc_id) AS doc_id,
       |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       |  COUNT(*) AS n_copies, MIN(n_words) AS n_words
       |FROM kept GROUP BY 2 ORDER BY doc_id""".stripMargin
  }

  val WinnowK = 8 // k-gram length (chars)
  val WinnowW = 4 // winnowing window (consecutive k-gram hashes)
  val WinnowB = 31L // polynomial base
  val WinnowM = 2147483647L // modulus 2^31-1

  /** t09 — winnowing fingerprints over a Rabin–Karp ROLLING hash (the
    * rolling-hash document fingerprinting of MOSS-style near-dup /
    * provenance detection): hash every k-char gram of the canonical text
    * with a polynomial rolling update (subtract the outgoing char's
    * `B^(k-1)` term, shift, add the incoming char — O(1) per position),
    * then keep the min hash of every w-length window, dedup'd. The per-doc
    * summary (count / min / max / exact sum of the fingerprint set) is
    * what the driver hash-checks; the oracle recomputes every hash
    * positionally in SQL — modular congruence makes the incremental and
    * positional forms provably equal, so the oracle also validates the
    * rolling update. Narrow mapPartitions pass, no shuffle.
    */
  /** The pure winnowing core: sorted distinct fingerprints of a CANONICAL
    * (already-normalized) string — rolling k-gram hashes, min per w-window.
    * Winnowing guarantee: any shared substring of length ≥ w + k − 1 chars
    * between two texts produces at least one shared fingerprint
    * (spec-verified in TextDedupSpec).
    */
  def winnowFingerprints(t: String): Array[Long] = {
    val (k, w, bigB, m) = (WinnowK, WinnowW, WinnowB, WinnowM)
    val n = t.length - k + 1
    if (n < w) return Array.empty
    val bk1 = { // B^(k-1) mod M
      var x = 1L; (1 until k).foreach(_ => x = x * bigB % m); x
    }
    val hs = new Array[Long](n)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * bigB + t.charAt(j)) % m; j += 1 } // Horner init
    hs(0) = h
    var i = 1
    while (i < n) { // rolling update
      h = java.lang.Math.floorMod(h - t.charAt(i - 1) * bk1, m)
      h = (h * bigB + t.charAt(i + k - 1)) % m
      hs(i) = h
      i += 1
    }
    val fps = scala.collection.mutable.SortedSet.empty[Long]
    i = 0
    while (i <= n - w) {
      var mn = hs(i)
      var x = i + 1
      while (x < i + w) { if (hs(x) < mn) mn = hs(x); x += 1 }
      fps += mn
      i += 1
    }
    fps.toArray
  }

  def t09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO Spread here (measured, round 13): the rolling-hash pass is cheap
    // relative to the text exchange + 32-wide downstream stages the spread
    // costs — the paired ONLY-bench put the spread form of t10 at +1.95 s
    // (5.13 vs 3.17) and t09 flat, so the winnow family keeps the
    // single-split layout; the expensive-pass sites (t14/minhash/simhash)
    // keep their spread.
    Tables.documents(s, dir)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val fps = winnowFingerprints(normalizeJvm(text))
        if (fps.isEmpty) (id, 0L, None: Option[Long], None: Option[Long], 0L)
        else (id, fps.length.toLong, Some(fps.head), Some(fps.last), fps.sum)
      })
      .toDF("doc_id", "n_fp", "min_fp", "max_fp", "sum_fp")
      .orderBy($"doc_id")
  }

  /** t09's oracle CTEs: positional polynomial hashes (congruent to the
    * rolling form) + windowed minima in pure SQL — shared with t10.
    */
  val t09Ctes: String = {
    val powers = (0 until WinnowK).map { j =>
      var x = 1L; (1 until WinnowK - j).foreach(_ => x = x * WinnowB); x
    } // B^(k-1-j), un-reduced: terms stay far below 2^63
    val terms = powers.zipWithIndex.map { case (p, j) =>
      s"CAST(ascii(substring(t, i + $j, 1)) AS BIGINT) * $p"
    }.mkString(" + ")
    s"""n AS (SELECT doc_id,
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents),
       |h AS (SELECT doc_id, list_transform(range(1, greatest(length(t) - ${WinnowK - 2}, 1)),
       |    i -> ($terms) % $WinnowM) AS hs FROM n),
       |f AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(hs) - ${WinnowW - 2}, 1)),
       |    i -> list_min(list_slice(hs, i, i + ${WinnowW - 1})))) AS fps FROM h)""".stripMargin
  }

  val t09Oracle: String =
    s"""WITH $t09Ctes
       |SELECT doc_id, len(fps) AS n_fp,
       |  list_min(fps) AS min_fp, list_max(fps) AS max_fp,
       |  CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS sum_fp
       |FROM f ORDER BY doc_id""".stripMargin

  /** Per-doc winnowing fingerprints EXPLODED to (doc_id, fp) rows — the
    * inverted-index form the pair query joins on. Same narrow pass as t09.
    */
  def winnowSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO Spread (measured — see t09's note: +1.95 s on t10 with it)
    Tables.documents(s, dir)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        winnowFingerprints(normalizeJvm(text)).map(fp => (id, fp))
      })
      .toDF("doc_id", "fp")
  }

  val MinSharedFp = 2
  val WinnowJaccardFloor = 0.5
  val StopFpMinDf = 16L     // absolute floor for the stop-fingerprint cap
  val StopFpMaxFrac = 0.01  // fps in more docs than max(floor, 1% of corpus) drop

  /** t10 — MOSS-style candidate pairs from the winnowing fingerprints t09
    * produces: STOP-FINGERPRINTS are dropped (any fp whose posting list
    * exceeds max([[StopFpMinDf]], [[StopFpMaxFrac]]·|docs|) is boilerplate
    * — exactly stop-words in an inverted index), the surviving index is
    * self-joined, pairs with winnow-set Jaccard ≥ [[WinnowJaccardFloor]]
    * become candidates, and the d04 exact word-n-gram Jaccard verify runs
    * on candidates ONLY. The stop-fp drop is what makes the self-join
    * scale: the pair stream is Σ C(df, 2) over posting lists, so one
    * common 8-char gram shared by 1000 docs would alone contribute 500k
    * pair rows — capping df bounds every list's contribution to C(cap, 2)
    * (measured at sf0.1: 60 s → ~2 s). True near-dup clusters are small,
    * so their ~150 shared fingerprints sit far below any sane cap; the
    * Jaccard floor then sits in a measured chasm (coincidental overlap
    * ≤ 0.18, true near-dups ≥ 0.94). Hash-checked end to end: the oracle
    * recomputes every fingerprint positionally, the document-frequency
    * cap, the pair counts, the winnow-set Jaccard, AND the exact shingle
    * Jaccard.
    */
  def t10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val all = winnowSets(s, dir).cache() // feeds df counts + the semi join
    all.count() // eager: both readers must find the cache built — racing
    // materializations would each rerun the rolling-hash pass
    val nd = docs.agg(count(lit(1)).as("nd"))
    val keepFp = all.groupBy($"fp").agg(count(lit(1)).as("df"))
      .crossJoin(nd) // 1-row broadcast
      .filter($"df" <= greatest(lit(StopFpMinDf),
        ceil($"nd" * lit(StopFpMaxFrac)).cast("long")))
      .select($"fp")
    val fps = all.join(keepFp, Seq("fp"), "left_semi").cache() // 3 subtrees
    fps.count() // eager, same reason (3 concurrent readers)
    val counts = fps.groupBy($"doc_id").agg(count(lit(1)).as("n_fp"))
    val cand = fps.alias("x")
      .join(fps.alias("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter($"shared_fp" >= MinSharedFp)
      .join(counts.select($"doc_id".as("a"), $"n_fp".as("na")), Seq("a"))
      .join(counts.select($"doc_id".as("b"), $"n_fp".as("nb")), Seq("b"))
      .select($"a", $"b", $"shared_fp",
        ($"na" + $"nb" - $"shared_fp").as("union_fp"),
        ($"shared_fp".cast("double") / ($"na" + $"nb" - $"shared_fp"))
          .as("winnow_jaccard"))
      .filter($"winnow_jaccard" >= WinnowJaccardFloor)
      .cache() // feeds the output projection and the ngram verify
    cand.count() // eager (2 concurrent readers)
    cand
      .join(Dedup.ngramJaccard(docs, cand.select($"a", $"b")), Seq("a", "b"))
      .orderBy($"a", $"b")
  }

  val t10Oracle: String =
    s"""WITH $t09Ctes,
       |e0 AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       |keep AS (SELECT fp FROM e0 GROUP BY fp
       |         HAVING count(*) <= greatest($StopFpMinDf,
       |           CAST(ceil($StopFpMaxFrac * (SELECT count(*) FROM documents)) AS BIGINT))),
       |e AS (SELECT e0.* FROM e0 JOIN keep USING (fp)),
       |nf AS (SELECT doc_id, count(*) AS n_fp FROM e GROUP BY doc_id),
       |pr AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared_fp
       |       FROM e x JOIN e y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |       GROUP BY 1, 2 HAVING count(*) >= $MinSharedFp),
       |pm AS (SELECT * FROM (
       |    SELECT a, b, shared_fp,
       |      fa.n_fp + fb.n_fp - shared_fp AS union_fp,
       |      CAST(shared_fp AS DOUBLE)
       |        / (fa.n_fp + fb.n_fp - shared_fp) AS winnow_jaccard
       |    FROM pr JOIN nf fa ON pr.a = fa.doc_id JOIN nf fb ON pr.b = fb.doc_id)
       |  WHERE winnow_jaccard >= $WinnowJaccardFloor),
       |${Dedup.shingleCtes},
       |sets AS (SELECT doc_id, list(shingle) AS shs FROM sh GROUP BY doc_id)
       |SELECT a, b, shared_fp, union_fp, winnow_jaccard,
       |  CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE)
       |    / len(list_distinct(list_concat(sa.shs, sb.shs))) AS jaccard
       |FROM pm
       |JOIN sets sa ON pm.a = sa.doc_id
       |JOIN sets sb ON pm.b = sb.doc_id
       |ORDER BY a, b""".stripMargin

  val DupWordRatioMax = 0.3
  val TopBigramFracMax = 0.18

  /** t11 — repetition-based quality rules (the Gopher-style filters of
    * web-scale corpus curation): duplicate-word fraction and
    * most-frequent-bigram fraction per document, plus the repetitive
    * verdict combining them. Generated text loops; these per-doc rational
    * statistics are the cheap detector. Per-doc bigram tallies use the
    * word-count shuffle shape (two exchanges on doc-keyed rows — at 100 TB
    * the first aggregation is map-side-combined to (doc, bigram)
    * cardinality); bigram generation reuses t07's codegen zip/slice (no
    * interpreted HOF lambdas). All arithmetic is counts and one division —
    * fully oracle-checkable, verdict boolean included.
    */
  def t11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ws = split(normalize($"text"), " ")
    val words = Tables.documents(s, dir)
      .select($"doc_id", ws.as("ws"))
      .select($"doc_id", size($"ws").as("n_words"),
        size(array_distinct($"ws")).as("distinct_words"), $"ws")
    val bigramStats = words.filter($"n_words" >= 2)
      .select($"doc_id", explode(arrays_zip(
        slice($"ws", lit(1), size($"ws") - 1),
        slice($"ws", lit(2), size($"ws") - 1))).as("pair"))
      .select($"doc_id", concat_ws(" ", $"pair.0", $"pair.1").as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(max($"n").as("top_bigram_n"), sum($"n").as("n_bigrams"))
    val dupRatio =
      ($"n_words" - $"distinct_words").cast("double") / when($"n_words" =!= 0, $"n_words")
    val bigramFrac =
      $"top_bigram_n".cast("double") / when($"n_bigrams" > 0, $"n_bigrams")
    words.drop("ws")
      .join(bigramStats, Seq("doc_id"), "left")
      .select($"doc_id", $"n_words", $"distinct_words",
        dupRatio.as("dup_word_ratio"),
        coalesce($"top_bigram_n", lit(0L)).as("top_bigram_n"),
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        bigramFrac.as("top_bigram_frac"),
        (dupRatio > DupWordRatioMax ||
          coalesce(bigramFrac, lit(0.0)) > TopBigramFracMax).as("repetitive"))
      .orderBy($"doc_id")
  }

  val t11Oracle: String =
    s"""WITH w AS (SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM documents),
       |base AS (SELECT doc_id, len(ws) AS n_words,
       |    len(list_distinct(ws)) AS distinct_words FROM w),
       |b AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
       |  FROM w WHERE len(ws) >= 2),
       |bc AS (SELECT doc_id, bigram, count(*) AS n FROM b GROUP BY 1, 2),
       |bs AS (SELECT doc_id, MAX(n) AS top_bigram_n,
       |    CAST(SUM(n) AS BIGINT) AS n_bigrams FROM bc GROUP BY doc_id)
       |SELECT base.doc_id, n_words, distinct_words,
       |  CAST(n_words - distinct_words AS DOUBLE) / NULLIF(n_words, 0) AS dup_word_ratio,
       |  COALESCE(top_bigram_n, 0) AS top_bigram_n,
       |  COALESCE(n_bigrams, 0) AS n_bigrams,
       |  CAST(top_bigram_n AS DOUBLE) / NULLIF(n_bigrams, 0) AS top_bigram_frac,
       |  (CAST(n_words - distinct_words AS DOUBLE) / NULLIF(n_words, 0) > $DupWordRatioMax
       |   OR COALESCE(CAST(top_bigram_n AS DOUBLE) / NULLIF(n_bigrams, 0), 0.0)
       |      > $TopBigramFracMax) AS repetitive
       |FROM base LEFT JOIN bs USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val PackContextLen = 512L // tokens per packed training sequence

  /** t12 — SEQUENCE PACKING: assign documents to fixed-size training
    * sequences the way GPT-style pipelines do — concatenate the token
    * stream in a deterministic order and cut every `ctx` tokens
    * (documents may straddle a cut; `seq_id`/`seq_offset` say where each
    * doc's tokens begin). Packing is per `source` shard: the window
    * partitions by source, so shards pack independently and in parallel —
    * the global-total-order window a naive packer would need never
    * exists. At 100 TB: shard count × (sort within shard) is exactly the
    * write-side shuffle a sharded corpus already pays; the cumulative sum
    * is one window pass. All integer arithmetic — every column
    * oracle-checked.
    */
  def t12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ctx = PackContextLen
    val toks = size(filter(split($"text", "\\s+"), x => x =!= "")).cast("long")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(s, dir)
      .select($"doc_id", $"source", toks.as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens",
        (($"cum_tokens" - $"n_tokens") / ctx).cast("long").as("seq_id"),
        (($"cum_tokens" - $"n_tokens") % ctx).as("seq_offset"))
      .orderBy($"doc_id")
  }

  val t12Oracle: String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  (CAST(cum_tokens AS BIGINT) - n_tokens) // $PackContextLen AS seq_id,
       |  (CAST(cum_tokens AS BIGINT) - n_tokens) % $PackContextLen AS seq_offset
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // t13 — benchmark decontamination (n-gram collision check)
  // ---------------------------------------------------------------------

  /** N-gram width for the contamination check. GPT-3-style decontamination
    * uses 13-grams on real prose; 5 fits the testdata's short docs while
    * keeping the same false-positive calculus (a shared n-gram of this
    * width is overwhelming evidence of copying, not coincidence).
    */
  val ContamGramWords = 5

  /** t13 — eval-set decontamination: flag training docs sharing any
    * `ContamGramWords`-gram with the held-out benchmark partition (here
    * the deterministic doc_id%100==7 slice stands in for the eval sets).
    * Output is the full per-doc audit — total distinct grams, matched
    * grams, contamination verdict — for every non-benchmark doc, so the
    * gate checks negatives as well as hits.
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (eval suites, not training data) → it BROADCASTS, and the corpus
    * side stays a narrow scan + explode with a map-side hash probe; no
    * corpus shuffle except the per-doc count. This is the real
    * decontamination topology at 100 TB: corpus × benchmark-grams as a
    * broadcast left join, never a corpus-wide gram self-join (t10/d02
    * cover the self-join problem with inverted-index banding instead).
    */
  /** The t13 contamination gram stream, shared with Dedup.c06's
    * blast-radius composition. Codegen'd gram build (t07's zip/slice
    * pattern — a transform(...) array build runs interpreted and measured
    * ~5× slower): explode the zipped shifted slices, concat in the
    * projection. Docs shorter than n words drop (no truncated gram) — the
    * corpus guarantees ≥ 10 words per doc, so semantics match the
    * oracle's shingle CTE at every SF. Gram rows are NOT pre-deduped;
    * per-doc distinctness is folded into downstream count_distincts,
    * keeping the corpus side a single narrow pass + one doc_id shuffle.
    */
  private[ops] def contamGramRows(docs: DataFrame): DataFrame = {
    val n = ContamGramWords
    val ws = split(normalize(col("text")), " ")
    val span = size(ws) - (n - 1)
    // spread before the gram explode (the minhashSignatures lesson, guide
    // §2.5 input skew): the corpus arrives as ONE parquet split and the
    // probe side of t13/c06 feeds a BROADCAST join — no exchange exists
    // between the scan and the per-doc groupBy, so the whole 5-gram
    // fan-out ran in a single task (measured: 1.3 s single-task stage in
    // c06 at sf0.1). Scale-adaptive: identity once the scan has ≥ width
    // splits.
    graft.util.Spread.toWidth(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .filter(size(ws) >= n)
      .select(col("doc_id"), explode(arrays_zip(
        (1 to n).map(k => slice(ws, lit(k), span)): _*)).as("p"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(k => col(s"p.$k")): _*).as("g"))
  }

  def t13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def gramRows(docs: DataFrame): DataFrame = contamGramRows(docs)
    val docs = Tables.documents(s, dir)
    // benchmark side: 1% of docs — the filter pushes into ITS OWN scan, so
    // the small side never pays a full-corpus gram pass
    val bench = gramRows(docs.filter($"doc_id" % 100 === 7))
      .select($"g").distinct().withColumn("hit", lit(1))
    gramRows(docs.filter($"doc_id" % 100 =!= 7))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(
        countDistinct($"g").as("n_grams"),
        countDistinct(when($"hit".isNotNull, $"g")).as("n_matched"),
      )
      .select($"doc_id", $"n_grams", $"n_matched",
        ($"n_matched" > 0).as("contaminated"))
      .orderBy($"doc_id")
  }

  val t13Oracle: String = {
    val n = ContamGramWords
    val elems = (0 until n).map(k => s"ws[i+$k]").mkString(", ")
    s"""WITH w AS (SELECT doc_id,
       |  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM documents),
       |sh0 AS (SELECT doc_id, ws,
       |  unnest(range(1, greatest(len(ws) - ${n - 1}, 1) + 1)) AS i FROM w),
       |sh AS (SELECT DISTINCT doc_id,
       |  array_to_string(list_filter([$elems], x -> x IS NOT NULL), ' ') AS g
       |  FROM sh0),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 7)
       |SELECT c.doc_id, COUNT(*) AS n_grams,
       |  COUNT(b.g) AS n_matched,
       |  COUNT(b.g) > 0 AS contaminated
       |FROM sh c LEFT JOIN bench b ON c.g = b.g
       |WHERE c.doc_id % 100 <> 7
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // c04 — the full shard-curation job, end to end, as one gated relation
  // ---------------------------------------------------------------------

  /** c04 — what a training-data shard actually goes through, composed into
    * ONE query the gate hash-checks end to end:
    *
    *   quality gate → language gate → exact dedup (min-id winner, carrying
    *   the text through) → chunk-level boilerplate removal over the KEPT
    *   corpus (CCNet order: dedup first, then paragraph cleaning) → token
    *   recount of the CLEANED text → per-source-shard sequence packing.
    *
    * Output per surviving doc: its shard, chunks dropped, cleaned token
    * count, and the exact (seq_id, seq_offset) cut point of the packed
    * training stream. Every intermediate rule is recomputed by the DuckDB
    * oracle, so a regression in ANY stage (gate thresholds, dedup winner,
    * chunk counting, reassembly, packing arithmetic) fails the one entry.
    *
    * Scale shape = the union of its parts, each already audited: fused
    * scalar gates on one scan (c01), one dedup exchange on a 128-bit key,
    * the d09 chunk topology over the (smaller) kept corpus, and t12's
    * shard-local cumulative window — no global sort, no driver state.
    */
  def c04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val wordsC = size(filter(split($"text", " "), x => x =!= ""))
    val chars = length($"text")
    val digits = chars - length(regexp_replace($"text", "[0-9]", ""))
    val hits = langHits($"text").toMap
    val gated = docs
      .select($"doc_id", $"text", $"source", wordsC.as("n_words"),
        (digits.cast("double") / when(chars =!= 0, chars)).as("digit_ratio"),
        langArgmax(hits("en"), hits("de"), hits("fr"), hits("es")).as("lang_pred"))
      .filter($"n_words" >= 20 && $"digit_ratio" <= 0.2 && $"lang_pred" === "en")
    val dedupW = Window
      .partitionBy(md5(normalize($"text"))).orderBy($"doc_id")
    val kept = gated
      .withColumn("__rn", row_number().over(dedupW)).filter($"__rn" === 1)
      .select($"doc_id", $"text", $"source")
    val cleaned = Dedup.chunkDedup(kept)
    val toks = size(filter(split($"kept_text", " "), x => x =!= "")).cast("long")
    val packW = Window.partitionBy($"source").orderBy($"doc_id")
    cleaned
      .join(kept.select($"doc_id", $"source"), Seq("doc_id"))
      .select($"doc_id", $"source", $"n_dropped", toks.as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(packW))
      .select($"doc_id", $"source", $"n_dropped", $"n_tokens", $"cum_tokens",
        (($"cum_tokens" - $"n_tokens") / PackContextLen).cast("long").as("seq_id"),
        (($"cum_tokens" - $"n_tokens") % PackContextLen).as("seq_offset"))
      .orderBy($"doc_id")
  }

  // def, not val: reads Dedup.ChunkWords across the TextAnalysis/Dedup
  // object-reference cycle (see Dedup.c06Oracle for the observed failure
  // mode — a mid-init read sees the constant as 0)
  def c04Oracle: String = {
    val en = s"${duckMarker(" the ")} + ${duckMarker(" a ")}"
    val de = s"${duckMarker(" der ")} + ${duckMarker(" und ")}"
    val fr = s"${duckMarker(" le ")} + ${duckMarker(" et ")}"
    val es = s"${duckMarker(" el ")} + ${duckMarker(" y ")}"
    val cw = Dedup.ChunkWords
    s"""WITH q AS (SELECT doc_id, text, source,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |      / NULLIF(length(text), 0) AS digit_ratio
       |  FROM documents),
       |k1 AS (SELECT doc_id, text, source FROM q
       |       WHERE n_words >= 20 AND digit_ratio <= 0.2),
       |p AS (SELECT doc_id,
       |  ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS padded
       |  FROM documents),
       |hits AS (SELECT doc_id, $en AS en_hits, $de AS de_hits, $fr AS fr_hits, $es AS es_hits
       |  FROM p),
       |lang AS (SELECT doc_id,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS lang_pred FROM hits),
       |gated AS (SELECT k1.* FROM k1 JOIN lang USING (doc_id) WHERE lang_pred = 'en'),
       |kept AS (SELECT doc_id, text, source FROM (
       |    SELECT g.*, row_number() OVER (
       |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn FROM gated g) WHERE rn = 1),
       |w AS (SELECT doc_id,
       |  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM kept),
       |ch AS (SELECT doc_id, i AS chunk_idx,
       |  array_to_string(ws[(i*$cw+1):(i*$cw+$cw)], ' ') AS chunk
       |  FROM (SELECT doc_id, ws,
       |    unnest(range(0, CAST(ceil(len(ws)/$cw.0) AS BIGINT))) AS i FROM w)),
       |cnt AS (SELECT chunk, COUNT(*) AS n_occ FROM ch GROUP BY chunk),
       |j AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk, cnt.n_occ
       |  FROM ch JOIN cnt USING (chunk)),
       |clean AS (SELECT doc_id,
       |    COUNT(CASE WHEN n_occ >= 2 THEN 1 END) AS n_dropped,
       |    COALESCE(string_agg(CASE WHEN n_occ < 2 THEN chunk END, ' ' ORDER BY chunk_idx), '') AS kept_text
       |  FROM j GROUP BY doc_id),
       |tok AS (SELECT c.doc_id, k.source, c.n_dropped,
       |    CAST(len(list_filter(string_split(c.kept_text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM clean c JOIN kept k USING (doc_id)),
       |cum AS (SELECT doc_id, source, n_dropped, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tokens FROM tok)
       |SELECT doc_id, source, n_dropped, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  (CAST(cum_tokens AS BIGINT) - n_tokens) // $PackContextLen AS seq_id,
       |  (CAST(cum_tokens AS BIGINT) - n_tokens) % $PackContextLen AS seq_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }

  /** Char length of the t14 duplicated-substring grams. */
  val DupGramK = 16

  /** t14 — cross-document duplicated-substring fraction (the per-document
    * metric behind exact-substring dedup, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): slide a
    * [[DupGramK]]-char window over the canonical text, and for each
    * document report how many of its distinct grams also occur in ANOTHER
    * document. High dup_ratio = boilerplate / templated text, the standard
    * drop signal that MinHash (whole-doc granularity, d02) misses.
    *
    * Scale shape: the gram pass is narrow (per-row array expansion); each
    * gram immediately collapses to a 64-bit-prefix md5 key, so the only
    * exchanges carry (doc_id, 16-byte key) — never raw text — into two
    * aggregations (per-doc distinct, per-gram doc count) and a semi-join
    * back, all hashed on the same key. The production form at 100 TB is
    * the same plan with the gram relation bucketed by key; Lee et al.'s
    * suffix array is the single-machine alternative — this is the
    * shuffle-native one.
    */
  def t14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = DupGramK
    val docs = Tables.documents(s, dir)
    // One NARROW mapPartitions pass builds the per-doc DISTINCT gram-hash
    // set in the JVM: the declarative form (transform+substr lambda →
    // explode → md5 → DISTINCT) interprets a HOF lambda per gram outside
    // whole-stage codegen AND pays a 16-chars-per-row exchange for the
    // distinct; here the per-doc HashSet dedups before anything is
    // emitted, so no dedup shuffle exists at all (measured ~6× on the
    // cache build at sf0.1). Hash parity with the oracle: first 8 md5
    // bytes of the gram's UTF-8, lower-hex — exactly
    // substring(md5(gram), 1, 16).
    val grams = graft.util.Eager.cached(
      // spread first (guide §2.5): single-split corpus ⇒ the gram pass and
      // the cache it materializes were one-task (identity at real splits)
      graft.util.Spread.toWidth(
        docs.select($"doc_id", $"text"), $"doc_id").as[(Long, String)]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = "0123456789abcdef".toCharArray
          it.flatMap { case (id, text) =>
            val canon = normalizeJvm(text)
            if (canon.length < k) Iterator.empty
            else {
              val seen = new java.util.HashSet[String]()
              (0 to canon.length - k).iterator.flatMap { i =>
                val gram = canon.substring(i, i + k)
                if (seen.add(gram)) {
                  val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  val sb = new java.lang.StringBuilder(16)
                  var j = 0
                  while (j < 8) {
                    sb.append(hex((d(j) >> 4) & 0xf)); sb.append(hex(d(j) & 0xf)); j += 1
                  }
                  Iterator.single((id, sb.toString))
                } else Iterator.empty
              }
            }
          }
        }
        .toDF("doc_id", "g")) // read by per-doc totals, gram-df agg, semi-join
    val perDoc = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
    val dupGrams = grams.groupBy($"g").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2).select($"g")
    val dupPerDoc = grams.join(dupGrams, Seq("g"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_grams"))
    docs.select($"doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
        (coalesce($"n_dup_grams", lit(0L)).cast("double") /
          when($"n_grams" =!= 0, $"n_grams")).as("dup_ratio"))
      .orderBy($"doc_id")
  }

  val t14Oracle: String =
    s"""WITH c AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS canon
       |           FROM documents),
       |g AS (SELECT DISTINCT doc_id, substring(md5(substring(canon, i, $DupGramK)), 1, 16) AS g
       |      FROM (SELECT doc_id, canon, unnest(range(1, length(canon) - $DupGramK + 2)) AS i
       |            FROM c WHERE length(canon) >= $DupGramK)),
       |perdoc AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
       |dup AS (SELECT g FROM (SELECT g, COUNT(*) AS nd FROM g GROUP BY 1) WHERE nd >= 2),
       |dupdoc AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM g JOIN dup USING (g) GROUP BY 1)
       |SELECT c.doc_id, COALESCE(n_grams, 0) AS n_grams,
       |  COALESCE(n_dup_grams, 0) AS n_dup_grams,
       |  CAST(COALESCE(n_dup_grams, 0) AS DOUBLE) / NULLIF(n_grams, 0) AS dup_ratio
       |FROM c LEFT JOIN perdoc USING (doc_id) LEFT JOIN dupdoc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** t15 — RAG-style CHUNKING: each document split into overlapping
    * token-window chunks (window 64 BPE-ish tokens, stride 48 → 16-token
    * overlap), the retrieval-index preparation step of a RAG / long-context
    * training pipeline. Emitted per chunk: its ordinal, start offset,
    * actual token count (the tail chunk may be short) and an md5
    * fingerprint of the joined token text — the key a downstream
    * chunk-level dedup (d09) or embedding stage would consume.
    *
    * Scale shape: one narrow projection — tokenize, compute the chunk
    * count arithmetically, explode a generated index sequence, slice. No
    * joins, no shuffle except the final presentation sort; chunk count per
    * doc is ⌈(n−W)/S⌉+1 so output cardinality is ~n/S rows per doc,
    * linear in corpus size and embarrassingly parallel — the map stage of
    * a 100 TB chunking job.
    */
  def t15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val W = 64 // window (tokens per chunk)
    val S = 48 // stride (new tokens per chunk; W-S = 16 overlap)
    Tables.documents(s, dir)
      .select($"doc_id",
        regexp_extract_all($"text", lit(BpeishPattern), lit(0)).as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("n_chunks",
        when($"n" <= W, lit(1))
          .otherwise(lit(1) + expr(s"(n - $W + $S - 1) DIV $S")))
      .select($"doc_id", $"toks", $"n",
        explode(sequence(lit(0), $"n_chunks" - 1)).as("chunk_id"))
      .select(
        $"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        ($"chunk_id" * S + 1).cast("long").as("chunk_start"),
        size(slice($"toks", $"chunk_id" * S + 1, lit(W))).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice($"toks", $"chunk_id" * S + 1, lit(W)))).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val t15Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(text, '$BpeishPattern') AS t,
       |    len(regexp_extract_all(text, '$BpeishPattern')) AS n
       |  FROM documents),
       |idx AS (
       |  SELECT doc_id, t, n,
       |    unnest(range(0, CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END)) AS chunk_id
       |  FROM toks)
       |SELECT doc_id, chunk_id,
       |  chunk_id * 48 + 1 AS chunk_start,
       |  len(list_slice(t, chunk_id * 48 + 1, least(chunk_id * 48 + 64, n))) AS n_tokens,
       |  md5(array_to_string(list_slice(t, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')) AS chunk_hash
       |FROM idx ORDER BY doc_id, chunk_id""".stripMargin

  /** t16 — BPE MERGE INDUCTION (Sennrich et al. 2016, the byte-pair-
    * encoding vocabulary learner behind GPT/Llama tokenizers): the first 5
    * merge rules learned from the corpus, each round picking the most
    * frequent adjacent symbol pair (ties: lexicographic) and fusing it
    * corpus-wide.
    *
    * Representation: the classic word-frequency trick — training runs over
    * the DISTINCT-word vocabulary with counts, never the raw token stream,
    * so per-round work is vocabulary-sized (zipf-bounded) regardless of
    * corpus size. Each word is a TERMINATOR-delimited symbol string
    * ("c1␁c2␁…␁", ␁ = U+0001): every symbol owns its trailing terminator,
    * so a merge is a literal `replace` of "l␁r␁" with "lr␁" whose
    * occurrences can never overlap — "a␁a␁a␁a␁" correctly becomes
    * "aa␁aa␁" in one pass. (A space-WRAPPED form " l r " is subtly wrong:
    * consecutive occurrences share the boundary space, and non-overlapping
    * replace silently skips every second merge site.) The terminator also
    * makes matches symbol-exact — "a␁bc␁" cannot match pattern "a␁b␁".
    * Words containing the terminator are dropped defensively in both
    * engines. Pair stats count ALL adjacent positions (the standard
    * get_stats), summed with word frequencies as weights.
    *
    * Scale shape: 5 rounds × (one narrow pair explode over the vocabulary
    * + one (l,r)-keyed partial-agg shuffle + a 1-ROW argmax collect + one
    * narrow replace). The argmax is the only driver touch and is bounded
    * by construction. Lineage is truncated per round via Eager caching of
    * the vocabulary-sized relation — the same iterative posture as pr01's
    * PageRank rounds. Oracle: the identical 5 rounds UNROLLED as chained
    * DuckDB CTEs, hash-matched.
    */
  def t16(s: SparkSession, dir: String): DataFrame =
    bpeMerges(s, Tables.documents(s, dir), rounds = 5)

  /** The merge-learning core of [[t16]], parameterized for the spec's
    * hand-computable toy corpora.
    */
  /** Symbol terminator for [[bpeMerges]]' delimited word form. */
  val BpeSep = "\u0001"

  def bpeMerges(s: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
    import s.implicits._
    // NO Spread on the vocab build (measured, round 13: t16 +0.50 s /
    // t18 +1.27 s with it — the word explode is cheap next to the text
    // exchange + 32-wide vocab cache it buys)
    var vocab = graft.util.Eager.cached(
      docs
        .select(explode(split(normalize($"text"), " ")).as("word"))
        .filter($"word" =!= "" && !$"word".contains(BpeSep))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
        .select(
          concat(
            concat_ws(BpeSep, regexp_extract_all($"word", lit("."), lit(0))),
            lit(BpeSep)).as("w"),
          $"freq"))
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val syms = vocab
        .select($"freq", filter(split($"w", BpeSep), x => x =!= "").as("sy"))
        .filter(size($"sy") >= 2)
      val best = syms
        .select($"freq", $"sy", explode(sequence(lit(1), size($"sy") - 1)).as("i"))
        .select(element_at($"sy", $"i").as("l"),
          element_at($"sy", $"i" + 1).as("r"), $"freq")
        .groupBy($"l", $"r").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(1)
        .collect().headOption // bounded: ≤ 1 argmax row per round
      best match {
        case None =>
          // degenerate corpus: every word is already a single symbol — stop
          // with the merges learned so far (round-5 advice: the old (0)
          // indexing threw instead of terminating)
          exhausted = true
        case Some(b) =>
          val (l, r, cnt) = (b.getString(0), b.getString(1), b.getLong(2))
          merges += ((round.toLong, l, r, l + r, cnt))
          // lineage, not a fresh Eager cache: the vocab is vocabulary-TYPE
          // cardinality and each round's argmax already scans it once, so
          // round k paying k chained replaces over the ONE cached base
          // relation is far cheaper than a cache materialization + count
          // job per round (round 13: 2 jobs/round → 1; Catalyst collapses
          // the projections into nested codegen'd replace calls, and with
          // the fixed round budget the chain depth is bounded)
          vocab = vocab.select(
            replace($"w", lit(l + BpeSep + r + BpeSep), lit(l + r + BpeSep)).as("w"),
            $"freq")
          round += 1
      }
    }
    merges.result().toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"merge_round")
  }

  val t16Oracle: String = {
    def pairsOf(v: String, p: String) =
      s"""$p AS (
         |  SELECT sy[i] AS l, sy[i+1] AS r, SUM(freq) AS cnt
         |  FROM (SELECT sy, freq, unnest(range(1, len(sy))) AS i
         |        FROM (SELECT list_filter(string_split(w, chr(1)), x -> x <> '') AS sy, freq FROM $v))
         |  GROUP BY l, r)""".stripMargin
    def bestOf(p: String, b: String) =
      s"$b AS (SELECT l, r, cnt FROM $p ORDER BY cnt DESC, l, r LIMIT 1)"
    def mergeOf(v: String, b: String, v2: String) =
      s"$v2 AS (SELECT replace(w, l||chr(1)||r||chr(1), l||r||chr(1)) AS w, freq FROM $v, $b)"
    val chain = (1 to 5).map { k =>
      val steps = Seq(pairsOf(s"v${k - 1}", s"p$k"), bestOf(s"p$k", s"b$k")) ++
        (if (k < 5) Seq(mergeOf(s"v${k - 1}", s"b$k", s"v$k")) else Nil)
      steps.mkString(",\n")
    }.mkString(",\n")
    val out = (1 to 5).map { k =>
      s"SELECT $k AS merge_round, l AS lhs, r AS rhs, l||r AS merged, cnt AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    s"""WITH v0 AS (
       |  SELECT array_to_string(regexp_extract_all(word, '.'), chr(1)) || chr(1) AS w,
       |    COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' AND NOT contains(word, chr(1)) GROUP BY word),
       |$chain
       |SELECT CAST(merge_round AS BIGINT) AS merge_round, lhs, rhs, merged,
       |  CAST(pair_count AS BIGINT) AS pair_count
       |FROM ($out) ORDER BY merge_round""".stripMargin
  }

  // ---------------------------------------------------------------------
  // t17 — vocabulary growth curve (Heaps' law checkpoints)
  // ---------------------------------------------------------------------

  /** Corpus-prefix checkpoints for t17 (docs with doc_id < N). */
  val VocabCheckpoints: Seq[Int] = Seq(50, 100, 200, 500, 1000, 2000, 5000)

  /** t17 — VOCABULARY GROWTH CURVE: distinct token types vs cumulative
    * token occurrences over growing corpus prefixes — the empirical
    * Heaps'-law curve (V ≈ K·nᵝ, Heaps 1978) every tokenizer-training and
    * corpus-sizing exercise starts from ("how much more data until the
    * vocabulary stops growing?"). A checkpoint N covers docs with
    * doc_id < N; checkpoints past the corpus repeat the totals (the curve's
    * plateau is itself the signal).
    *
    * Scale shape — the naive form rescans the corpus once per checkpoint;
    * this one never does: a token type's contribution to EVERY checkpoint
    * is determined by one number, its FIRST-occurrence doc (min(doc_id) —
    * one partial-agg shuffle on token), and a doc's occurrence count
    * contributes via its own id (one narrow per-doc count). Both collapse
    * to ≤|checkpoints| histogram rows via a literal when-chain, and the
    * cumulative sums run on that handful of rows. Cost: one token-level
    * aggregation, regardless of how many checkpoints the curve has — the
    * same "aggregate once, bucket, cumulate tiny" recipe as tc01's decile
    * histogram.
    */
  def t17(s: SparkSession, dir: String): DataFrame =
    vocabGrowth(Tables.documents(s, dir))

  /** t17 over any (doc_id, text) relation — unit-testable on toy corpora. */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select($"doc_id", explode(split(normalize($"text"), " ")).as("token"))
      .filter($"token" =!= "")
    // smallest checkpoint covering a doc id: cp(d) = min{N : d < N}
    def cpOf(c: Column): Column =
      VocabCheckpoints.reverse.foldLeft(lit(null).cast("int")) { (acc, n) =>
        when(c < n, n).otherwise(acc)
      }
    val vhist = toks.groupBy($"token").agg(min($"doc_id").as("fd"))
      .select(cpOf($"fd").as("cp"))
      .filter($"cp".isNotNull)
      .groupBy($"cp").agg(count(lit(1)).as("nv"))
    val ohist = toks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .select(cpOf($"doc_id").as("cp"), $"n")
      .filter($"cp".isNotNull)
      .groupBy($"cp").agg(sum($"n").as("no"))
    val cps = VocabCheckpoints.toDF("checkpoint")
    val w = Window.orderBy($"checkpoint")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cps
      .join(vhist, $"checkpoint" === vhist("cp"), "left")
      .drop("cp")
      .join(ohist, $"checkpoint" === ohist("cp"), "left")
      .drop("cp")
      .select($"checkpoint",
        sum(coalesce($"nv", lit(0L))).over(w).as("vocab_size"),
        sum(coalesce($"no", lit(0L))).over(w).as("cum_tokens"))
      .orderBy($"checkpoint")
  }

  val t17Oracle: String = {
    val cps = VocabCheckpoints.mkString("[", ", ", "]")
    """WITH toks AS (
      |  SELECT doc_id, w AS token FROM (
      |    SELECT doc_id,
      |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |fs AS (SELECT token, MIN(doc_id) AS fd FROM toks GROUP BY token),
      |cps AS (SELECT unnest(""".stripMargin + cps + """) AS checkpoint)
      |SELECT checkpoint,
      |  (SELECT COUNT(*) FROM fs WHERE fd < checkpoint) AS vocab_size,
      |  (SELECT COUNT(*) FROM toks WHERE doc_id < checkpoint) AS cum_tokens
      |FROM cps ORDER BY checkpoint""".stripMargin
  }

  // ---------------------------------------------------------------------
  // c07 — per-source corpus datasheet
  // ---------------------------------------------------------------------

  /** c07 — CORPUS DATASHEET: the per-source summary table a dataset card
    * ("Datasheets for Datasets", Gebru et al. 2021) reports before a
    * training run commits to a mixture — per source: document and token
    * volume, quality-gate pass count (c01's length + digit-ratio rule),
    * English share (t03's language-ID), and how many docs are exact-dup
    * COPIES across the whole corpus (corpus-wide canonical-fingerprint
    * count ≥ 2 — the cross-source contamination signal per-source dedup
    * would miss). The per-source selves of c01's gates, reported instead
    * of applied — what c03's mixing weights and c05's caps are actually
    * chosen FROM.
    *
    * Scale shape: one projection computes every per-doc flag from the
    * same scan (the c01 fused-gate posture); the only non-narrow steps
    * are the corpus-wide fingerprint count (one 128-bit-key partial-agg
    * shuffle, d01's exchange) and the final source-keyed aggregate whose
    * output is source-cardinality. No raw text crosses an exchange.
    */
  def c07(s: SparkSession, dir: String): DataFrame =
    datasheet(Tables.documents(s, dir))

  /** The [[c07]] datasheet over any (source, doc_id, text) relation —
    * unit-testable on toy corpora.
    */
  def datasheet(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val words = size(filter(split($"text", " "), x => x =!= ""))
    val chars = length($"text")
    val digits = chars - length(regexp_replace($"text", "[0-9]", ""))
    val hits = langHits($"text").toMap
    val flagged = docs.select($"source", $"doc_id",
      words.cast("long").as("nw"), chars.cast("long").as("nc"),
      (words >= 20 &&
        (digits.cast("double") / when(chars =!= 0, chars)) <= 0.2).as("q_ok"),
      (langArgmax(hits("en"), hits("de"), hits("fr"), hits("es")) === "en")
        .as("is_en"),
      md5(normalize($"text")).as("fp"))
    val dupFp = flagged.groupBy($"fp").agg(count(lit(1)).as("nfp"))
    flagged.join(dupFp, "fp")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"nw").as("n_tokens"),
        sum($"nc").as("n_chars"),
        count(when($"q_ok", 1)).as("n_quality_ok"),
        count(when($"is_en", 1)).as("n_en"),
        count(when($"nfp" >= 2, 1)).as("n_dup_docs"))
      .orderBy($"source")
  }

  val c07Oracle: String = {
    val en = s"${duckMarker(" the ")} + ${duckMarker(" a ")}"
    val de = s"${duckMarker(" der ")} + ${duckMarker(" und ")}"
    val fr = s"${duckMarker(" le ")} + ${duckMarker(" et ")}"
    val es = s"${duckMarker(" el ")} + ${duckMarker(" y ")}"
    s"""WITH q AS (SELECT source, doc_id,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
       |    length(text) AS nc,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |      / NULLIF(length(text), 0) AS digit_ratio,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |p AS (SELECT doc_id,
       |  ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS padded
       |  FROM documents),
       |hits AS (SELECT doc_id, $en AS en_hits, $de AS de_hits, $fr AS fr_hits, $es AS es_hits
       |  FROM p),
       |lang AS (SELECT doc_id,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS lang_pred FROM hits),
       |f AS (SELECT q.source, q.doc_id, q.nw, q.nc,
       |    (q.nw >= 20 AND q.digit_ratio <= 0.2) AS q_ok,
       |    (lang.lang_pred = 'en') AS is_en, q.fp
       |  FROM q JOIN lang USING (doc_id)),
       |d AS (SELECT fp, COUNT(*) AS nfp FROM f GROUP BY fp)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(nw) AS BIGINT) AS n_tokens,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST(COUNT(CASE WHEN q_ok THEN 1 END) AS BIGINT) AS n_quality_ok,
       |  CAST(COUNT(CASE WHEN is_en THEN 1 END) AS BIGINT) AS n_en,
       |  CAST(COUNT(CASE WHEN nfp >= 2 THEN 1 END) AS BIGINT) AS n_dup_docs
       |FROM f JOIN d USING (fp)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** t20 — HTML BOILERPLATE EXTRACTION (the trafilatura/jusText stage —
    * the FIRST transformation every web-crawl corpus goes through before
    * any quality/dedup op sees text): strip script/style payloads whole,
    * drop chrome elements (nav/header/footer/aside), un-tag what remains,
    * collapse whitespace. The input corpus is synthesized
    * DETERMINISTICALLY in-plan (each doc's text wrapped in a fixed page
    * skeleton with title/nav/script/footer boilerplate — the same
    * stub-the-input posture as the multimodal fake decoder, documented
    * there): real crawl HTML slots in by replacing the synthesis
    * expression with the raw column. Because the payload is known, the
    * gate PROVES extraction exactness: `roundtrip_ok` pins the extracted
    * text equal to the whitespace-normalized original, and
    * `boilerplate_chars` accounts for every byte the extractor dropped.
    *
    * Both engines run the same regex dialect subset ((?s) flag,
    * non-greedy `.*?`, `[^>]*` — Java regex and DuckDB's RE2 agree on
    * all three). Per-row scalar pipeline: one projection chain, no
    * shuffle at all beyond the final presentation sort — the 100 TB
    * plan is the scan itself.
    */
  def t20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val html = concat(
      lit("<html><head><title>Doc "), $"doc_id".cast("string"),
      lit("</title><style>p{margin:0}</style></head><body>"),
      lit("<nav>home | corpus | about</nav><p>"), $"text",
      lit("</p><script>var t=1;</script><footer>&copy; graft corp</footer>"),
      lit("</body></html>"))
    val noHead = regexp_replace(html, "(?s)<head>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?s)<script>.*?</script>", " ")
    val noChrome = regexp_replace(noScript,
      "(?s)<(nav|header|footer|aside)>.*?</(nav|header|footer|aside)>", " ")
    val unTagged = regexp_replace(noChrome, "<[^>]*>", " ")
    val extracted = trim(regexp_replace(unTagged, "\\s+", " "))
    Tables.documents(s, dir)
      .select($"doc_id", length(html).as("html_chars"),
        length(extracted).as("extracted_chars"),
        (length(html) - length(extracted)).as("boilerplate_chars"),
        (extracted === trim(regexp_replace($"text", "\\s+", " ")))
          .as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  val t20Oracle: String =
    """WITH h AS (
      |  SELECT doc_id, text,
      |    '<html><head><title>Doc ' || doc_id ||
      |    '</title><style>p{margin:0}</style></head><body>' ||
      |    '<nav>home | corpus | about</nav><p>' || text ||
      |    '</p><script>var t=1;</script><footer>&copy; graft corp</footer>' ||
      |    '</body></html>' AS html
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, text, html,
      |    trim(regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(html, '(?s)<head>.*?</head>', ' ', 'g'),
      |            '(?s)<script>.*?</script>', ' ', 'g'),
      |          '(?s)<(nav|header|footer|aside)>.*?</(nav|header|footer|aside)>', ' ', 'g'),
      |        '<[^>]*>', ' ', 'g'),
      |      '\s+', ' ', 'g')) AS extracted
      |  FROM h)
      |SELECT doc_id, length(html) AS html_chars,
      |  length(extracted) AS extracted_chars,
      |  length(html) - length(extracted) AS boilerplate_chars,
      |  extracted = trim(regexp_replace(text, '\s+', ' ', 'g')) AS roundtrip_ok
      |FROM x ORDER BY doc_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("t01_token_count", t01, Some(t01Oracle)),
    Q("t02_text_quality", t02, Some(t02Oracle)),
    Q("t03_lang_id", t03, Some(t03Oracle)),
    Q("t04_fingerprint", t04, Some(t04Oracle)),
    Q("t05_bpeish_tokens", t05, Some(t05Oracle)),
    Q("t06_pii_redact", t06, Some(t06Oracle)),
    Q("t07_top_bigrams", t07, Some(t07Oracle)),
    Q("t08_term_importance", t08, Some(t08Oracle)),
    Q("t09_winnowing_fingerprints", t09, Some(t09Oracle)),
    Q("t10_winnowing_pairs", t10, Some(t10Oracle)),
    Q("t11_repetition_quality", t11, Some(t11Oracle)),
    Q("t12_sequence_packing", t12, Some(t12Oracle)),
    Q("t13_decontamination", t13, Some(t13Oracle)),
    Q("t14_dup_substrings", t14, Some(t14Oracle)),
    Q("t15_rag_chunking", t15, Some(t15Oracle)),
    Q("t16_bpe_merges", t16, Some(t16Oracle)),
    Q("t17_vocab_growth", t17, Some(t17Oracle)),
    Q("t20_html_extract", t20, Some(t20Oracle)),
    Q("c01_corpus_filter", c01, Some(c01Oracle)),
    Q("c04_curation_pipeline", c04, Some(c04Oracle)),
    Q("c07_corpus_datasheet", c07, Some(c07Oracle)),
  )
}
