package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Multilingual language identification — a hashed character-n-gram
  * multinomial Naive-Bayes classifier over ≥ 5 languages (round-12
  * verdict #8), replacing the t03 English-stopword heuristic's
  * single-language view with a real language gate.
  *
  * Model (all integer-exact, the c11 linearized-NB posture + ml05's
  * no-vocabulary feature hashing):
  *  - features: character TRIGRAMS of the normalized text (t01's
  *    normalization), hashed to [[Buckets]] buckets via the engine-neutral
  *    md5-prefix recipe (`conv(substring(md5(g),1,8),16,10) % B` ↔
  *    DuckDB `('0x' || ...)::BIGINT % B` — the ml05 pair);
  *  - training: bucket counts per language over the embedded [[seeds]]
  *    corpus (the SAME Scala value renders the oracle's VALUES list, so
  *    the two engines provably train on identical bytes);
  *  - scoring: per (gram, lang), the Laplace-smoothed bucket probability
  *    as a FIXED-POINT integer `((c+1)·10⁹) div (T_lang + B)` — summed
  *    per document (the additive surrogate of the NB product; argmax of
  *    a sum of per-feature class probabilities, merge-order free and
  *    bit-identical across engines where a float log-sum never is);
  *  - prediction: argmax language, ties toward the alphabetically
  *    smallest (deterministic, engine-independent).
  *
  * Gate output (t21): the CONFUSION AUDIT — documents' metadata `lang`
  * column × predicted language, with document counts and the summed
  * winning scores. On this synthetic corpus the audit is expected to show
  * near-independence (the metadata lang is assigned independently of the
  * synthetic English-vocabulary text — an honest negative finding the
  * audit exists to surface); LangIdSpec proves the classifier itself is
  * real by held-out self-classification on actual multilingual text.
  *
  * Scale shape: the model is seed-corpus-sized (≤ B·langs rows) and
  * broadcast; document scoring is one narrow trigram explode (corpus
  * characters × 5 langs after the broadcast join), one partial-aggregated
  * (doc, lang) rollup, and a doc-cardinality argmax window — no corpus
  * shuffle keyed on anything wider than doc_id.
  */
object LangId {

  val Buckets = 512

  /** Fixed-point scale for the smoothed bucket probability. */
  val Nano = 1000000000L

  /** Embedded per-language seed corpus — deliberately small, real text in
    * five languages (apostrophe-free so the rendered SQL literal is
    * byte-identical). The single source for BOTH engines' training sets.
    */
  val seeds: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog",
    "en" -> "data pipelines process large volumes of text every day",
    "en" -> "we should measure the performance before shipping the change",
    "en" -> "most people agree that reading improves both writing and thinking",
    "en" -> "the weather this morning was cold with a light rain",
    "en" -> "please review the document and send your feedback by friday",
    "fr" -> "le renard brun rapide saute par dessus le chien paresseux",
    "fr" -> "les grandes quantites de texte sont traitees chaque jour",
    "fr" -> "nous devons mesurer la performance avant de livrer le changement",
    "fr" -> "la plupart des gens pensent que la lecture ameliore la pensee",
    "fr" -> "le temps ce matin etait froid avec une pluie legere",
    "fr" -> "veuillez relire le document et envoyer vos remarques vendredi",
    "de" -> "der schnelle braune fuchs springt ueber den faulen hund",
    "de" -> "grosse textmengen werden jeden tag verarbeitet und geprueft",
    "de" -> "wir sollten die leistung messen bevor wir die aenderung liefern",
    "de" -> "die meisten menschen glauben dass lesen das denken verbessert",
    "de" -> "das wetter heute morgen war kalt mit leichtem regen",
    "de" -> "bitte lesen sie das dokument und senden sie ihre anmerkungen",
    "es" -> "el rapido zorro marron salta sobre el perro perezoso",
    "es" -> "grandes volumenes de texto se procesan todos los dias",
    "es" -> "debemos medir el rendimiento antes de entregar el cambio",
    "es" -> "la mayoria de la gente piensa que leer mejora el pensamiento",
    "es" -> "el tiempo esta manana era frio con una lluvia ligera",
    "es" -> "por favor revise el documento y envie sus comentarios el viernes",
    "zh" -> "敏捷的棕色狐狸跳过了那只懒狗",
    "zh" -> "数据管道每天处理大量的文本内容",
    "zh" -> "我们应该在发布变更之前测量性能",
    "zh" -> "大多数人认为阅读能够改善写作和思考",
    "zh" -> "今天早上的天气很冷还下着小雨",
    "zh" -> "请审阅这份文件并在周五之前发送您的反馈",
  )

  val langs: Seq[String] = seeds.map(_._1).distinct.sorted

  /** Engine-neutral bucket hash (the ml05 recipe). */
  private def bucket(g: org.apache.spark.sql.Column) =
    (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % Buckets).as("bucket")

  /** Character trigrams of the normalized text column `t`. */
  private def trigrams(df: DataFrame, keep: Seq[String]): DataFrame =
    df.filter(length(col("t")) >= 3)
      .select(keep.map(col) :+
        explode(expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
          .as("g"): _*)

  /** Per-(lang, bucket) counts + per-lang totals over the seed corpus. */
  private def model(s: SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    val stoks = trigrams(
      seeds.toDF("lang", "txt").select($"lang", TextAnalysis.normalize($"txt").as("t")),
      Seq("lang"))
      .select($"lang", bucket($"g"))
    (stoks.groupBy($"lang", $"bucket").agg(count(lit(1)).as("c")),
      stoks.groupBy($"lang").agg(count(lit(1)).as("t_lang")))
  }

  /** Classify any (id, text) relation: (id, pred_lang, n_grams, best_score). */
  def classify(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (counts, totals) = model(s)
    // spread the per-doc gram fan-out + md5 hashing before it starts: a
    // small corpus arrives as one parquet split and would otherwise score
    // in a single task (explicit width — AQE would re-coalesce the tiny
    // pre-explode relation)
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt
    val dtoks = trigrams(
      docs.select(col("id"), TextAnalysis.normalize(col("text")).as("t"))
        .repartition(width, col("id")),
      Seq("id"))
      .select($"id", bucket($"g"))
    val scored = dtoks
      // per-gram lang fan-out as a literal-array explode — stays inside
      // codegen, no join node (a 5-row crossJoin would read as a cartesian
      // to the plan sweep and cost a build side for nothing)
      .withColumn("lang", explode(array(langs.map(lit): _*)))
      .join(broadcast(counts), Seq("lang", "bucket"), "left")
      .join(broadcast(totals), Seq("lang"))
      .select($"id", $"lang",
        // integer div, NOT `/` (Column./ is double division — the fixed
        // point must stay exact)
        expr(s"((coalesce(c, CAST(0 AS BIGINT)) + 1) * $Nano) div (t_lang + $Buckets)")
          .as("w"))
      .groupBy($"id", $"lang")
      .agg(count(lit(1)).as("n_grams"), sum($"w").as("score"))
    val arg = Window.partitionBy($"id").orderBy($"score".desc, $"lang".asc)
    scored
      .withColumn("rk", row_number().over(arg))
      .filter($"rk" === 1)
      .select($"id", $"lang".as("pred_lang"), $"n_grams", $"score".as("best_score"))
  }

  /** t21 — the confusion audit over the documents table: metadata lang ×
    * predicted lang, document counts and summed winning scores.
    */
  def t21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id".as("id"), $"text", $"lang")
    classify(docs.select($"id", $"text"))
      .join(docs.select($"id", $"lang"), Seq("id"))
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n_docs"), sum($"best_score").as("sum_best_score"))
      .orderBy($"lang", $"pred_lang")
  }

  /** The identical train → hash → score → argmax pipeline in DuckDB,
    * trained on the VALUES rendering of the SAME [[seeds]] value.
    */
  val t21Oracle: String = {
    val values = seeds.map { case (l, t) => s"('$l', '$t')" }.mkString(",\n    ")
    val langList = langs.map(l => s"('$l')").mkString(", ")
    s"""WITH seeds(lang, txt) AS (VALUES
       |    $values),
       |norm AS (
       |  SELECT lang, regexp_replace(lower(trim(txt)), '\\s+', ' ', 'g') AS t
       |  FROM seeds),
       |stoks AS (
       |  SELECT lang,
       |    ('0x' || substring(md5(substr(t, i, 3)), 1, 8))::BIGINT % $Buckets AS bucket
       |  FROM (SELECT lang, t, unnest(generate_series(1, length(t) - 2)) AS i
       |        FROM norm WHERE length(t) >= 3)),
       |counts AS (SELECT lang, bucket, COUNT(*) AS c FROM stoks GROUP BY 1, 2),
       |totals AS (SELECT lang, COUNT(*) AS t_lang FROM stoks GROUP BY 1),
       |langs(lang) AS (VALUES $langList),
       |dnorm AS (
       |  SELECT doc_id AS id, lang AS meta_lang,
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |dtoks AS (
       |  SELECT id,
       |    ('0x' || substring(md5(substr(t, i, 3)), 1, 8))::BIGINT % $Buckets AS bucket
       |  FROM (SELECT id, t, unnest(generate_series(1, length(t) - 2)) AS i
       |        FROM dnorm WHERE length(t) >= 3)),
       |scored AS (
       |  SELECT d.id, l.lang,
       |    CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM((COALESCE(c.c, 0) + 1) * $Nano // (tt.t_lang + $Buckets))
       |         AS BIGINT) AS score
       |  FROM dtoks d
       |  CROSS JOIN langs l
       |  LEFT JOIN counts c ON c.lang = l.lang AND c.bucket = d.bucket
       |  JOIN totals tt ON tt.lang = l.lang
       |  GROUP BY d.id, l.lang),
       |pred AS (
       |  SELECT id, lang AS pred_lang, score AS best_score FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
       |                                 ORDER BY score DESC, lang ASC) AS rk
       |    FROM scored) WHERE rk = 1)
       |SELECT n.meta_lang AS lang, p.pred_lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(p.best_score) AS BIGINT) AS sum_best_score
       |FROM pred p JOIN dnorm n ON n.id = p.id
       |GROUP BY 1, 2
       |ORDER BY lang, pred_lang""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("t21_language_id_confusion", t21, Some(t21Oracle)),
  )
}
