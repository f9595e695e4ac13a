package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The hashed-trigram NB language classifier: real-language behavior
  * (the gate's confusion audit over the synthetic corpus can't show it —
  * that corpus's text is English-vocabulary regardless of its metadata
  * lang, which is exactly what the audit surfaces).
  */
class LangIdSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private def predict(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    LangId.classify(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"))
      .orderBy($"id").collect().map(_.getString(1)).toSeq
  }

  test("training seeds self-classify to their own language, every sentence") {
    val got = predict(LangId.seeds.map(_._2))
    val want = LangId.seeds.map(_._1)
    val wrong = got.zip(want).zipWithIndex.filter { case ((g, w), _) => g != w }
    assert(wrong.isEmpty, s"misclassified seeds: $wrong")
  }

  test("held-out sentences classify correctly in all five languages") {
    val heldOut = Seq(
      "en" -> "this sentence was never part of the training corpus at all",
      "fr" -> "cette phrase ne faisait pas partie du corpus utilise pour apprendre",
      "de" -> "dieser satz war niemals teil der trainingsdaten des modells",
      "es" -> "esta frase nunca formo parte del corpus de entrenamiento",
      "zh" -> "这句话从来没有出现在训练语料库里面",
    )
    val got = predict(heldOut.map(_._2))
    assert(got == heldOut.map(_._1), s"got $got")
  }

  test("prediction is deterministic and tie-broken toward the smaller lang") {
    // an empty-ish text with only unseen grams scores each lang by its
    // total alone; whatever wins, repeated runs must agree
    val a = predict(Seq("qqq xxx zzz 000"))
    val b = predict(Seq("qqq xxx zzz 000"))
    assert(a == b)
  }

  test("langs dimension is sorted and matches the seed corpus") {
    assert(LangId.langs == Seq("de", "en", "es", "fr", "zh"))
    assert(LangId.seeds.groupBy(_._1).forall(_._2.size >= 6))
  }
}
