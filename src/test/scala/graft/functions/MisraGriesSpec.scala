package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.VectorFunctions.misra_gries

class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** item → est map of the single-row sketch result. */
  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(misra_gries(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("guarantees hold under every partitioning (merge-order invariance)") {
    // n=180: a×50, b×30, 100 singletons → threshold n/(k+1)=45 at k=3:
    // only 'a' is a guaranteed heavy hitter
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 100).map(i => s"u$i")
    for (parts <- Seq(1, 4, 13)) {
      val df = items.toDF("item").repartition(parts)
      val mg = sketchOf(df, k = 3)
      assert(mg.size <= 3, s"parts=$parts: ${mg.size} counters")
      assert(mg.contains("a"), s"parts=$parts: heavy hitter evicted")
      val est = mg("a")
      assert(est <= 50 && est >= 50 - 180 / 4, s"parts=$parts: est $est out of bounds")
      // undercount-only: no estimate may exceed its true count
      mg.foreach { case (w, e) =>
        val truth = items.count(_ == w).toLong
        assert(e <= truth, s"parts=$parts: $w overcounted ($e > $truth)")
      }
    }
  }

  test("k >= distinct items degenerates to exact counts") {
    val df = (Seq.fill(7)("x") ++ Seq.fill(4)("y") ++ Seq.fill(2)("z")).toDF("item")
    assert(sketchOf(df, k = 8) == Map("x" -> 7L, "y" -> 4L, "z" -> 2L))
  }

  test("usable from SQL text (GraftExtensions resolution path)") {
    Seq.fill(5)("q").toDF("item").createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT misra_gries(item, 2) AS mg FROM mg_in")
      .selectExpr("mg[0].item", "mg[0].est").collect()(0)
    assert(out.getString(0) == "q" && out.getLong(1) == 5L)
  }

  test("hh03 emits exactly the closed windows and audits both hot tiers in each") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.HeavyHitters.hh03(spark, dir).collect()
    // the append-mode emission rule, recomputed batch-side: a week window
    // is closed iff its end <= max(ts) - 7 days
    val closedWeeks = graft.Tables.events(spark, dir)
      .select(date_trunc("week", col("ts")).as("wk"), col("ts"))
      .agg(collect_set(date_format(col("wk"), "yyyy-MM-dd")).as("wks"),
        max(col("ts")).as("mx"))
      .select(explode(col("wks")).as("wk"), col("mx"))
      .filter(expr("to_timestamp(wk) + INTERVAL 7 DAY <= mx - INTERVAL 7 DAY"))
      .collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet == closedWeeks,
      "audited windows must be exactly the watermark-closed ones")
    // every closed window surfaces both planted hot tiers, bounds green
    closedWeeks.foreach { wk =>
      val items = out.filter(_.getString(0) == wk).map(_.getString(1)).toSet
      assert(items == Set("hot_a", "hot_b"), s"$wk: $items")
    }
    assert(out.forall(r => r.getBoolean(3) && r.getBoolean(4)))
  }
}
