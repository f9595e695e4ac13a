package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.Tables
import graft.ops.Similarity

class CosineSimSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("native expression == composed builtins, bit for bit, on real vectors") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfSmoke)
    val a = e.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.filter($"ida" < 20).crossJoin(b.filter($"idb".between(20, 40)))
    val diffs = pairs.select(
      VectorFunctions.cosine_sim($"va", $"vb").as("native"),
      Similarity.cosineComposed($"va", $"vb").as("composed"),
    ).filter($"native" =!= $"composed").count()
    assert(diffs == 0)
  }

  test("quantized_dot == the HOF aggregate(zip_with) formulation, bit for bit") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfSmoke)
    val a = e.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.filter($"ida" < 20).crossJoin(b.filter($"idb".between(20, 40)))
    val hof = aggregate(
      zip_with($"va", $"vb",
        (x, y) => floor(x.cast("double") * y.cast("double") * 1e9).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val diffs = pairs.select(
      Similarity.qdot($"va", $"vb").as("native"), hof.as("composed"),
    ).filter($"native" =!= $"composed").count()
    assert(diffs == 0)
    // null propagation
    val rows = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
      .select(Similarity.qdot($"a", $"b").as("q")).collect()
    assert(rows(0).isNullAt(0))
  }

  test("registered for SQL via extensions-style builder") {
    VectorFunctions.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs").collect()(0).getDouble(0)
    assert(r == 1.0)
  }

  test("degenerate inputs yield NULL exactly like the HOF form") {
    // zip_with null-pads the shorter array and a null element poisons the
    // arithmetic fold → NULL; the native expressions must agree (they
    // previously summed the common prefix, silently breaking the
    // documented bit-for-bit equivalence)
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f), Some(2.0f), Some(9.0f)))), // length mismatch
      (None, Some(Seq(Some(1.0f)))), // null array
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))), // null element
      (Some(Seq(Some(3.0f), Some(4.0f))), Some(Seq(Some(3.0f), Some(4.0f)))), // well-formed
    ).toDF("a", "b")
    val cos = df.select(VectorFunctions.cosine_sim($"a", $"b").as("c")).collect()
    assert(cos(0).isNullAt(0))
    assert(cos(1).isNullAt(0))
    assert(cos(2).isNullAt(0))
    assert(math.abs(cos(3).getDouble(0) - 1.0) < 1e-12)
    val qd = df.select(
      graft.ops.Similarity.qdot($"a".cast("array<double>"), $"b".cast("array<double>")).as("q"))
      .collect()
    assert(qd(0).isNullAt(0))
    assert(qd(1).isNullAt(0))
    assert(qd(2).isNullAt(0))
    assert(qd(3).getLong(0) == math.floor(9.0 * 1e9).toLong + math.floor(16.0 * 1e9).toLong)
  }

  test("codegen path is exercised (no fallback to interpreted)") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfSmoke).limit(10)
    val plan = e.select(VectorFunctions.cosine_sim($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }
}
