package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.{CosineSimilarity, MisraGries, QuantizedDot, TopKByScore}

/** graft-facing API for the native vector expressions. */
object VectorFunctions {

  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${other.length}")
  }

  val topKBuilder: Seq[Expression] => Expression = {
    case Seq(score, id, Literal(k: Int, _)) => TopKByScore(score, id, k)
    case other =>
      throw new IllegalArgumentException(
        s"top_k_by expects (score, id, k-literal), got ${other.length} args")
  }

  val misraGriesBuilder: Seq[Expression] => Expression = {
    case Seq(item, Literal(k: Int, _)) => MisraGries(item, k)
    case other =>
      throw new IllegalArgumentException(
        s"misra_gries expects (item, k-literal), got ${other.length} args")
  }

  val quantizedDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => QuantizedDot(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"quantized_dot expects 2 arguments, got ${other.length}")
  }

  /** Imperative per-session registration (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_by", topKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries", misraGriesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", quantizedDotBuilder, "built-in")
  }

  /** Column-API entry: `cosine_sim($"a", $"b")` (requires [[register]] or
    * [[GraftExtensions]] on the session).
    */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Fixed-point dot product (see [[org.apache.spark.sql.graft.QuantizedDot]]). */
  def quantized_dot(a: Column, b: Column): Column = call_function("quantized_dot", a, b)

  /** Bounded-heap per-group top-k aggregate (see
    * [[org.apache.spark.sql.graft.TopKByScore]]).
    */
  def top_k_by(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("top_k_by", score, id, lit(k))
  }

  /** Misra–Gries heavy-hitters sketch (see
    * [[org.apache.spark.sql.graft.MisraGries]]).
    */
  def misra_gries(item: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("misra_gries", item, lit(k))
  }
}

/** Session-extension registration path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — makes
  * `cosine_sim` available to pure-SQL users with documentation in
  * `DESCRIBE FUNCTION`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      VectorFunctions.cosineBuilder,
    ))
    e.injectFunction((
      FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by"),
      VectorFunctions.topKBuilder,
    ))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      VectorFunctions.misraGriesBuilder,
    ))
    e.injectFunction((
      FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      VectorFunctions.quantizedDotBuilder,
    ))
    // windowed top-k (row_number <= k) → bounded-heap aggregate, when
    // provably semantics-preserving (see WindowTopKToHeap's guards)
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.WindowTopKToHeap)
    // native as-of join: plans graft.AsOfJoin logical nodes as the
    // sort-merge-style AsOfJoinExec (one shuffle per side on its key)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    // as-of join elimination when no right-side column is referenced —
    // the custom node must not be an optimization barrier (see the rule's
    // scaladoc for the left-cardinality-preservation argument)
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.EliminateUnreferencedAsOfJoin)
  }
}
