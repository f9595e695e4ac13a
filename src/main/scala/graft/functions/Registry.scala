package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.graft.CosineSimilarity

/** graft-facing API for the native vector expressions. */
object VectorFunctions {

  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${other.length}")
  }

  /** Imperative per-session registration (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")

  /** Column-API entry: `cosine_sim($"a", $"b")` (requires [[register]] or
    * [[GraftExtensions]] on the session).
    */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

/** Session-extension registration path:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.functions.GraftExtensions` — makes
  * `cosine_sim` available to pure-SQL users with documentation in
  * `DESCRIBE FUNCTION`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      VectorFunctions.cosineBuilder,
    ))
}
