// The Expression subclass lives under org.apache.spark.sql so it can use the
// private[sql] typing API (AbstractDataType / ExpectsInputTypes) — the
// standard packaging for out-of-tree Catalyst extensions. The graft-facing
// API is the `graft.functions.VectorFunctions` object below.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native cosine similarity over two ARRAY<FLOAT> columns.
  *
  * A custom Catalyst `Expression` with `doGenCode` (SURVEY.md §4 preference
  * order: built-ins < custom Expression < custom operator): the
  * `zip_with`+`aggregate` formulation allocates an intermediate array and
  * interprets a lambda per element; this compiles to a single fused loop
  * inside whole-stage codegen — no allocation, no virtual calls.
  *
  * Arithmetic contract: dot and both norms accumulate independently,
  * strictly left-to-right in double — bit-identical to the composed
  * `aggregate(zip_with(...))` form AND to the DuckDB oracle's ordered SUMs
  * (s01's correctness gate), so swapping implementations can never change a
  * result. The equivalence extends to the degenerate inputs: mismatched
  * lengths or a null element yield NULL, exactly as `zip_with` (which
  * null-pads the shorter array) composed with an arithmetic fold would.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // nullable even over non-null children: degenerate arrays produce NULL
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $nx = 0.0;
         |  double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $nx += $xi * $xi;
         |    $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixed-point dot product over two ARRAY<DOUBLE> columns:
  * Σ floor(aᵢ·bᵢ·10⁹) as BIGINT.
  *
  * The cross-engine-deterministic complement to [[CosineSimilarity]]: each
  * per-element term rounds identically in any IEEE engine, and the integer
  * sum is ASSOCIATIVE — so an oracle can recompute it with a plain
  * (parallel, unordered) SUM instead of the per-group sort an ordered
  * double fold forces. Used by the semantic-dedup pair stage
  * (graft.ops.Similarity.qdot), where the `aggregate(zip_with(...))`
  * formulation was measured ~10× slower: higher-order functions interpret
  * a lambda per element and allocate the zipped array per row, and they
  * fall out of whole-stage codegen; this compiles to one fused loop.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  // nullable even over non-null children: degenerate arrays produce NULL,
  // matching the zip_with(+null-pad) + aggregate(+null-propagate) form —
  // a truncated min-length sum would silently claim the equivalence while
  // returning garbage on malformed embeddings
  override def nullable: Boolean = true

  override def prettyName: String = "quantized_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getDouble(i) * y.getDouble(i) * 1e9).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) java.lang.Math.floor(
         |      $a.getDouble($i) * $b.getDouble($i) * 1.0E9);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
