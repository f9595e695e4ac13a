// Lives under org.apache.spark.sql (like CosineSimilarity/TopKByScore) for
// the private[sql] catalyst surfaces; source sits in graft/plans/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: windowed top-k → bounded-heap aggregate.
  *
  * The pattern `row_number() OVER (PARTITION BY p ORDER BY s DESC, i ASC)`
  * filtered to `rn <= k` shuffles and sorts EVERY candidate row to keep k
  * per group. When it fires, this rule replaces the Window + Filter with
  * `top_k_by(s, i, k)` (a [[TopKByScore]] aggregate whose partial buffers
  * hold ≤ k entries) followed by posexplode — the exchange then carries
  * k·tasks rows per group instead of the whole scored relation, and
  * `rn = pos + 1` reproduces the row number because the heap's output array
  * is sorted by exactly the window's (s DESC, i ASC) order.
  *
  * The rewrite fires ONLY when it is provably semantics-preserving:
  *   - single window expression, `row_number` (any frame is accepted —
  *     row_number ignores its frame);
  *   - ORDER BY is exactly (DOUBLE attr DESC, BIGINT attr ASC) with a
  *     NON-NULLABLE score: the heap drops null scores, row_number ranks
  *     them, so nullable scores must keep the window;
  *   - partition keys are plain attributes;
  *   - every output column is reconstructable from
  *     partition ∪ {score, id, rn} — anything else keeps the window.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) and usable ad hoc through
  * `spark.experimental.extraOptimizations`. Output attribute ids are
  * preserved, so parent plan nodes are untouched.
  */
object WindowTopKToHeap extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(f, cond, w).getOrElse(f)
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      tryRewrite(f, cond, w).getOrElse(f)
  }

  private def tryRewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    // rn <= k (or rn < k+1) against an integer literal
    val (rnRef, k) = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => (a, k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => (a, k - 1)
      case _ => return None
    }
    if (k <= 0) return None
    val (rnOut, spec) = w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(RowNumber(), s: WindowSpecDefinition), _)) =>
        (al.toAttribute, s)
      case _ => return None
    }
    if (rnOut.exprId != rnRef.exprId) return None
    val partitionAttrs = spec.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val (score, id) = spec.orderSpec match {
      case Seq(SortOrder(s: AttributeReference, Descending, _, _),
            SortOrder(i: AttributeReference, Ascending, _, _)) => (s, i)
      case _ => return None
    }
    if (score.dataType != DoubleType || score.nullable) return None
    if (id.dataType != LongType || id.nullable) return None
    val reconstructable =
      (partitionAttrs :+ score :+ id :+ rnOut).map(_.exprId).toSet
    if (!f.output.forall(a => reconstructable.contains(a.exprId))) return None

    // Spark's InferWindowGroupLimit may already have inserted a per-group
    // pre-limit below the window; it is subsumed by the heap but would
    // drag its required sort + exchange along — strip it when it matches
    val aggChild = w.child match {
      case WindowGroupLimit(ps, os, RowNumber(), limit, c)
          if limit >= k && ps == spec.partitionSpec && os == spec.orderSpec => c
      case c => c
    }
    val topAlias = Alias(TopKByScore(score, id, k).toAggregateExpression(), "__top")()
    val agg = Aggregate(partitionAttrs, partitionAttrs :+ topAlias, aggChild)
    val pos = AttributeReference("__pos", IntegerType, nullable = false)()
    val entry = AttributeReference("__entry",
      TopKByScore(score, id, k).dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType, nullable = false)()
    val gen = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pos, entry), child = agg)
    val rebuilt: Map[ExprId, NamedExpression] =
      partitionAttrs.map(a => a.exprId -> (a: NamedExpression)).toMap ++ Map(
        score.exprId -> Alias(GetStructField(entry, 0, Some("score")), score.name)(exprId = score.exprId),
        id.exprId -> Alias(GetStructField(entry, 1, Some("id")), id.name)(exprId = id.exprId),
        rnOut.exprId -> Alias(Add(pos, Literal(1)), rnOut.name)(exprId = rnOut.exprId),
      )
    Some(Project(f.output.map(a => rebuilt(a.exprId)), gen))
  }
}
