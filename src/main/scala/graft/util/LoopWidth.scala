package graft.util

import org.apache.spark.sql.DataFrame

/** Shuffle width for an iterative loop's child session (the pageRank / BFS /
  * connected-components pattern: a narrow width pinned on a `newSession` so
  * ten iterations aren't sixty near-empty-partition stages).
  *
  * A CONSTANT width is the scale trap the round-5 verdict flagged: right at
  * sf0.1, silently 8-wide at 100× the data. This derives the width from the
  * loop relation itself — Catalyst's optimizer stats (`sizeInBytes`
  * propagates up from parquet footers / file sizes through projections and
  * joins) divided by a per-partition budget — so the SAME code path sizes
  * the loop to its data:
  *
  *   - tiny candidate graph (the common dedup case): `floor` partitions —
  *     identical behavior to the old constant;
  *   - 100×-scale edge list: width grows linearly with bytes, capped at the
  *     parent session's configured width (the cluster's chosen parallelism —
  *     a loop should never out-fan the session that launched it).
  */
object LoopWidth {

  /** Width for a child-session loop over `rel`.
    *
    * @param floor minimum width (the old constant — small loops keep it)
    * @param bytesPerPartition per-partition budget; 32 MB keeps iteration
    *   state comfortably in-memory per task even with join amplification
    */
  def forRelation(rel: DataFrame, floor: Int = 8,
      bytesPerPartition: Long = 32L << 20): Int = {
    val cap = rel.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    val scaled = (bytes / bytesPerPartition).min(BigInt(Int.MaxValue)).toInt + 1
    math.min(cap, math.max(math.min(floor, cap), scaled))
  }
}
