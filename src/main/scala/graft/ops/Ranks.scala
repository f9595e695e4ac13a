package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank — the building block for any "position in a
  * total order" operator (e04's sorted-neighborhood window, c08's
  * curriculum shards) that must NOT collapse the relation into one
  * partition the way an unpartitioned `row_number()` window does.
  *
  * Shape: range-repartition on the order key, `row_number` WITHIN each
  * range partition, then add per-partition offsets computed from a
  * (≤ numParts)-row count relation broadcast back onto the rows. One
  * range exchange + one metadata-sized broadcast, the standard
  * distributed total-order index. Correct because `RangePartitioner`
  * assigns ascending key ranges to ascending partition ids, so
  * local rank + offset of all earlier partitions IS the global rank —
  * for ANY boundary placement, including empty partitions.
  */
object Ranks {

  /** Appends a 1-based BIGINT `rnk` column ranking rows by `order`.
    *
    * `order` must be a TOTAL order over the rows (append a unique key as
    * the last column if the natural key admits ties) — with ties the
    * rank assignment inside a tie group would be partition-placement
    * dependent, which a cross-engine gate cannot tolerate.
    */
  def globalRank(df: DataFrame, numParts: Int, order: Column*): DataFrame = {
    val parts = df
      .repartitionByRange(numParts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parts.withColumn(
      "__lr",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*))
        .cast("long"))
    // ≤ numParts rows: the running-sum window over it is metadata-scale
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("rnk", col("__lr") + col("__off"))
      .drop("__pid", "__lr")
  }
}
