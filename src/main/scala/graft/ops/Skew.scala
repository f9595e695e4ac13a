package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.queries.Q

/** Skew-handling building blocks (SURVEY.md §8 scale notes: "skewed keys →
  * salting or AQE skew-join"). Both ops are SEMANTICALLY TRANSPARENT — their
  * oracles are the plain GROUP BY / plain JOIN, which is the point: salting
  * changes the exchange topology, never the result.
  *
  * AQE's skew-join handling covers the sort-merge case automatically at
  * runtime; explicit salting remains the tool for (a) skewed AGGREGATION
  * (AQE doesn't split hot groups) and (b) broadcast-ineligible skewed joins.
  * SkewSpec demonstrates both halves of that rule: AQE's `skew=true` split
  * on q29-shaped data, and salting's exact equivalence on the hot-group
  * aggregation AQE can't help with.
  */
object Skew {

  /** Row-deterministic salt in [0, buckets): hashed from stable row content,
    * not rand() — reruns and retries produce identical partials (a task
    * retry with rand() would double-count into different buckets).
    */
  private def salt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Two-phase salted sum/count: groupBy(key, salt) → groupBy(key).
    * The hot key's rows split across `buckets` reducers in phase 1; phase 2
    * combines `buckets` partials per key — its input is |keys|×buckets rows,
    * never row-scale. Decimal partials keep the re-association exact.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltSource: Seq[Column],
      buckets: Int): DataFrame =
    df
      .groupBy(key.as("k"), salt(saltSource, buckets).as("__salt"))
      .agg(
        sum(value.cast(DecimalType(18, 4))).as("partial_sum"),
        count(lit(1)).as("partial_n"),
      )
      .groupBy(col("k"))
      .agg(
        sum(col("partial_sum")).cast("double").as("total_value"),
        sum(col("partial_n")).cast("long").as("n_rows"),
      )

  /** q28 — salted aggregation over events (event_type has 5 hot values: the
    * exact shape where one reducer would own 20% of the table). Oracle: the
    * plain GROUP BY.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    saltedAgg(Tables.events(s, dir), $"event_type", $"value",
      saltSource = Seq($"event_id"), buckets = 16)
      .withColumnRenamed("k", "event_type")
      .orderBy($"event_type")
  }

  val q28Oracle: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
      |  COUNT(*) AS n_rows
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted equi-join: the big (skewed) side gets a row-hash salt; the small
    * side is replicated `buckets`× via explode so every (key, salt) bucket
    * finds its match. Result ≡ plain join; the hot key's probe rows now
    * spread over `buckets` tasks instead of one straggler.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column, smallKey: Column,
      bigSaltSource: Seq[Column], buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(bigSaltSource, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicatedSmall,
      bigKey === smallKey && saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** q29 — salted join lineitem ⋈ orders-subset, aggregated per status.
    * Oracle: the plain join (salting is invisible in the result).
    */
  def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_totalprice" > 300000.0)
      .select($"o_orderkey", $"o_orderstatus")
    saltedJoin(li, o, $"l_orderkey", $"o_orderkey",
      bigSaltSource = Seq($"l_orderkey", $"l_linenumber"), buckets = 8)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_lines"),
        sum($"l_quantity".cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
      )
      .orderBy($"o_orderstatus")
  }

  val q29Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 300000.0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q28_salted_agg", q28, Some(q28Oracle)),
    Q("q29_salted_join", q29, Some(q29Oracle)),
  )
}
