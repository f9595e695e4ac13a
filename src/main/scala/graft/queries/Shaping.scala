package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.util.Exact._

/** Row-shaping coverage (SURVEY.md §2.2/2.3/2.7): projection+filter, top-k,
  * pagination, union, explode, null-guard arithmetic.
  */
object Shaping {

  /** q03 — filter + projection + aliasing + date formatting (P1-P5, F14,
    * F16). All three predicates and the 4-column projection reach the
    * parquet scan (PushedFilters / ReadSchema) — the scan never materializes
    * untouched columns.
    */
  def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R" && $"l_quantity" >= 45.0 &&
        $"l_shipdate" >= lit("2000-01-01").cast("timestamp"))
      .select(
        $"l_orderkey".as("orderkey"),
        $"l_linenumber".as("linenumber"),
        $"l_quantity".as("qty"),
        $"l_extendedprice".as("price"),
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_day"),
      )
      .orderBy($"orderkey", $"linenumber")
  }

  val q03Oracle: String =
    """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
      |  l_quantity AS qty, l_extendedprice AS price,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity >= 45.0
      |  AND l_shipdate >= TIMESTAMP '2000-01-01'
      |ORDER BY orderkey, linenumber""".stripMargin

  /** q13 — top-k by measure (O2: ORDER BY … DESC LIMIT at
    * app/routes/data.py:273-298 → TakeOrderedAndProject: each task keeps a
    * k-row heap, driver merges k×tasks rows — no global sort at any scale).
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  val q13Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q14 — keyset-free pagination (O3: LIMIT/OFFSET, app/routes/data.py:110-121).
    * OFFSET over a total order; fine for UI pages — at deep offsets on huge
    * data prefer keyset pagination (WHERE key > last_seen LIMIT n), which this
    * plan shape also supports via the q03 filter path.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice")
      .orderBy($"o_orderkey")
      .offset(100)
      .limit(20)
  }

  val q14Oracle: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
      |FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin

  /** q69 — pagination/count CONSISTENCY contract (SURVEY §7 hard-part 5,
    * gated): the page rows AND the pagination envelope (total_rows,
    * total_pages) from ONE base relation definition, so the two can never
    * drift — the serving layer's A3 count and O3 page are spec+e2e only;
    * this pins the combined contract with a hash. The SAME `base` val
    * feeds both the ordered offset/limit page and the count aggregate: a
    * filter change that touched one but not the other is structurally
    * impossible.
    *
    * Scale shape: the page side is a global-sort LIMIT (top-(offset+k)
    * heap per task, driver merges — offset+k rows, never a full sort);
    * the count side is a partial+final 1-row aggregate; they meet in a
    * broadcast of the 1-row envelope across the ≤ pageSize page rows
    * (PlanSweepSpec whitelist: both nested-loop sides bounded by
    * construction). total_pages uses integer ceil arithmetic — exact in
    * both engines.
    */
  def q69(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pageSize = 20
    val pageNum = 6 // rows 101-120 of the ordered, filtered relation
    val base = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "O")
      .select($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice")
    val envelope = base
      .agg(count(lit(1)).as("total_rows"))
      .select($"total_rows",
        floor(($"total_rows" + lit(pageSize - 1)) / lit(pageSize))
          .cast("long").as("total_pages"))
    base
      .orderBy($"o_orderkey")
      .offset((pageNum - 1) * pageSize)
      .limit(pageSize)
      .crossJoin(broadcast(envelope))
      .orderBy($"o_orderkey")
  }

  val q69Oracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |         o_totalprice
      |  FROM orders WHERE o_orderstatus = 'O'),
      |envelope AS (
      |  SELECT COUNT(*) AS total_rows,
      |         CAST(FLOOR((COUNT(*) + 19) / 20.0) AS BIGINT) AS total_pages
      |  FROM base)
      |SELECT o_orderkey, order_date, o_totalprice, total_rows, total_pages
      |FROM (SELECT * FROM base ORDER BY o_orderkey LIMIT 20 OFFSET 100) p
      |CROSS JOIN envelope
      |ORDER BY o_orderkey""".stripMargin

  /** q72 — KEYSET pagination (the scale-correct deep-page form q14's own
    * scaladoc promises): `WHERE key > last_seen ORDER BY key LIMIT n` on
    * q69's base relation. Unlike OFFSET — which must produce and discard
    * offset rows however deep the page — the keyset predicate reaches the
    * parquet scan as a pushed filter (min/max pruning skips whole row
    * groups below last_seen) and the LIMIT is a per-task top-k heap, so
    * page cost is O(page), not O(offset + page), at any depth. Same
    * filter + projection as q69 so the two pagination contracts are
    * pinned against the same relation.
    */
  def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lastSeen = 400L // the key the previous page ended on
    Tables.orders(s, dir)
      .filter($"o_orderstatus" === "O" && $"o_orderkey" > lastSeen)
      .select($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice")
      .orderBy($"o_orderkey")
      .limit(20)
  }

  val q72Oracle: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |       o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'O' AND o_orderkey > 400
      |ORDER BY o_orderkey LIMIT 20""".stripMargin

  /** q15 — unionByName of two branch projections (O6: app/etl.py:108). */
  def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val building = c.filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name", lit("segment_building").as("src"))
    val negative = c.filter($"c_acctbal" < 0.0)
      .select(lit("negative_balance").as("src"), $"c_name", $"c_custkey")
    building.unionByName(negative)
      .orderBy($"src", $"c_custkey")
  }

  val q15Oracle: String =
    """SELECT c_custkey, c_name, 'segment_building' AS src
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey, c_name, 'negative_balance' AS src
      |FROM customer WHERE c_acctbal < 0.0
      |ORDER BY src, c_custkey""".stripMargin

  /** q16 — split + explode + count (G1/F5: the VACCINES_USED
    * split/explode at app/etl.py:135-137). Generator output feeds a
    * partial+final agg, so the exploded rows never shuffle — only the
    * (token, partial count) pairs do.
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(explode(split($"p_name", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(10)
  }

  val q16Oracle: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
      |GROUP BY token ORDER BY n DESC, token LIMIT 10""".stripMargin

  /** q19 — null-guard arithmetic: COALESCE / NULLIF / ROUND / casts
    * (F9-F13: Grafana panel 6/10 SQL, app/routes/data.py:357-358).
    * Division happens in double (identical IEEE both engines), rounding in
    * decimal (identical HALF_UP both engines for positive values).
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val discNonZero = when($"l_discount" =!= 0.0, $"l_discount") // NULLIF(l_discount, 0)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        sum(round(($"l_extendedprice".cast(DecimalType(18, 4)) *
          (lit(1) - $"l_discount").cast(DecimalType(18, 4))), 2))
          .cast("double").as("sum_disc_price_2dp"),
        count(when($"l_discount" === 0.0, lit(1))).as("n_zero_disc"),
        sum(($"l_extendedprice" / discNonZero).cast(DecimalType(28, 4)))
          .cast("double").as("price_per_disc"),
        coalesce(max(when($"l_discount" === 0.0, $"l_extendedprice")), lit(0.0))
          .as("max_nodisc_price"),
      )
      .orderBy($"l_returnflag")
  }

  val q19Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)), 2)) AS DOUBLE) AS sum_disc_price_2dp,
      |  COUNT(CASE WHEN l_discount = 0.0 THEN 1 END) AS n_zero_disc,
      |  CAST(SUM(CAST(l_extendedprice / NULLIF(l_discount, 0) AS DECIMAL(28,4))) AS DOUBLE) AS price_per_disc,
      |  COALESCE(MAX(CASE WHEN l_discount = 0.0 THEN l_extendedprice END), 0.0) AS max_nodisc_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q27 — INTERSECT / EXCEPT (beyond-reference completeness: SURVEY.md
    * §2.7 notes the reference has neither). Both are hash-dedup set ops on
    * the projected key only.
    */
  def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val positive = c.filter($"c_acctbal" > 0.0).select($"c_custkey")
    building.intersect(positive).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect"))
      .unionByName(
        building.except(positive).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except")))
      .select($"op", $"n")
      .orderBy($"op")
  }

  val q27Oracle: String =
    """SELECT 'intersect' AS op, COUNT(*) AS n FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 0.0)
      |UNION ALL
      |SELECT 'except' AS op, COUNT(*) AS n FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 0.0)
      |ORDER BY op""".stripMargin

  /** q37 — positional explode: per-customer top-3 order totals as
    * (pos, value) rows (posexplode ≡ DuckDB unnest + generate_subscripts).
    * Collect → sort → slice bounds the per-group array at 3 before the
    * generator, so no group ever materializes more than k values downstream.
    */
  def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_custkey" < 20)
      .groupBy($"o_custkey")
      .agg(slice(sort_array(collect_list($"o_totalprice"), asc = false), 1, 3).as("top3"))
      .select($"o_custkey", posexplode($"top3").as(Seq("pos", "total")))
      .orderBy($"o_custkey", $"pos")
  }

  val q37Oracle: String =
    """WITH top3 AS (
      |  SELECT o_custkey, list_slice(list_sort(list(o_totalprice), 'DESC'), 1, 3) AS l
      |  FROM orders WHERE o_custkey < 20 GROUP BY o_custkey)
      |SELECT o_custkey, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS total
      |FROM top3 ORDER BY o_custkey, pos""".stripMargin

  /** q47 — unpivot/melt (inverse of q34's pivot): wide per-year measures to
    * long (yr, measure, value) form — the reshape every metrics store needs
    * in both directions. Spark's native `unpivot` (Expand under the hood —
    * no join, no union of self-scans) against DuckDB's UNPIVOT. Measures
    * are cast to double on both sides (counts are exactly representable;
    * sums ride the Exact decimal path first).
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"))
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        dsum($"o_totalprice").as("sum_total"),
        max($"o_totalprice").as("max_total"),
      )
      .unpivot(
        ids = Array($"yr"),
        values = Array($"n_orders", $"sum_total", $"max_total"),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy($"yr", $"measure")
  }

  val q47Oracle: String =
    """WITH wide AS (
      |  SELECT year(o_orderdate) AS yr,
      |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
      |    MAX(o_totalprice) AS max_total
      |  FROM orders GROUP BY 1)
      |SELECT * FROM wide UNPIVOT (value FOR measure IN (n_orders, sum_total, max_total))
      |ORDER BY yr, measure""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q03_filter_project", q03, Some(q03Oracle)),
    Q("q13_topk_orders", q13, Some(q13Oracle)),
    Q("q14_pagination", q14, Some(q14Oracle)),
    Q("q69_pagination_envelope", q69, Some(q69Oracle)),
    Q("q72_keyset_pagination", q72, Some(q72Oracle)),
    Q("q15_union_branches", q15, Some(q15Oracle)),
    Q("q16_explode_tokens", q16, Some(q16Oracle)),
    Q("q19_null_guards", q19, Some(q19Oracle)),
    Q("q27_set_ops", q27, Some(q27Oracle)),
    Q("q37_posexplode_topk", q37, Some(q37Oracle)),
    Q("q47_unpivot_melt", q47, Some(q47Oracle)),
  )
}
