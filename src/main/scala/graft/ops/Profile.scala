package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Column profiling — the data-quality sweep a training-data pipeline runs
  * before anything else (null rates, cardinalities, ranges). One aggregation
  * pass computes every column's stats simultaneously (4 aggregates ×
  * columns in a single partial+final HashAggregate — never one job per
  * column), then unpivots to the long (column, stat…) form.
  */
object Profile {

  /** Profile the given columns of a frame: one row per column with
    * null_count, n_distinct (exact), min/max rendered as strings.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val asRows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__nulls_$c").as("null_count"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
      )
    }
    wide
      .select(explode(array(asRows: _*)).as("p"))
      .select("p.col_name", "p.null_count", "p.n_distinct", "p.min_value", "p.max_value")
      .orderBy("col_name")
  }

  /** q35 — profile of the orders table's key columns. */
  def q35(s: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(s, dir),
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))

  val q35Oracle: String =
    """SELECT * FROM (
      |  SELECT 'o_custkey' AS col_name, COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_count,
      |    COUNT(DISTINCT o_custkey) AS n_distinct,
      |    CAST(MIN(o_custkey) AS VARCHAR) AS min_value, CAST(MAX(o_custkey) AS VARCHAR) AS max_value
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_totalprice),
      |    CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
      |    COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
      |) ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------------------
  // dq01 — declarative expectations suite (Deequ-style constraint checks)
  // ---------------------------------------------------------------------

  /** Scalar constraint over one table: one aggregation pass counting rows
    * that violate `violation`. No shuffle beyond the final 1-row agg —
    * partial counts collapse map-side, so the check costs one scan at any
    * scale (and multiple checks on the same table can share that scan via
    * one fused agg; kept separate here for per-check clarity).
    */
  def scalarCheck(name: String, df: DataFrame, violation: org.apache.spark.sql.Column): DataFrame =
    df.agg(
      count(when(violation, lit(1))).as("n_violations"),
      count(lit(1)).as("n_checked"),
    ).select(lit(name).as("check_name"), col("n_violations"), col("n_checked"),
      (col("n_violations") === 0).as("passed"))

  /** Key-uniqueness constraint: violations = rows beyond one per key. */
  def uniqueCheck(name: String, df: DataFrame, key: String): DataFrame =
    df.agg(
      (count(lit(1)) - countDistinct(col(key))).as("n_violations"),
      count(lit(1)).as("n_checked"),
    ).select(lit(name).as("check_name"), col("n_violations"), col("n_checked"),
      (col("n_violations") === 0).as("passed"))

  /** Referential-integrity constraint: child rows whose key has no parent.
    * left_anti on the key — at scale the parent side ships only its key
    * column, broadcast when it is a dim; the count partial-aggregates so
    * nothing but the violating keys' tallies crosses the wire.
    */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val viol = child.join(parent.select(col(parentKey)),
        child(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val tot = child.agg(count(lit(1)).as("n_checked"))
    viol.crossJoin(tot)
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"),
        (col("n_violations") === 0).as("passed"))
  }

  /** dq01 — the pre-training data-quality audit as ONE queryable relation:
    * pk uniqueness, FK integrity across the star schema, domain ranges,
    * null contracts, and a content-consistency invariant
    * (n_chars == length(text)). One row per constraint with the violation
    * count, so the pipeline can gate ingestion on `passed` and alert on the
    * delta. The `discount_le_5pct` check is a deliberately tight threshold
    * that FAILS on this data — the suite must prove it reports violations,
    * not just echo green. Each check is a single scan (+ an anti-join for
    * FKs); checks on different tables parallelize as independent jobs.
    */
  def dq01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val events = Tables.events(s, dir)
    val documents = Tables.documents(s, dir)
    val checks = Seq(
      uniqueCheck("customer_pk_unique", customer, "c_custkey"),
      fkCheck("orders_fk_customer", orders, "o_custkey", customer, "c_custkey"),
      fkCheck("lineitem_fk_orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      scalarCheck("orders_totalprice_positive", orders, $"o_totalprice" <= 0),
      scalarCheck("lineitem_discount_unit_range", lineitem,
        !$"l_discount".between(0.0, 1.0)),
      scalarCheck("lineitem_discount_le_5pct", lineitem, $"l_discount" > 0.05),
      scalarCheck("events_value_nonnull", events, $"value".isNull),
      scalarCheck("documents_nchars_consistent", documents,
        $"n_chars" =!= length($"text")),
    )
    checks.reduce(_ unionByName _).orderBy($"check_name")
  }

  val dq01Oracle: String =
    """SELECT * FROM (
      |  SELECT 'customer_pk_unique' AS check_name,
      |    COUNT(*) - COUNT(DISTINCT c_custkey) AS n_violations,
      |    COUNT(*) AS n_checked,
      |    COUNT(*) - COUNT(DISTINCT c_custkey) = 0 AS passed FROM customer
      |  UNION ALL
      |  SELECT 'orders_fk_customer',
      |    COUNT(CASE WHEN c_custkey IS NULL THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) = 0
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders',
      |    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 'orders_totalprice_positive',
      |    COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0 FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_discount_unit_range',
      |    COUNT(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 END) = 0 FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_discount_le_5pct',
      |    COUNT(CASE WHEN l_discount > 0.05 THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) = 0 FROM lineitem
      |  UNION ALL
      |  SELECT 'events_value_nonnull',
      |    COUNT(CASE WHEN value IS NULL THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN value IS NULL THEN 1 END) = 0 FROM events
      |  UNION ALL
      |  SELECT 'documents_nchars_consistent',
      |    COUNT(CASE WHEN n_chars <> length(text) THEN 1 END), COUNT(*),
      |    COUNT(CASE WHEN n_chars <> length(text) THEN 1 END) = 0 FROM documents
      |) ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------------
  // dq02 — snapshot drift: per-bin distribution shift between two windows
  // ---------------------------------------------------------------------

  /** dq02 — distribution drift between two ingest windows, the
    * "did this week's data move under us" check that gates every refresh
    * of a 100 TB corpus. The reference window (orders before 1998) and the
    * current window (1999 onward) are histogrammed on the SAME fixed-width
    * bins (10 × 50k over o_totalprice — fixed edges, not quantiles, so the
    * binning is deterministic and needs no second pass), and each bin
    * reports both windows' counts, each window's share in integer PARTS
    * PER MILLION, and the absolute per-bin shift. Σ drift_ppm / 2e6 is the
    * total-variation distance; PSI is Σ (Δshare · ln-ratio) over the same
    * relation — the gate stops at exact integer ppm because `ln` is not
    * bit-portable across engines (correct rounding is not guaranteed by
    * either), while counts, IEEE-exact division, and HALF_UP rounding are.
    *
    * Shape at scale: the two windows are RANGE predicates on the sort/
    * partition column (date literals, not `year()`, precisely so they push
    * into the parquet scan / prune date partitions), one conditional
    * aggregation computes both histograms in a single pass (partial
    * map-side combine → 10 groups), and the share normalization is a
    * window over the 10-row aggregate. Cost = one pruned scan regardless
    * of corpus size.
    */
  def dq02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val refEnd   = lit("1998-01-01").cast("timestamp")
    val curStart = lit("1999-01-01").cast("timestamp")
    val binned = Tables.orders(s, dir)
      .filter($"o_orderdate" < refEnd || $"o_orderdate" >= curStart)
      .select(
        least(floor($"o_totalprice" / 50000), lit(9L)).cast("long").as("bin_id"),
        ($"o_orderdate" < refEnd).as("is_ref"))
    val everything = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    binned
      .groupBy($"bin_id")
      .agg(
        count(when($"is_ref", lit(1))).as("ref_count"),
        count(when(!$"is_ref", lit(1))).as("cur_count"))
      .withColumn("ref_ppm",
        round(lit(1e6) * $"ref_count" / sum($"ref_count").over(everything)).cast("long"))
      .withColumn("cur_ppm",
        round(lit(1e6) * $"cur_count" / sum($"cur_count").over(everything)).cast("long"))
      .withColumn("drift_ppm", abs($"cur_ppm" - $"ref_ppm"))
      .orderBy($"bin_id")
  }

  val dq02Oracle: String =
    """WITH binned AS (
      |  SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bin_id,
      |         o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
      |  FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |     OR o_orderdate >= TIMESTAMP '1999-01-01'
      |), agg AS (
      |  SELECT bin_id,
      |         COUNT(CASE WHEN is_ref THEN 1 END) AS ref_count,
      |         COUNT(CASE WHEN NOT is_ref THEN 1 END) AS cur_count
      |  FROM binned GROUP BY bin_id
      |), shares AS (
      |  SELECT bin_id, ref_count, cur_count,
      |    CAST(ROUND(1e6 * ref_count / CAST(SUM(ref_count) OVER () AS DOUBLE)) AS BIGINT) AS ref_ppm,
      |    CAST(ROUND(1e6 * cur_count / CAST(SUM(cur_count) OVER () AS DOUBLE)) AS BIGINT) AS cur_ppm
      |  FROM agg
      |)
      |SELECT bin_id, ref_count, cur_count, ref_ppm, cur_ppm,
      |  ABS(cur_ppm - ref_ppm) AS drift_ppm
      |FROM shares ORDER BY bin_id""".stripMargin

  /** q48 — winsorization (percentile clipping), the outlier treatment a
    * feature pipeline applies before scaling: clamp each group's values
    * into [p05, p95] and report the clip counts + the exact sum of the
    * clipped column. Two passes over the fact (quantile agg, then clip) —
    * the bounds relation is group-cardinality-sized and broadcasts, so the
    * clip pass is a map-side projection with no fact shuffle before the
    * final summary agg. The 100 TB variant swaps the exact `percentile`
    * for the q46 t-digest sketch; the clip/apply topology is unchanged.
    */
  def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.util.Exact.dsum
    val li = Tables.lineitem(s, dir)
    val bounds = li.groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.05)).as("lo"),
        percentile($"l_extendedprice", lit(0.95)).as("hi"))
    val clipped = when($"l_extendedprice" < $"lo", $"lo")
      .when($"l_extendedprice" > $"hi", $"hi")
      .otherwise($"l_extendedprice")
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(
        count(when($"l_extendedprice" < $"lo", lit(1))).as("n_clipped_low"),
        count(when($"l_extendedprice" > $"hi", lit(1))).as("n_clipped_high"),
        count(lit(1)).as("n_rows"),
        dsum(clipped).as("sum_winsorized"),
      )
      .orderBy($"l_returnflag")
  }

  val q48Oracle: String =
    """WITH b AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS lo,
      |    quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag,
      |  COUNT(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_clipped_low,
      |  COUNT(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_clipped_high,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(CASE WHEN l_extendedprice < lo THEN lo
      |                     WHEN l_extendedprice > hi THEN hi
      |                     ELSE l_extendedprice END AS DECIMAL(18,4))) AS DOUBLE)
      |    AS sum_winsorized
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q56 — z-score outlier detection per group, in EXACT integer
    * arithmetic: quantize to cents (round(v·100) — associative BIGINT
    * sums), then test (q·n − Σq)² > 9·(n·Σq² − (Σq)²), which is
    * |q − μ| > 3σ with both sides multiplied by n² — no float mean, no
    * float variance, no per-engine reassociation anywhere. Two passes:
    * one aggregation to (n, Σq, Σq²) per group (5 rows, broadcast), one
    * scan counting violations against the broadcast stats — the shape of
    * every streaming-friendly anomaly sweep. Magnitudes: (q·n)² here is
    * ≤ ~10¹⁸ (fits BIGINT, and DuckDB errors loudly on overflow rather
    * than wrapping); at corpus scales beyond ~10⁵ rows/group the same
    * query runs in DECIMAL(38,0).
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = round($"value" * 100).cast("long")
    val ev = Tables.events(s, dir).select($"event_type", qv.as("q"))
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"q").as("sq"), sum($"q" * $"q").as("sq2"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select($"event_type", $"q", $"n", $"sq", $"sq2",
        (($"q" * $"n" - $"sq") * ($"q" * $"n" - $"sq") >
          lit(9L) * ($"n" * $"sq2" - $"sq" * $"sq")).as("is_outlier"))
      .groupBy($"event_type")
      .agg(
        first($"n").as("n"),
        (first($"sq").cast("double") / 100.0 / first($"n")).as("mean_value"),
        count(when($"is_outlier", lit(1))).as("n_outliers"),
      )
      .orderBy($"event_type")
  }

  val q56Oracle: String =
    """WITH ev AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS q FROM events),
      |stats AS (SELECT event_type, COUNT(*) AS n, SUM(q) AS sq, SUM(q * q) AS sq2
      |          FROM ev GROUP BY event_type)
      |SELECT ev.event_type, MIN(n) AS n,
      |  CAST(MIN(sq) AS DOUBLE) / 100.0 / MIN(n) AS mean_value,
      |  COUNT(CASE WHEN (q * n - sq) * (q * n - sq) > 9 * (n * sq2 - sq * sq)
      |             THEN 1 END) AS n_outliers
      |FROM ev JOIN stats USING (event_type)
      |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin

  /** q57 — scan-less global statistics: MIN/MAX/COUNT answered from the
    * parquet FOOTERS via Spark's aggregate pushdown (`PushedAggregation`
    * in the scan node — asserted by PlanSpec). At 100 TB this is the
    * difference between reading one row-group footer per file and a
    * full-table scan; it is how a pipeline stamps freshness/extent
    * metadata on every ingest without paying for a pass. The V2 parquet
    * reader path and the pushdown flag live on a child session (the
    * engine's no-shared-conf-mutation rule); the result is the child's
    * DataFrame — nothing downstream joins it, so it never re-homes.
    */
  def q57(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // parquet must leave the V1 source list for DSv2 aggregate pushdown
    ss.conf.set("spark.sql.sources.useV1SourceList",
      "avro,csv,json,kafka,orc,text")
    import ss.implicits._
    // integer key extents + row count: the types parquet stores exact
    // row-group statistics for (timestamp columns are excluded from
    // pushdown by Spark — their footer stats are not trustworthy across
    // writers)
    ss.read.parquet(s"$dir/lineitem.parquet")
      .agg(
        min($"l_orderkey").as("min_orderkey"),
        max($"l_orderkey").as("max_orderkey"),
        min($"l_partkey").as("min_partkey"),
        max($"l_partkey").as("max_partkey"),
        count(lit(1)).as("n_rows"))
  }

  val q57Oracle: String =
    """SELECT MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
      |  MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
      |  COUNT(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** gv01 — ERASURE BLAST-RADIUS audit (the right-to-be-forgotten report
    * a governed pipeline produces before executing a delete/pseudonymize
    * pass): per event_type, how many rows and distinct users an erasure
    * cohort touches, plus the PSEUDONYMIZATION PARITY facts — the
    * deterministic md5 pseudonym is injective on the cohort
    * (distinct pseudonyms == distinct forgotten users) and never echoes a
    * raw id. The cohort here is a pure hash rule (~5% of users, the
    * q38/c05 engine-portable md5 bucket) so the oracle recomputes
    * membership exactly; a production run swaps in an erasure-request
    * table via a broadcast semi-join with the same downstream audit.
    *
    * Scale shape: ONE pass over the fact — the cohort predicate and
    * pseudonym are per-row hash expressions (no lookup state), and all
    * five measures are conditional aggregates that partial-aggregate
    * map-side; nothing user-cardinality crosses the wire beyond the
    * per-type distinct counts Spark already shuffles for count_distinct.
    */
  def gv01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val forget = conv(substring(md5(concat(lit("forget:"), $"user_id".cast("string"))), 1, 4), 16, 10)
      .cast("long") % 100 < 5
    val pseud = md5(concat(lit("pseud:"), $"user_id".cast("string")))
    Tables.events(s, dir)
      .select($"event_type", $"user_id", forget.as("f"), pseud.as("p"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_total"),
        count(when($"f", 1)).as("n_affected"),
        countDistinct(when($"f", $"user_id")).as("n_forget_users"),
        countDistinct(when($"f", $"p")).as("n_pseudonyms"),
        count(when($"f" && $"p" === $"user_id".cast("string"), 1)).as("n_raw_leaks"),
      )
      .orderBy($"event_type")
  }

  val gv01Oracle: String =
    """SELECT event_type,
      |  COUNT(*) AS n_total,
      |  COUNT(CASE WHEN f THEN 1 END) AS n_affected,
      |  COUNT(DISTINCT CASE WHEN f THEN user_id END) AS n_forget_users,
      |  COUNT(DISTINCT CASE WHEN f THEN p END) AS n_pseudonyms,
      |  COUNT(CASE WHEN f AND p = CAST(user_id AS VARCHAR) THEN 1 END) AS n_raw_leaks
      |FROM (
      |  SELECT event_type, user_id,
      |    ('0x' || substring(md5('forget:' || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 5 AS f,
      |    md5('pseud:' || CAST(user_id AS VARCHAR)) AS p
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** k for [[gv02]]'s k-anonymity audit: the conventional "fewer than 5
    * indistinguishable rows is re-identifiable" floor.
    */
  val AnonK = 5

  /** gv02 — K-ANONYMITY audit (Sweeney 2002): before releasing a
    * projection of the customer table, report whether every
    * quasi-identifier equivalence class — (nation, market segment,
    * account-balance band) — has at least [[AnonK]] indistinguishable
    * members. The output is the CLASS-SIZE HISTOGRAM with a below-k flag
    * per row: min(class_size) is the k the release actually achieves,
    * the below_k rows quantify exactly how many customers are
    * re-identifiable and at what class sizes. The governance sibling of
    * gv01: gv01 scopes erasure, gv02 scopes disclosure.
    *
    * Scale shape: one partial-aggregated groupBy on the QI tuple (the
    * class build), then a histogram on class size — output cardinality is
    * the distinct-class-size count (≤ a few hundred whatever the fact
    * size; the c05/tc01 "aggregate once, bucket tiny" recipe). The
    * balance band is floor(x/1000) over binary64 — IEEE division and
    * floor are correctly rounded, so both engines band identically.
    */
  def gv02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy(
        $"c_nationkey".cast("long").as("nat"),
        $"c_mktsegment".as("seg"),
        floor($"c_acctbal" / 1000.0).cast("long").as("band"))
      .agg(count(lit(1)).as("class_size"))
    classes
      .groupBy($"class_size")
      .agg(count(lit(1)).as("n_classes"), sum($"class_size").as("n_rows"))
      .select($"class_size", $"n_classes", $"n_rows",
        ($"class_size" < AnonK).as("below_k"))
      .orderBy($"class_size")
  }

  val gv02Oracle: String =
    s"""WITH classes AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
       |    CAST(COUNT(*) AS BIGINT) AS class_size
       |  FROM customer GROUP BY nat, seg, band)
       |SELECT class_size,
       |  CAST(COUNT(*) AS BIGINT) AS n_classes,
       |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
       |  class_size < $AnonK AS below_k
       |FROM classes GROUP BY class_size ORDER BY class_size""".stripMargin

  /** l for [[gv03]]'s l-diversity audit: a class whose members span fewer
    * than 3 distinct sensitive values lets an attacker who can place a
    * person in the class guess the sensitive attribute with ≥ 1/2 odds.
    */
  val DiversityL = 3

  /** gv03 — L-DIVERSITY audit (Machanavajjhala et al. 2007, "l-Diversity:
    * privacy beyond k-anonymity"): k-anonymity (gv02) only bounds CLASS
    * SIZE — a class of 50 customers all in the same market segment still
    * discloses the segment of every member. gv03 audits the complement:
    * for each quasi-identifier class — here (nation, account-balance
    * band), deliberately COARSER than gv02's triple because the sensitive
    * attribute must not sit inside its own QI — count the DISTINCT
    * sensitive values (market segment) the class spans, and report the
    * histogram of that l with a below-l flag. min(l) is the diversity the
    * release actually achieves; below-l rows are the members whose
    * sensitive attribute is effectively disclosed by class membership.
    * Completes the governance trio: gv01 scopes erasure, gv02 scopes
    * re-identification, gv03 scopes attribute disclosure.
    *
    * Scale shape: identical to gv02 — one partial-aggregated groupBy on
    * the QI tuple (count + count_distinct over a 5-value domain), then a
    * histogram keyed on (l), whose cardinality is ≤ |segment domain| = 5
    * whatever the fact size. Nothing row-cardinality survives the first
    * exchange.
    */
  def gv03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy(
        $"c_nationkey".cast("long").as("nat"),
        floor($"c_acctbal" / 1000.0).cast("long").as("band"))
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct($"c_mktsegment").as("l"))
    classes
      .groupBy($"l")
      .agg(count(lit(1)).as("n_classes"), sum($"class_size").as("n_rows"))
      .select($"l", $"n_classes", $"n_rows",
        ($"l" < DiversityL).as("below_l"))
      .orderBy($"l")
  }

  val gv03Oracle: String =
    s"""WITH classes AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
       |    CAST(COUNT(*) AS BIGINT) AS class_size,
       |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
       |  FROM customer GROUP BY nat, band)
       |SELECT l,
       |  CAST(COUNT(*) AS BIGINT) AS n_classes,
       |  CAST(SUM(class_size) AS BIGINT) AS n_rows,
       |  l < $DiversityL AS below_l
       |FROM classes GROUP BY l ORDER BY l""".stripMargin

  /** t (in ppm) for [[gv04]]: classes whose sensitive distribution sits
    * further than 0.2 total-variation from the corpus-wide one leak
    * attribute skew (the t Li et al. use in their running examples).
    */
  val ClosenessTppm = 200000L

  /** gv04 — T-CLOSENESS audit (Li, Li & Venkatasubramanian 2007):
    * l-diversity (gv03) counts distinct sensitive values but is blind to
    * SKEW — a class that is 98% AUTOMOBILE / 2% everything-else passes
    * l=5 yet still tells an attacker the segment with near certainty.
    * t-closeness bounds, per quasi-identifier class, the distance between
    * the class's sensitive-value distribution and the GLOBAL one; for a
    * categorical attribute under uniform ground distance the earth-mover
    * distance reduces to total variation, ½·Σᵢ|pᵢ−qᵢ|. Output: one row
    * per (nation, balance-band) class with its class size, its scaled
    * distance, and the above-t flag — max(tvd) over rows is the t the
    * release achieves. Closes the disclosure-audit ladder: gv02 bounds
    * WHO you might be, gv03 bounds WHAT values your class spans, gv04
    * bounds how much the class SHIFTS belief about the value.
    *
    * INTEGER-EXACT: with class counts cᵢ (size n) and global counts gᵢ
    * (size N), tvd = Σ|cᵢ·N − n·gᵢ| / (2·n·N) — the numerator is exact
    * BIGINT in both engines, published in ppm via floor division.
    *
    * Scale shape: one partial-aggregated groupBy at (QI, sensitive) grain,
    * one at QI grain, one 5-row global relation broadcast onto the class
    * list (classes × |domain| rows, still metadata-sized) so absent
    * (class, value) cells contribute their exact n·gᵢ mass without any
    * fact-scale outer join.
    */
  def gv04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qi = Seq(
      $"c_nationkey".cast("long").as("nat"),
      floor($"c_acctbal" / 1000.0).cast("long").as("band"))
    val cust = Tables.customer(s, dir)
    val cells = cust
      .groupBy(qi :+ $"c_mktsegment".as("seg"): _*)
      .agg(count(lit(1)).as("c"))
    val classes = cust.groupBy(qi: _*).agg(count(lit(1)).as("n"))
    val global = cust.groupBy($"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("g"))
    val bigN = global.agg(sum($"g").as("bign"))
    classes
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(bigN))
      .join(cells, Seq("nat", "band", "seg"), "left")
      .withColumn("c0", coalesce($"c", lit(0L)))
      .groupBy($"nat", $"band", $"n", $"bign")
      .agg(sum(abs($"c0" * $"bign" - $"n" * $"g")).as("num"))
      .select($"nat", $"band", $"n".as("class_size"),
        expr("(num * 1000000) div (2 * n * bign)").as("tvd_ppm"))
      .withColumn("above_t", $"tvd_ppm" > ClosenessTppm)
      .orderBy($"nat", $"band")
  }

  val gv04Oracle: String =
    s"""WITH cust AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
       |    c_mktsegment AS seg
       |  FROM customer),
       |cells AS (SELECT nat, band, seg, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM cust GROUP BY nat, band, seg),
       |classes AS (SELECT nat, band, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM cust GROUP BY nat, band),
       |global AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS g
       |  FROM cust GROUP BY seg),
       |bign AS (SELECT CAST(SUM(g) AS BIGINT) AS bigN FROM global)
       |SELECT nat, band, n AS class_size,
       |  CAST((SUM(abs(COALESCE(c, 0) * bigN - n * g)) * 1000000)
       |    // (2 * n * bigN) AS BIGINT) AS tvd_ppm,
       |  CAST((SUM(abs(COALESCE(c, 0) * bigN - n * g)) * 1000000)
       |    // (2 * n * bigN) AS BIGINT) > $ClosenessTppm AS above_t
       |FROM classes
       |CROSS JOIN global CROSS JOIN bign
       |LEFT JOIN cells USING (nat, band, seg)
       |GROUP BY nat, band, n, bigN
       |ORDER BY nat, band""".stripMargin

  /** 2^60 — the uniform-bits range for gv05's inverse-CDF sampling. */
  private val Pow60 = 1152921504606846976L

  /** 3·2^60 − 1, the top of gv05's scaled-CDF range. */
  private val ThreeP60m1 = 3L * Pow60 - 1L

  /** gv05 — COUNT RELEASE in the shape of the geometric mechanism:
    * per-source document counts released with two-sided geometric noise —
    * the discrete mechanism Ghosh/Roughgarden/Sundararajan 2009 prove
    * universally optimal for count queries (sensitivity 1). Completes the
    * governance ladder: gv01 scopes erasure, gv02–gv04 audit a release's
    * re-identification risk, gv05 produces the release relation.
    *
    * PRIVACY CAVEAT (round-10 advice): as gated here, the "noise" is a
    * DETERMINISTIC PUBLIC function of the released key — md5 with a
    * hard-coded prefix, no secret seed — so anyone can recompute each
    * cell's draw and invert the release back to exact counts. This is a
    * deliberate, deterministic SIMULATION of the geometric mechanism:
    * it exists so the sampler's exact integer pipeline is DuckDB-oracle-
    * gatable (a genuinely random draw can't hash-match an oracle). A
    * production deployment MUST fold a secret, non-released seed into the
    * hash (e.g. `md5(secret || key)`); with that one change the draw is
    * uniform-to-any-adversary-without-the-seed and the ε = ln 2 analysis
    * below applies as the standard "seeded DP release" posture (which
    * also hardens against averaging attacks by repeated queries).
    * Everything below — distribution shape, inverse-CDF, clamping — is
    * unchanged by the seed's secrecy.
    *
    * ε = ln 2 exactly, chosen so the noise distribution
    * P(k) = (1/3)·2^{−|k|} has DYADIC tail probabilities and inverse-CDF
    * sampling needs NO ln/exp (banned repo-wide, SURVEY.md §5.1): with a
    * 60-bit uniform U (here the recomputable md5 hash — see the caveat
    * above), let V = 3U ∈ [0, 3·2^60):
    *   - V < 2^60 (the lower third): noise = bitlen(V) − 61 ∈ [−60, −1]
    *     — the CDF at k ≤ −1 is 2^{61−|k|}/(3·2^60), so the bucket index
    *     is just V's bit length (bin(0) = "0" caps the truncated tail at
    *     −60, probability 2^−60);
    *   - else: noise = 61 − bitlen(3·2^60 − 1 − V) ∈ [0, 60], the mirror
    *     image from the top of the range.
    * Both engines compute bitlen as length(bin(x)) on BIGINT — exact
    * integer arithmetic end to end. Released value clamps at 0
    * (post-processing preserves DP).
    *
    * Scale shape: one partial-agg groupBy at release grain + a per-row
    * scalar noise pipeline; nothing else. At 100 TB the released relation
    * is |sources|-sized whatever the corpus.
    */
  def gv05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, dir)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val u = conv(substring(md5(concat(lit("gv05:"), $"source")), 1, 15), 16, 10)
      .cast("long")
    counts
      .withColumn("noise", geometricNoise(u))
      .select($"source", $"n_docs", $"noise",
        greatest($"n_docs" + $"noise", lit(0L)).as("released"))
      .orderBy($"source")
  }

  /** Inverse-CDF of the ε = ln 2 two-sided geometric distribution over a
    * 60-bit uniform `u` — see [[gv05]]'s derivation. Exposed so the spec
    * can validate the sampler's distribution on a large synthetic uniform
    * stream, not just the |sources| released rows.
    */
  private[ops] def geometricNoise(u: Column): Column = {
    val v = u * 3L
    when(v < Pow60, (length(bin(v)) - 61).cast("long"))
      .otherwise((lit(61) - length(bin(lit(ThreeP60m1) - v))).cast("long"))
  }

  val gv05Oracle: String =
    s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |           FROM documents GROUP BY source),
       |n AS (SELECT source, n_docs,
       |  3 * ('0x' || substring(md5('gv05:' || source), 1, 15))::BIGINT AS v
       |  FROM c),
       |d AS (SELECT source, n_docs,
       |  CASE WHEN v < $Pow60 THEN CAST(length(bin(v)) - 61 AS BIGINT)
       |       ELSE CAST(61 - length(bin($ThreeP60m1 - v)) AS BIGINT) END AS noise
       |  FROM n)
       |SELECT source, n_docs, noise,
       |  GREATEST(n_docs + noise, 0) AS released
       |FROM d ORDER BY source""".stripMargin

  /** gv06 — DP HISTOGRAM RELEASE over the FULL domain grid: gv05 noises
    * the cells that exist; a correct DP release of a histogram over a
    * KNOWN domain must also noise the EMPTY cells — otherwise absence
    * itself leaks (the classic deployment mistake: publishing only
    * observed cells reveals exactly which combinations occur). The grid
    * is the cross of the two released dimensions (source × language —
    * dimension domains are public metadata here; at 100 TB they come from
    * the catalog, not a corpus scan... though this one derives them with
    * two distinct-aggs for self-containment), counts coalesce to 0, and
    * every cell gets its own geometric noise draw (ε = ln 2 per cell,
    * [[geometricNoise]]) keyed by the cell coordinates — same
    * deterministic-simulation caveat as [[gv05]]: a real deployment folds
    * a secret seed into the per-cell hash. Clamped at 0 —
    * post-processing preserves DP. The grid crossJoin broadcasts the
    * |langs|-row side (bounded-by-domain, whitelisted — the gv04 shape).
    */
  def gv06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
    val grid = docs.select($"source").distinct()
      .crossJoin(broadcast(docs.select($"lang").distinct()))
    val u = conv(substring(md5(
      concat(lit("gv06:"), $"source", lit(":"), $"lang")), 1, 15), 16, 10)
      .cast("long")
    grid.join(counts, Seq("source", "lang"), "left")
      .withColumn("n_docs", coalesce($"n", lit(0L)))
      .withColumn("noise", geometricNoise(u))
      .select($"source", $"lang", $"n_docs", $"noise",
        greatest($"n_docs" + $"noise", lit(0L)).as("released"))
      .orderBy($"source", $"lang")
  }

  val gv06Oracle: String =
    s"""WITH grid AS (
       |  SELECT s.source, l.lang
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  CROSS JOIN (SELECT DISTINCT lang FROM documents) l),
       |c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM documents GROUP BY source, lang),
       |g AS (SELECT grid.source, grid.lang, COALESCE(c.n, 0) AS n_docs,
       |        3 * ('0x' || substring(md5('gv06:' || grid.source || ':' || grid.lang), 1, 15))::BIGINT AS v
       |      FROM grid LEFT JOIN c ON grid.source = c.source AND grid.lang = c.lang),
       |d AS (SELECT source, lang, n_docs,
       |  CASE WHEN v < $Pow60 THEN CAST(length(bin(v)) - 61 AS BIGINT)
       |       ELSE CAST(61 - length(bin($ThreeP60m1 - v)) AS BIGINT) END AS noise
       |  FROM g)
       |SELECT source, lang, n_docs, noise,
       |  GREATEST(n_docs + noise, 0) AS released
       |FROM d ORDER BY source, lang""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q35_column_profile", q35, Some(q35Oracle)),
    Q("dq01_expectations", dq01, Some(dq01Oracle)),
    Q("dq02_snapshot_drift", dq02, Some(dq02Oracle)),
    Q("q48_winsorize", q48, Some(q48Oracle)),
    Q("q56_zscore_outliers", q56, Some(q56Oracle)),
    Q("q57_footer_stats", q57, Some(q57Oracle)),
    Q("gv01_forget_scope", gv01, Some(gv01Oracle)),
    Q("gv02_k_anonymity", gv02, Some(gv02Oracle)),
    Q("gv03_l_diversity", gv03, Some(gv03Oracle)),
    Q("gv04_t_closeness", gv04, Some(gv04Oracle)),
    Q("gv05_dp_release", gv05, Some(gv05Oracle)),
    Q("gv06_dp_histogram", gv06, Some(gv06Oracle)),
  )
}
