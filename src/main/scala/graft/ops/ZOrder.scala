package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Z-order (Morton curve) clustering — the multi-dimensional data-layout
  * move: interleave the bits of two sort keys so rows close in EITHER
  * dimension land in the same files, giving parquet min/max zone maps
  * skipping power on both predicates at once (a plain sort gives it on the
  * leading column only). This is the layout strategy behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`; here it is a write-path primitive
  * ([[zorderWrite]]) plus a gated query proving the curve math itself.
  *
  * The z-value is pure bit arithmetic (no hashing, no floats), so the
  * DuckDB oracle recomputes every interleaved bit — and the locality
  * property (per-file key spans ≪ global span) is spec-asserted on real
  * written files.
  */
object ZOrder {

  val Bits = 16 // per-dimension quantized domain: [0, 65536)

  /** Morton interleave of two `Bits`-bit non-negative ints: bit k of `a`
    * goes to position 2k, bit k of `b` to 2k+1. Pure codegen'd integer
    * expression — one projection, no shuffle, vectorizes in the scan.
    */
  def zValue(a: Column, b: Column): Column =
    (0 until Bits).map { k =>
      shiftleft(shiftright(a.cast("long"), k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(b.cast("long"), k).bitwiseAND(lit(1L)), 2 * k + 1)
    }.reduce(_ + _)

  /** The identical interleave as DuckDB SQL over expressions `a`/`b`. */
  def zValueSql(a: String, b: String): String =
    (0 until Bits).map { k =>
      s"((($a >> $k) & 1) << ${2 * k}) + ((($b >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" + ")

  /** Min-max quantization of a key onto the full [0, 2^Bits) domain, as an
    * exact integer-division SQL fragment (Spark `div` ≡ DuckDB `//` for
    * non-negative operands). Interleaving RAW bits degenerates when the
    * dimensions' ranges differ (a 13-bit key vs an 8-bit key → the curve's
    * high bits come only from the wide key and the layout collapses to a
    * single-column sort); both dimensions must occupy the same bit width
    * over their ACTUAL ranges, which is what this rescaling guarantees.
    */
  def quantizeExpr(x: String, lo: String, hi: String): String =
    s"(($x - $lo) * ${1 << Bits}) div ($hi - $lo + 1)"

  /** Write `df` clustered along the z-curve of (colA, colB): quantize both
    * keys onto the shared domain (one cheap stats pass — the same pass a
    * layout job does anyway), range-partition by z-value into `files`
    * output files, sort within each file. Range partitioning (not hash) is
    * what makes file-level min/max tight: each file covers one contiguous
    * z-range = one bounded rectangle-ish region of the (A, B) plane. At
    * 100 TB this is the layout job you run once per partition after load;
    * every later scan with a predicate on A or B skips most files on
    * footer stats alone — no index structure needed.
    */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
      files: Int): Unit = {
    val st = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).collect()(0)
    val qa = expr(quantizeExpr(colA, st.getLong(0).toString, st.getLong(1).toString))
    val qb = expr(quantizeExpr(colB, st.getLong(2).toString, st.getLong(3).toString))
    df.withColumn("__z", zValue(qa, qb))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** z01 — the z-curve math + its locality, as a gated relation: bucket
    * lineitem rows by the top 6 bits of z(l_orderkey, l_partkey) (64
    * curve segments ≈ 64 files) and report per-bucket row counts and the
    * min/max of BOTH quantized dimensions. The oracle recomputes all 32
    * interleaved bits per row in SQL. The per-bucket spans being small on
    * both dimensions at once IS the data-skipping property; the written-
    * file form of the same claim is ZOrderSpec.
    */
  def z01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    // in-plan stats (one 1-row agg, broadcast into the projection) — the
    // quantization bounds come from the data, not config
    val stats = li.agg(
      min($"l_orderkey").as("amin"), max($"l_orderkey").as("amax"),
      min($"l_partkey").as("bmin"), max($"l_partkey").as("bmax"))
    li.crossJoin(broadcast(stats))
      .selectExpr(
        s"${quantizeExpr("l_orderkey", "amin", "amax")} AS qa",
        s"${quantizeExpr("l_partkey", "bmin", "bmax")} AS qb")
      .withColumn("bucket", shiftright(zValue($"qa", $"qb"), 2 * Bits - 6))
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"qa").as("min_a"), max($"qa").as("max_a"),
        min($"qb").as("min_b"), max($"qb").as("max_b"),
      )
      .orderBy($"bucket")
  }

  val z01Oracle: String = {
    def q(x: String, lo: String, hi: String): String =
      s"(($x - $lo) * ${1 << Bits}) // ($hi - $lo + 1)"
    s"""WITH st AS (SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
       |    MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax FROM lineitem),
       |qz AS (SELECT ${q("l_orderkey", "amin", "amax")} AS qa,
       |    ${q("l_partkey", "bmin", "bmax")} AS qb FROM lineitem, st),
       |z AS (SELECT qa, qb, (${zValueSql("qa", "qb")}) AS zv FROM qz)
       |SELECT zv >> ${2 * Bits - 6} AS bucket, COUNT(*) AS n_rows,
       |  MIN(qa) AS min_a, MAX(qa) AS max_a,
       |  MIN(qb) AS min_b, MAX(qb) AS max_b
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** z02 — dynamic partition pruning over a partitioned layout: the other
    * half of the scan-skipping story (z01/q57 skip within files via footer
    * stats; this skips whole DIRECTORIES via the runtime join key set). The
    * query lays customer out hive-partitioned by `c_nationkey` (the layout
    * write a 100 TB warehouse does once per load), then runs the canonical
    * star-schema probe: fact ⋈ broadcast(dim with a selective predicate) on
    * the partition column. Catalyst inserts a `dynamicpruningexpression` into
    * the fact scan's PartitionFilters — the 5 region-1 nation keys, computed
    * at runtime from the reused broadcast, prune 20 of 25 partition
    * directories before a single fact byte is read. At 100 TB with
    * date-partitioned facts this is the difference between scanning a full
    * table and scanning a week. Plan shape asserted in PlanSpec; result
    * parity (identical to the unpartitioned join) gated against DuckDB on
    * the original table.
    */
  def z02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.util.Exact._
    val tmp = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-z02-customer").getAbsolutePath
    Tables.customer(s, dir)
      .write.mode("overwrite").partitionBy("c_nationkey").parquet(tmp)
    val fact = s.read.parquet(tmp)
    val dim = Tables.nation(s, dir).filter($"n_regionkey" === 1)
    fact
      .join(broadcast(dim), fact("c_nationkey") === dim("n_nationkey"))
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_customers"),
        dsum($"c_acctbal").as("total_acctbal"),
      )
      .orderBy($"n_name")
  }

  val z02Oracle: String =
    """SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_regionkey = 1
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** The z03 plan body, built on WHATEVER session it is given — exposed so
    * the PlanSpec can compile it on a bloom-configured child session and
    * assert the injected filter, while [[z03]] wraps it for the gate.
    * Canonical selective-dim shuffle join: ~3% of part survives the brand
    * predicate, every lineitem row shuffles for the SortMergeJoin unless
    * something stops it at the scan.
    */
  def z03Body(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.util.Exact._
    val li = Tables.lineitem(s, dir)
    val pt = Tables.part(s, dir).filter($"p_brand" === "Brand#13")
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy($"p_type")
      .agg(
        count(lit(1)).as("n_items"),
        dsum($"l_extendedprice").as("revenue"),
      )
      .orderBy($"p_type")
  }

  /** z03 — runtime bloom-filter row pruning: the row-level third of the
    * scan-skipping story (q57 answers from footers, z02 prunes whole
    * partition DIRECTORIES on the join key at runtime; this prunes ROWS of
    * a shuffle join's fact side before they reach the exchange). Catalyst's
    * InjectRuntimeFilter builds a bloom filter over the filtered dim's join
    * keys (`bloom_filter_agg` subquery) and plants `might_contain(...)` in
    * the fact scan's post-scan filter — with a ~3%-selective dim predicate,
    * ~97% of fact rows drop BEFORE the SortMergeJoin shuffle instead of
    * after it. At 100 TB this is the lever for selective joins on
    * NON-partition keys, where z02's directory pruning can't apply: shuffle
    * bytes scale with the dim's selectivity, not the fact's size. The
    * injection thresholds are sized for multi-GB scans (creation side
    * ≤ 10 MB, application side ≥ 10 GB by default), so the sf-scale gate
    * pins them on a CHILD session (own SQLConf, shared context — the house
    * pattern) and re-homes the result; the oracle checks the join result is
    * bit-identical with and without the bloom filter in the plan.
    */
  def z03(s: SparkSession, dir: String): DataFrame = {
    val ss = bloomSession(s)
    val df = z03Body(ss, dir)
    s.createDataFrame(df.rdd, df.schema)
  }

  /** Child session with runtime bloom-filter injection ENABLED at local
    * test scale: threshold floors dropped so the sf0.01/sf0.1 fact scan
    * qualifies as "large", broadcast disabled so the join is the shuffle
    * join the rule targets (at warehouse scale both happen naturally: the
    * fact side IS ≥ 10 GB, and a 100 M-row dim side is far past broadcast).
    */
  def bloomSession(parent: SparkSession): SparkSession = {
    val ss = parent.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    ss.conf.set("spark.sql.shuffle.partitions", "32")
    ss
  }

  val z03Oracle: String =
    """SELECT p_type, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#13'
      |GROUP BY p_type ORDER BY p_type""".stripMargin

  /** z04 — LAYOUT SKIPPING-EFFECTIVENESS audit: z01 proves the curve math;
    * this quantifies WHY the layout wins, as the file-skipping count a
    * zone-map scan would actually do. Two 64-file layouts of the same rows
    * — the z-curve (bucket = top 6 z-bits) vs a plain sort by dimension A
    * (bucket = top 6 qa-bits) — each summarized to per-file min/max zone
    * maps of the SECONDARY dimension B; 20 deterministic md5-priority
    * probe values of B then count, per layout, how many files a
    * `WHERE B = probe` scan must touch (zone map overlaps). Under the
    * A-sort, B's per-file spans are near-global → most files touched;
    * under the z-curve each file covers a bounded B-range → a fraction.
    * This is the audit a 100 TB layout job runs to decide whether
    * re-clustering pays: a few 64-row zone-map relations and a 20-row
    * probe side — nothing fact-scale beyond the one quantized projection
    * both layouts share.
    */
  def z04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey")
    val stats = li.agg(
      min($"l_orderkey").as("amin"), max($"l_orderkey").as("amax"),
      min($"l_partkey").as("bmin"), max($"l_partkey").as("bmax"))
    val qz = graft.util.Eager.cached(
      li.crossJoin(broadcast(stats))
        .selectExpr(
          s"${quantizeExpr("l_orderkey", "amin", "amax")} AS qa",
          s"${quantizeExpr("l_partkey", "bmin", "bmax")} AS qb"))
    val zBoxes = qz
      .withColumn("bucket", shiftright(zValue($"qa", $"qb"), 2 * Bits - 6))
      .groupBy($"bucket")
      .agg(min($"qb").as("min_b"), max($"qb").as("max_b"))
    val aBoxes = qz
      .withColumn("bucket", shiftright($"qa", Bits - 6))
      .groupBy($"bucket")
      .agg(min($"qb").as("min_b"), max($"qb").as("max_b"))
    val probes = qz.select($"qb").distinct()
      .withColumn("pri",
        conv(substring(md5(concat(lit("z04:"), $"qb".cast("string"))), 1, 8), 16, 10)
          .cast("long"))
      .orderBy($"pri", $"qb").limit(20).select($"qb")
    def touched(boxes: DataFrame, as: String): DataFrame = probes
      .join(broadcast(boxes), $"qb".between(col("min_b"), col("max_b")))
      .groupBy($"qb").agg(count(lit(1)).as(as))
    touched(zBoxes, "n_files_zorder")
      .join(touched(aBoxes, "n_files_asorted"), Seq("qb"))
      .orderBy($"qb")
  }

  val z04Oracle: String = {
    def q(x: String, lo: String, hi: String): String =
      s"(($x - $lo) * ${1 << Bits}) // ($hi - $lo + 1)"
    s"""WITH st AS (SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
       |    MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax FROM lineitem),
       |qz AS (SELECT ${q("l_orderkey", "amin", "amax")} AS qa,
       |    ${q("l_partkey", "bmin", "bmax")} AS qb FROM lineitem, st),
       |zb AS (SELECT (${zValueSql("qa", "qb")}) >> ${2 * Bits - 6} AS bucket,
       |    MIN(qb) AS min_b, MAX(qb) AS max_b FROM qz GROUP BY 1),
       |ab AS (SELECT qa >> ${Bits - 6} AS bucket,
       |    MIN(qb) AS min_b, MAX(qb) AS max_b FROM qz GROUP BY 1),
       |probes AS (SELECT qb FROM (SELECT DISTINCT qb FROM qz)
       |  ORDER BY ('0x' || substring(md5('z04:' || CAST(qb AS VARCHAR)), 1, 8))::BIGINT, qb
       |  LIMIT 20),
       |tz AS (SELECT qb, COUNT(*) AS n_files_zorder FROM probes
       |  JOIN zb ON qb BETWEEN min_b AND max_b GROUP BY qb),
       |ta AS (SELECT qb, COUNT(*) AS n_files_asorted FROM probes
       |  JOIN ab ON qb BETWEEN min_b AND max_b GROUP BY qb)
       |SELECT qb, n_files_zorder, n_files_asorted
       |FROM tz JOIN ta USING (qb) ORDER BY qb""".stripMargin
  }

  /** Compaction target size for z05, in (synthetic) bytes — sized so the
    * plan has multiple bins at every test SF (a real planner targets
    * ~1 GiB; only the constant changes).
    */
  val CompactTarget = 65536L

  /** Synthetic row width for z05's manifest (bytes per lineitem row). */
  val RowWidth = 128L

  /** Ingest-shard fan-out for z05's manifest: each month lands
    * `IngestShards` writer files (the multi-writer ingest pattern that
    * produces the small-files problem at every SF).
    */
  val IngestShards = 64L

  /** z05 — COMPACTION PLAN (the `OPTIMIZE` small-files planner,
    * Delta/Iceberg compaction shape): a partitioned table accretes one
    * small file per ingest batch; the planner walks the file manifest in
    * layout order and packs consecutive files into target-sized rewrite
    * bins — consecutive, not best-fit, because compaction must PRESERVE
    * the layout's clustering (a best-fit packer would interleave
    * unrelated key ranges and undo z01's work). Bin assignment is pure
    * integer arithmetic on the running total: a file belongs to the bin
    * its first byte lands in (`(cum − bytes) div target`), so the plan is
    * a single window pass — no iteration, no driver loop.
    *
    * The manifest here is derived (one partial-agg groupBy): one "file"
    * per l_shipdate month with bytes = rows × RowWidth — the per-month
    * ingest pattern that actually produces the small-files problem.
    * Output: one row per rewrite bin with its file count, byte total, and
    * fill ratio vs target (ppm) — exactly what an OPTIMIZE scheduler
    * consumes to pick which bins are worth rewriting.
    *
    * Scale shape: manifests are metadata-sized whatever the table (a
    * 100 TB table is ~10⁵ files of 1 GiB — the window over the manifest
    * is bounded by file count, never by rows); the only corpus-scale work
    * is the month-grain partial agg.
    */
  def z05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val manifest = Tables.lineitem(s, dir)
      .groupBy(date_trunc("month", $"l_shipdate").cast("date").as("file_month"),
        ($"l_suppkey" % IngestShards).cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
      .select($"file_month", $"shard", ($"n_rows" * RowWidth).as("bytes"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"file_month", $"shard")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    manifest
      .withColumn("cum", sum($"bytes").over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $CompactTarget"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bytes"),
        date_format(min($"file_month"), "yyyy-MM-dd").as("from_month"),
        date_format(max($"file_month"), "yyyy-MM-dd").as("to_month"))
      .select($"bin", $"n_files", $"bytes", $"from_month", $"to_month",
        expr(s"(bytes * 1000000) div $CompactTarget").as("fill_ppm"))
      .orderBy($"bin")
  }

  val z05Oracle: String =
    s"""WITH manifest AS (
       |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS file_month,
       |    CAST(l_suppkey % $IngestShards AS BIGINT) AS shard,
       |    CAST(COUNT(*) AS BIGINT) * $RowWidth AS bytes
       |  FROM lineitem GROUP BY 1, 2),
       |runs AS (
       |  SELECT file_month, bytes,
       |    CAST(SUM(bytes) OVER (ORDER BY file_month, shard) AS BIGINT) AS cum
       |  FROM manifest),
       |binned AS (
       |  SELECT file_month, bytes, (cum - bytes) // $CompactTarget AS bin
       |  FROM runs)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(bytes) AS BIGINT) AS bytes,
       |  strftime(MIN(file_month), '%Y-%m-%d') AS from_month,
       |  strftime(MAX(file_month), '%Y-%m-%d') AS to_month,
       |  (CAST(SUM(bytes) AS BIGINT) * 1000000) // $CompactTarget AS fill_ppm
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  def all: Seq[Q] = Seq(
    Q("z01_zorder_buckets", z01, Some(z01Oracle)),
    Q("z02_dpp_pruned_scan", z02, Some(z02Oracle)),
    Q("z03_bloom_pruned_join", z03, Some(z03Oracle)),
    Q("z04_layout_skipping", z04, Some(z04Oracle)),
    Q("z05_compaction_plan", z05, Some(z05Oracle)),
  )
}
