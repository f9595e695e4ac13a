package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Physical-plan shape assertions (SURVEY.md §4 expectations): the
  * performance properties the engine is designed around must survive
  * refactors — pushdown reaching the scan, broadcasts on small sides,
  * TakeOrderedAndProject for top-k, no stray exchanges.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.executedPlan.toString

  test("q03: all three predicates and the projection reach the parquet scan") {
    val p = plan("q03_filter_project")
    // PushedFilters list is truncated in toString; EqualTo printing proves
    // pushdown reached the scan, the Filter line shows all three predicates
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("l_quantity#") && p.contains(">= 45.0"), p)
    // pruned read schema: no untouched columns materialize
    assert(!p.contains("l_tax") && !p.contains("l_suppkey"), p)
  }

  test("q04 flagship: broadcast joins + TakeOrderedAndProject, single agg exchange") {
    val p = plan("q04_top5_customers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p) // no big-big sort at this shape
  }

  test("q13 top-k never global-sorts") {
    val p = plan("q13_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q17: dimension is broadcast, fact side never shuffles before the agg") {
    val p = plan("q17_case_recode_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: partial+final hash aggregation (map-side combine before the exchange)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), p) // partial aggregate functions present
    assert(p.contains("HashAggregate"), p)
  }

  test("t07: bigram generation stays codegen'd (no interpreted lambda) + TakeOrdered") {
    val p = plan("t07_top_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p) // top-k, never a full sort
    assert(!p.contains("lambdafunction"), p) // zip/slice form, no HOF lambda
    assert(p.contains("partial_count"), p) // map-side combine of bigram counts
  }

  test("q39 cube: one grouping-set expand, one agg exchange") {
    val p = plan("q39_cube_grouping")
    assert(p.contains("Expand"), p)
    assert(p.contains("HashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p) // one agg exchange
  }

  test("q40 range frame: one window sort, no extra exchanges") {
    val p = plan("q40_rolling_range_frame")
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("s02 sign-LSH: corpus side broadcast-joins the query bands (no corpus shuffle before candidates)") {
    // the raw ANN operator (the registered s02_knn_lsh entry wraps it in
    // the recall-gate evaluation, whose extra joins are not the op's plan)
    val p = graft.ops.Similarity.s02(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the only hash exchanges are for candidate distinct + the final heap
    // agg — both on candidate-id cardinality, never corpus rows
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s05: the windowed top-k text executes as the heap aggregate (rule fired)") {
    val p = plan("s05_knn_rule_rewrite")
    assert(!p.contains("Window ["), p)
    assert(p.contains("top_k_by"), p)
  }

  test("d05 exact near-dup sweep: broadcast nested loop, no pair-set shuffle") {
    val p = plan("d05_embedding_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q51 cohort: events collapse to user grain map-side before the cohort join") {
    val p = plan("q51_cohort_retention")
    // the distinct over (user, week) partial-aggregates before its exchange
    assert(p.contains("partial_"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q53 full outer joins post-aggregation month relations, not raw facts") {
    val p = plan("q53_full_outer_join")
    assert(p.contains("FullOuter"), p)
    // both inputs aggregate before the join: the join's children contain
    // HashAggregate, so no scan feeds the join directly
    val joinIdx = p.indexOf("FullOuter")
    assert(p.indexOf("HashAggregate") >= 0 && p.contains("partial_count"), p)
  }

  test("q54 lateral subquery decorrelates to a join (no per-row execution)") {
    val p = plan("q54_lateral_topk")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("s08 pair sweep: quantized_dot stays codegen'd, no interpreted lambda in the join projection") {
    val p = plan("s08_semantic_dedup")
    assert(p.contains("quantized_dot"), p)
    // the pair-stage cosine must not fall back to the HOF aggregate form
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("runtime bloom filter: a selective dim filter is pushed into the fact scan side") {
    // Spark's InjectRuntimeFilter: when the creation side of a shuffle
    // join carries a selective filter, the application (fact) side gets a
    // bloom_filter_might_contain probe — rows that cannot join are dropped
    // BEFORE the exchange. At 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~join-surviving
    // slice; it composes with (does not replace) static partition pruning.
    val s = spark
    import s.implicits._
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> s.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> s.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> s.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
    ).toMap
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = graft.Tables.lineitem(s, sfSmoke)
      val o = graft.Tables.orders(s, sfSmoke).filter($"o_orderpriority" === "1-URGENT")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"), optimized)
      // and the filter changed nothing semantically
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally conf.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("schema evolution: mergeSchema reads old + new file generations as one relation") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    // generation 1: (id, v) — generation 2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v", "score"))
    // old-generation rows surface the new column as null (additive
    // evolution only — the object-store contract Warehouse documents)
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("score")))
    assert(byId(3L).getDouble(merged.columns.indexOf("score")) == 9.5)
  }

  test("z02: runtime partition pruning reaches the fact scan") {
    val p = plan("z02_dpp_pruned_scan")
    // the dim's region filter becomes a runtime IN-set over the fact's
    // partition column — whole directories skipped before any fact IO
    assert(p.contains("dynamicpruningexpression"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("z03: runtime bloom filter prunes fact rows before the shuffle") {
    val ss = graft.ops.ZOrder.bloomSession(spark)
    val p = graft.ops.ZOrder.z03Body(ss, sfSmoke)
      .queryExecution.executedPlan.toString
    // the filtered dim's keys become a bloom subquery probed in the fact
    // scan's filter — rows drop before the SortMergeJoin exchange
    assert(p.contains("bloom_filter_agg"), p)
    assert(p.contains("might_contain"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q57: MIN/MAX/COUNT answered from parquet footers (aggregate pushdown)") {
    val p = plan("q57_footer_stats")
    assert(p.contains("PushedAggregation: [MIN(l_orderkey)"), p)
    assert(p.contains("COUNT(*)"), p)
    // the scan materializes only the pushed aggregate columns, not data rows
    assert(!p.contains("l_quantity"), p)
  }

  test("t15 chunking: one narrow generate pass, no joins, no agg exchange") {
    val p = plan("t15_rag_chunking")
    assert(!p.contains("Join"), p) // pure map + explode: the 100 TB chunker shape
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("q60 weighted sample: TakeOrderedAndProject, never a global sort") {
    val p = plan("q60_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("c05 domain caps: exactly one hash exchange (window + agg share the source partitioning)") {
    val p = plan("c05_domain_caps")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }

  test("s09 hard negatives: corpus is never shuffled — anchors broadcast, mined top-k broadcast") {
    val p = plan("s09_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // bounded anchor set x corpus pass
    assert(p.contains("BroadcastHashJoin"), p) // label recovery probes with broadcast mined rows
    assert(!p.contains("SortMergeJoin"), p)
  }

  // ----- round-6 shapes -----

  test("s10 MMR: pool selection is TakeOrdered, never a global sort of the corpus") {
    val p = plan("s10_mmr_rerank")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p) // pool matrix is broadcast-only
  }

  test("t17 vocab growth: histograms cumulate on checkpoint cardinality, not token rows") {
    val p = plan("t17_vocab_growth")
    // the only window sorts run AFTER the bucket aggregation: every Window
    // operator's input is an aggregated histogram, visible as partial_
    // aggregates upstream; and the token relation is aggregated exactly
    // twice (type first-occurrence + per-doc counts), never joined raw
    val windows = "Window ".r.findAllIn(p).length
    assert(windows >= 1, p)
    assert(p.contains("partial_count") || p.contains("partial_min")
      || p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin"), s"checkpoint joins must broadcast\n$p")
  }

  test("ts02 lerp: facts collapse map-side; spine joins only aggregated grain") {
    val p = plan("ts02_linear_interp")
    // dims broadcast onto the fact scan; the ONLY sort-merge join is the
    // spine ⋈ daily outer join, and both its sides are (series, day) grain
    // — the facts were aggregated below it (metadata-sized at scale)
    assert(p.contains("BroadcastHashJoin"), p)
    val smjs = "SortMergeJoin \\[[^\\]]*\\]".r.findAllIn(p).toList
    assert(smjs.nonEmpty && smjs.forall(_.contains("r_name")),
      s"only the series-grain spine join may sort-merge: $smjs")
  }

  test("e03 blocking quality: pair universes stay un-materialized (agg-only plan)") {
    val p = plan("e03_blocking_quality")
    // all-pairs/candidate-pairs appear only as arithmetic over aggregated
    // counts: the four 1-row metric relations cross-join via broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
