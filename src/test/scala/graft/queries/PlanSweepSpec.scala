package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Structural scale guard over EVERY registered query: shapes that cannot
  * survive a 100 TB input must not appear in any gated plan.
  *
  * - `CartesianProduct` (unbroadcast cross join: quadratic AND shuffles
  *   both sides) is banned everywhere except d05, the deliberate exact
  *   all-pairs ground truth that d07's bucketed path is gated against.
  * - `BroadcastNestedLoopJoin` is banned UNLESS the query is registered
  *   below as broadcast-scan-by-design: a BOUNDED broadcast side (k probe
  *   vectors, a 1-row bounds/sketch relation) against one linear pass of
  *   the big side — |big| × O(1) work, the correct distributed shape for
  *   brute-force KNN scoring and global-bound audits. A new query landing
  *   a BNLJ must either argue boundedness here or fix its join keys.
  *
  * One test per query so a violation names its owner.
  */
class PlanSweepSpec extends AnyFunSuite with SparkSpec {

  private val quadraticByDesign = Set("d05_embedding_neardup")

  /** Bounded-broadcast × linear-scan forms (see each implementation's
    * scaladoc): the KNN family scores a fixed probe set against the
    * corpus; dq01/hh01/hh02 audit against single-row global relations.
    */
  private val broadcastScanByDesign = Set(
    "s01_knn_bruteforce", "s02_knn_lsh", "s03_knn_heap", "s04_knn_ivf",
    "s05_knn_rule_rewrite", "s06_knn_pq", "s08_semantic_dedup",
    "s09_hard_negatives", // bounded anchor set × one corpus pass, as s01/s03
    "dq01_expectations", "hh01_heavy_hitters", "hh02_heavy_hitters_stream",
    // 1-row global-scalar crossJoins: corpus doc count (t08 IDF), the
    // stop-key df threshold (t10), dimension min/max bounds (z01), the
    // per-method leak count (ml04)
    "t08_term_importance", "t10_winnowing_pairs", "z01_zorder_buckets",
    "ml04_leakage_audit", "tc01_triangle_count",
    // four 1-row metric aggregates cross-joined into the single audit row
    "e03_blocking_quality",
    // 20-probe × 64-zone-map containment joins — both sides bounded
    "z04_layout_skipping",
    // 1-row pagination envelope (count + page total) broadcast across the
    // ≤ pageSize page rows — both nested-loop sides bounded by construction
    "q69_pagination_envelope",
    // 5-row τ relation broadcast across the banding-bounded candidate set
    "d11_dedup_threshold_sweep",
    // 1-row date-bounds relation fanned across the dim table to generate
    // the spine (metadata-sized; the facts never touch the nested loop)
    "ts01_gap_fill", "ts02_linear_interp",
    // BOTH nested-loop sides are LIMIT-bounded: the broadcast query row ×
    // corpus relevance pass (the s01 shape), then the top-30 pool against
    // itself — Pool² work by construction, never corpus-quadratic
    "s10_mmr_rerank",
    // 1-row total and 1-row tercile-threshold relations crossed into the
    // bounded score histogram / the scored docs (≤63000-row histogram by
    // arithmetic — see Tokenize.lmQualityBuckets)
    "t19_lm_quality_buckets",
    // c09 reuses t19's scoring core, so it inherits the same bounded
    // 1-row threshold broadcasts (plus a 1-row confusion row at the end)
    "c09_filter_agreement",
    // |sensitive domain| (5)-row global-mix and 1-row total relations
    // fanned across the already-aggregated QI-class list — classes × 5
    // rows, metadata-sized; the fact table never touches the nested loop
    "gv04_t_closeness",
    // 1-row corpus-stats relation (n_docs + avgdl) crossed into the
    // query-term⋈postings relation — the t08 IDF shape; the corpus only
    // flows through hash joins
    "ir01_bm25_topk", "ir03_rrf_fusion",
    // 1-row feature-totals relation crossed into the ≤1024-row hashed
    // bucket histogram (mx01) / 1-row corpus-total and waterfill-m
    // relations crossed into the |languages|-row allocation table (mx02)
    // — the corpus itself only ever flows through hash joins and
    // partial aggs
    "mx01_dsir_importance", "mx02_unimax_allocation",
    // 1-row totals/shortfall relations crossed into the |languages|-row
    // share table (the mx02 shape)
    "mx03_temperature_mixture",
    // 1-row class-totals relation crossed into the vocabulary-sized NB
    // model; the (doc, word) stream only flows through word-keyed hash
    // joins and partial aggs
    "c11_quality_classifier",
    // |domain|-sized dimension grid: |sources| × |langs| cells, both
    // sides bounded by the released dimensions (the gv04 shape)
    "gv06_dp_histogram",
    // three 1-row crossJoins (bigram-type/vocab totals, doc count,
    // tercile cut values) into the bigram stream / ≤3101-row score
    // histogram — the corpus itself only flows through token-keyed hash
    // joins and partial aggs (the t19/c11 shape)
    "ppl01_kn_perplexity_buckets",
  )

  graft.SparkEntry.registry.sortBy(_.name).foreach { q =>
    test(s"${q.name}: no cartesian/unbounded nested-loop join in the plan") {
      val df = q.fn(spark, sfSmoke)
      val p = df.queryExecution.executedPlan.toString
      if (!quadraticByDesign(q.name)) {
        assert(!p.contains("CartesianProduct"),
          s"${q.name} plans a CartesianProduct")
        if (!broadcastScanByDesign(q.name))
          assert(!p.contains("BroadcastNestedLoopJoin"),
            s"${q.name} plans a BroadcastNestedLoopJoin — justify boundedness " +
              "in PlanSweepSpec.broadcastScanByDesign or fix the join keys")
      }
    }
  }
}
