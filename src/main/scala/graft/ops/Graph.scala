package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Iterative graph analytics over the order graph — PageRank (Page et al.
  * 1999) and multi-source BFS, in the vertex-program-as-joins topology of
  * Pregel (Malewicz et al. 2010) expressed as DataFrame operations.
  *
  * Complements the connected-components machinery (Dedup.scala d06): CC
  * answers "which nodes form one entity", PageRank answers "which nodes
  * matter". In a training-data pipeline this is the domain/source authority
  * signal (rank hosts by link mass, downweight low-authority sources at
  * mixing time — the c03 keep-rate input at corpus scale).
  *
  * ALL arithmetic is fixed-point BIGINT (the s07/s08/q56 posture): scores
  * carry micro-mass units of 1e-12, damping 0.85 is exactly 17/20, and each
  * edge's contribution is floored independently — so the per-node update is
  * a plain associative SUM of integers, merge-order free, and the DuckDB
  * oracle (the same ten iterations unrolled as chained CTEs with identical
  * `//` floor division) hash-matches bit-for-bit. No float ever appears.
  *
  * Scale shape (the Pregel topology in DataFrame form): the edge list is
  * built ONCE and cached; each iteration is one hash join (edges ⋈ scores
  * on src — scores are node-cardinality, orders of magnitude smaller than
  * edges) followed by one partial-aggregating shuffle on dst. Lineage is
  * cut per iteration with localCheckpoint exactly like the d06 CC loop, so
  * ten iterations stay ten cheap stages instead of one exponential plan.
  * At 1000 executors the edge partitioning is reused across all ten
  * iterations (AQE re-plans the tiny score side), which is how industrial
  * PageRank runs; nothing driver-side ever sees an edge.
  */
object Graph {

  /** Total fixed-point mass: 1 unit = 1e-12 of total rank. */
  val Scale = 1000000000000L

  /** Fixed iteration count — rank vectors at web scale stabilize in tens of
    * iterations; ten keeps the oracle's unrolled CTE chain tractable.
    */
  val Iters = 10

  /** pr01 — PageRank over the undirected customer↔supplier graph: nodes
    * are customers and suppliers that traded (via orders ⋈ lineitem),
    * with an edge per distinct trading pair in both directions (so no
    * dangling mass sinks). Node encoding 2·custkey / 2·suppkey+1 keeps the
    * two key spaces disjoint through the loop; the output decodes back to
    * (node_type, node_key, score).
    */
  /** Core loop over an arbitrary directed edge list (`src`, `dst` BIGINT;
    * every node must have out-degree ≥ 1 — build edges undirected, as pr01
    * does, to guarantee it). Returns (node, score) with Σscore ≤ [[Scale]].
    */
  def pageRank(edgesIn: DataFrame, iters: Int = Iters): DataFrame = {
    // score vectors are node-cardinality — orders of magnitude below the
    // session's batch width. Pin the loop's shuffle width on a CHILD
    // session (the d06 CC pattern: own SQLConf, shared context/cache; the
    // input plan compiles under the parent's width, the loop's under the
    // child's) so ten iterations aren't sixty near-empty-partition stages.
    val parent = edgesIn.sparkSession
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val homedIn = edgesIn.select("src", "dst")
    val labels = pageRankLoop(
      ss.createDataFrame(homedIn.rdd, homedIn.schema), iters)
    parent.createDataFrame(labels.rdd, labels.schema)
  }

  private def pageRankLoop(edgesIn: DataFrame, iters: Int): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    // hash-partition the edge list by join key ONCE: the cached relation's
    // outputPartitioning is reused by every iteration's join, so only the
    // node-cardinality score side ever moves again (the Pregel invariant)
    val edges = graft.util.Eager.cached(
      edgesIn.select($"src", $"dst").repartition($"src"))
    val deg = graft.util.Eager.cached(
      edges.groupBy($"src").agg(count(lit(1)).as("deg")))
    // two driver-side scalars (node count → init/teleport constants) — the
    // same "build once, then iterate" sequencing as the s04 quantizer fit
    val n = deg.count()
    val init = Scale / n
    val teleport = init * 3 / 20 // (1 − d)·init with d = 17/20, floored
    var scores = deg.select($"src".as("node"), lit(init).as("score"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      scores = edges.join(scores, edges("src") === scores("node"))
        .join(deg, "src")
        .select($"dst", expr("(score * 17) div (20 * deg)").as("contrib"))
        .groupBy($"dst")
        .agg((lit(teleport) + sum($"contrib")).as("score"))
        .select($"dst".as("node"), $"score")
      // lineage cut every third round: a depth-3 plan re-optimizes fine,
      // and each localCheckpoint is a whole extra job — at ten iterations
      // the checkpoint jobs dominated the loop's wall-clock
      if (i % 3 == 0 || i == iters) scores = scores.localCheckpoint()
    }
    scores
  }

  def pr01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sn"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"sn".as("dst"))
      .unionByName(pairs.select($"sn".as("src"), $"c".as("dst")))
    pageRank(edges).select(
      when($"node" % 2 === 0, "customer").otherwise("supplier").as("node_type"),
      expr("node div 2").as("node_key"),
      $"score")
      .orderBy($"score".desc, $"node_type", $"node_key")
  }

  /** The identical ten iterations unrolled as chained CTEs. DuckDB's `//`
    * and Spark's `div` agree on positive BIGINTs; SUM(BIGINT) surfaces as
    * HUGEINT so the final score casts back (memory: the m02 lesson).
    */
  val pr01Oracle: String = {
    val iters = (1 to Iters).map { i =>
      s"""s$i AS (SELECT e.dst AS node,
         |  (SELECT teleport FROM consts) +
         |    CAST(SUM((p.score * 17) // (20 * d.deg)) AS BIGINT) AS score
         |  FROM edges e
         |  JOIN s${i - 1} p ON p.node = e.src
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS sn
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT c AS src, sn AS dst FROM pairs
       |          UNION ALL
       |          SELECT sn AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |consts AS (
       |  SELECT CAST($Scale // COUNT(*) AS BIGINT) AS init,
       |         CAST(($Scale // COUNT(*)) * 3 // 20 AS BIGINT) AS teleport
       |  FROM deg),
       |s0 AS (SELECT src AS node, (SELECT init FROM consts) AS score FROM deg),
       |$iters
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       node // 2 AS node_key,
       |       score
       |FROM s$Iters
       |ORDER BY score DESC, node_type, node_key""".stripMargin
  }

  // ---------------------------------------------------------------------
  // sp01 — multi-source BFS (shortest hop counts)
  // ---------------------------------------------------------------------

  /** Hop bound for sp01 — covers the diameter of the dense bipartite trade
    * graph at every SF while keeping the oracle's recursion bounded.
    */
  val MaxHops = 6

  /** Multi-source BFS over (`src`, `dst`) edges: minimum hop count from any
    * source node, up to `maxHops`. Frontier-expansion shape: each round
    * joins the PREVIOUS frontier (not the whole visited set) against the
    * edge list, then prunes nodes already reached — per-round shuffle work
    * is frontier-sized, and rounds are lineage-cut like the CC loop. The
    * min-aggregation makes reached sets merge-order free.
    */
  def bfsHops(edgesIn: DataFrame, sourcesIn: DataFrame,
      maxHops: Int = MaxHops): DataFrame = {
    // same child-session narrow width as pageRank; both inputs re-home
    val parent = edgesIn.sparkSession
    val ss = parent.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val e = edgesIn.select("src", "dst")
    val src = sourcesIn.select("node")
    val visited = bfsLoop(
      ss.createDataFrame(e.rdd, e.schema),
      ss.createDataFrame(src.rdd, src.schema), maxHops)
    parent.createDataFrame(visited.rdd, visited.schema)
  }

  private def bfsLoop(edgesIn: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    val s = edgesIn.sparkSession
    import s.implicits._
    val edges = graft.util.Eager.cached(edgesIn.select($"src", $"dst"))
    var visited = sources.select($"node", lit(0).as("hops")).localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select($"dst".as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select($"node", lit(h).as("hops"))
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** sp01 — supply-chain proximity: hop distance from the EUROPE-nation
    * supplier cohort to every node of the trade graph (how many trading
    * steps separate each customer/supplier from the European supply base —
    * the blast-radius query of supply-chain analytics).
    */
  def sp01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sn"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"sn".as("dst"))
      .unionByName(pairs.select($"sn".as("src"), $"c".as("dst")))
    val sources = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(s, dir), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "EUROPE")
      .select(($"s_suppkey" * 2 + 1).as("node"))
      // sources outside the trade graph would mint phantom nodes
      .join(edges.select($"src".as("node")).distinct(), Seq("node"), "left_semi")
    bfsHops(edges, sources).select(
      when($"node" % 2 === 0, "customer").otherwise("supplier").as("node_type"),
      expr("node div 2").as("node_key"),
      $"hops")
      .orderBy($"hops", $"node_type", $"node_key")
  }

  /** Bounded-depth reachability as a recursive CTE: UNION dedupes exact
    * (node, hops) pairs so the recursion terminates; MIN(hops) per node
    * afterwards is exactly BFS distance.
    */
  val sp01Oracle: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS sn
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT c AS src, sn AS dst FROM pairs
       |          UNION ALL
       |          SELECT sn AS src, c AS dst FROM pairs),
       |sources AS (
       |  SELECT DISTINCT s.s_suppkey * 2 + 1 AS node
       |  FROM supplier s
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = 'EUROPE'
       |    AND EXISTS (SELECT 1 FROM edges e WHERE e.src = s.s_suppkey * 2 + 1)),
       |walk(node, hops) AS (
       |  SELECT node, 0 FROM sources
       |  UNION
       |  SELECT e.dst, w.hops + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.hops < $MaxHops)
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       node // 2 AS node_key,
       |       CAST(MIN(hops) AS INT) AS hops
       |FROM walk
       |GROUP BY 1, 2
       |ORDER BY hops, node_type, node_key""".stripMargin

  val all: Seq[Q] = Seq(
    Q("pr01_pagerank", pr01, Some(pr01Oracle)),
    Q("sp01_bfs_hops", sp01, Some(sp01Oracle)),
  )
}
