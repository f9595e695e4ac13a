package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins cl01's DBSCAN semantics three ways: the whole pipeline against an
  * independent scalar DBSCAN (exact all-pairs, no LSH) on a planted
  * corpus that exercises every role; the classic two-cluster border
  * tie-break on a hand-built geometry; and structural invariants of the
  * gate output on real testdata.
  */
class ClusteringSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private val Dim = 64

  /** 2-D direction embedded in 64-d (dims 0,1). */
  private def at(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    val v = new Array[Float](Dim)
    v(0) = math.cos(r).toFloat
    v(1) = math.sin(r).toFloat
    v
  }

  /** Deterministic pseudo-random unit-ish vector (splitmix-style LCG) —
    * pairwise cosines concentrate near 0 in 64-d, far from the 0.9 floor.
    */
  private def rnd(seed: Long): Array[Float] = {
    var x = seed * 0x9e3779b97f4a7c15L + 1
    Array.fill(Dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toInt / 8388608.0f) - 1.0f
    }
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact scalar DBSCAN (all-pairs, no LSH) mirroring cl01's role and
    * min-label semantics.
    */
  private def scalarDbscan(vs: Map[Long, Array[Float]]): Map[Long, (String, Long, Long)] = {
    val ids = vs.keys.toSeq.sorted
    val nb = ids.map { i =>
      i -> ids.filter(j => j != i && cos(vs(i), vs(j)) >= Clustering.Eps)
    }.toMap
    val core = ids.filter(i => nb(i).size >= Clustering.MinPts - 1).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(i => i -> i): _*)
    def find(i: Long): Long = if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (i <- core; j <- nb(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val label = core.map(i => i -> core.filter(j => find(j) == find(i)).min).toMap
    ids.map { i =>
      val (role, cl) =
        if (core(i)) ("core", label(i))
        else {
          val coreNb = nb(i).filter(core)
          if (coreNb.nonEmpty) ("border", coreNb.map(label).min) else ("noise", -1L)
        }
      i -> (role, cl, nb(i).size.toLong)
    }.toMap
  }

  /** Exact all-pairs candidate generator — isolates DBSCAN semantics from
    * LSH prefilter recall for geometry fixtures whose pairs sit ON the ε
    * floor (a deterministic sign-LSH can miss a cos ≈ 0.92 pair; the real
    * corpus' gate pairs don't sit there, and the gate's oracle proves it).
    */
  private val exactCandidates: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    aug => {
      val a = aug.select(col("vec_id").as("a"))
      val b = aug.select(col("vec_id").as("b"))
      a.crossJoin(broadcast(b)).filter(col("a") < col("b"))
    }

  private def run(vs: Map[Long, Array[Float]], exact: Boolean = false): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    val df = vs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    val out =
      if (exact) Clustering.dbscan(df, exactCandidates) else Clustering.dbscan(df)
    out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("engine DBSCAN matches exact scalar DBSCAN on a role-complete corpus") {
    // 20 far-apart random directions (noise), two planted chains built by
    // copy + few-dim zeroing (cos ≈ 0.99 — core cliques), plus one copy
    // with many dims zeroed (border-or-noise, data decides; scalar agrees)
    val base = (0L until 20L).map(i => i -> rnd(i)).toMap
    def zeroed(v: Array[Float], k: Int) =
      v.zipWithIndex.map { case (x, i) => if (i < k) 0.0f else x }
    val chains = Seq(3L, 7L).flatMap { s =>
      Seq(
        (100 + s) -> zeroed(base(s), 1),
        (200 + s) -> zeroed(base(s), 2),
        (300 + s) -> zeroed(base(s), 3),
        (400 + s) -> zeroed(base(s), 13),
      )
    }.toMap
    val vs = base ++ chains
    val got = run(vs)
    val want = scalarDbscan(vs)
    assert(got === want)
    // the corpus actually exercised the interesting roles
    assert(want.values.exists(_._1 == "core"))
    assert(want.values.count(_._1 == "noise") >= 15)
  }

  test("border between two clusters is tie-broken to the MIN cluster label") {
    // two 4-cliques 69 deg apart (inter-clique cos ≈ 0.70 < 0.9) and a
    // bridge at 23 deg from exactly one member of each (cos ≈ 0.921 ≥ 0.9,
    // 2 neighbors total → border at MinPts 4, never core, never merging)
    val a = Map(0L -> at(0), 1L -> at(0.3), 2L -> at(0.6), 3L -> at(23))
    val b = Map(10L -> at(92), 11L -> at(91.7), 12L -> at(91.4), 13L -> at(69))
    val bridge = Map(50L -> at(46))
    val got = run(a ++ b ++ bridge, exact = true)
    assert(got(50L) === ("border", 0L, 2L)) // min(cluster 0, cluster 10) = 0
    assert(got(0L)._1 === "core" && got(0L)._2 === 0L)
    assert(got(13L)._1 === "core" && got(13L)._2 === 10L)
    assert(got(3L)._3 === 4L) // 3 clique mates + the bridge
  }

  test("cl01 gate invariants at sf0.001: roles, sentinel, label = min member") {
    val out = graft.SparkEntry.queries("cl01_dbscan_embeddings")(spark, sfSmoke).collect()
    val roles = out.map(_.getString(1)).toSet
    assert(roles.subsetOf(Set("core", "border", "noise")))
    assert(roles.contains("core"), "planted chains must produce cores")
    // noise ⇔ sentinel -1
    assert(out.forall(r => (r.getString(1) == "noise") == (r.getLong(2) == -1L)))
    // every cluster label is the min vec_id among its members
    val byCluster = out.filter(_.getLong(2) >= 0).groupBy(_.getLong(2))
    for ((cl, rows) <- byCluster)
      assert(rows.map(_.getLong(0)).min === cl, s"cluster $cl label != min member")
    // cores meet the degree bar, borders have at least one neighbor
    assert(out.filter(_.getString(1) == "core").forall(_.getLong(3) >= Clustering.MinPts - 1))
    assert(out.filter(_.getString(1) == "border").forall(_.getLong(3) >= 1))
  }
}
