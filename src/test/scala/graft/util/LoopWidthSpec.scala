package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The iterative loops (pageRank, bfsHops, connectedComponents) size their
  * child-session shuffle width from the loop relation's optimizer stats —
  * the round-5 fix for constants that stayed 8-wide at any scale. The width
  * must: keep the tuned floor for small candidate graphs, grow with relation
  * bytes, and never exceed the parent session's configured parallelism. And
  * the width must be a pure performance knob: results are bit-identical at
  * any width (fixed-point associative arithmetic).
  */
class LoopWidthSpec extends AnyFunSuite with SparkSpec {

  private def session(width: Int) = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", width.toString)
    ss
  }

  test("small relations keep the floor width") {
    val ss = session(64)
    assert(LoopWidth.forRelation(ss.range(10).toDF()) == 8)
  }

  test("width grows with relation size and caps at the parent width") {
    val ss = session(64)
    val small = LoopWidth.forRelation(ss.range(1000).toDF(),
      floor = 1, bytesPerPartition = 1024)
    val big = LoopWidth.forRelation(ss.range(100000).toDF(),
      floor = 1, bytesPerPartition = 1024)
    assert(small < big, s"width must scale with stats: $small !< $big")
    assert(big == 64, "a loop never out-fans its parent session")
  }

  test("a parent narrower than the floor bounds the floor too") {
    val ss = session(2)
    assert(LoopWidth.forRelation(ss.range(10).toDF()) == 2)
  }

  test("loop results are bit-identical regardless of derived width") {
    // the same component extraction under a 2-wide and a 64-wide parent:
    // width only moves partition boundaries, never labels
    def run(width: Int): Seq[(Long, Long)] = {
      val ss = session(width)
      import ss.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
        .toDF("a", "b")
      graft.ops.Dedup.connectedComponents(edges)
        .as[(Long, Long)].collect().toSeq.sorted
    }
    assert(run(2) == run(64))
  }
}
