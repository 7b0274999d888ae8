package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.MaximalIndependentSet

/** MIS invariants: independence, maximality, seeded determinism. */
class MisSpec extends AnyFunSuite {
  import TestSpark._

  def checkMis(pairs: Seq[(Long, Long)], seed: Long): Set[Long] = {
    val e = undirected(pairs)
    val v = verticesOf(pairs)
    val mis = MaximalIndependentSet.run(e, v, seed).collect().map(_.getLong(0)).toSet
    val edgeSeq = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val vertSeq = edgeSeq.flatMap(p => Seq(p._1, p._2)).distinct
    // independence: no edge inside the set
    assert(!edgeSeq.exists(p => mis.contains(p._1) && mis.contains(p._2)), "not independent")
    // maximality: every outside vertex has a neighbor inside
    val adj = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (v0 <- vertSeq if !mis.contains(v0))
      assert(adj.getOrElse(v0, Set.empty).exists(mis.contains), s"not maximal at $v0")
    mis
  }

  test("MIS on random graphs: independent, maximal, deterministic") {
    for (seed <- Seq(1L, 2L)) {
      val pairs = RefKernels.randomGraph(80, 250, seed = 13L)
      val a = checkMis(pairs, seed)
      val b = checkMis(pairs, seed)
      assert(a == b, "seeded determinism")
    }
  }

  test("MIS of a star is either the hub or all leaves") {
    val star = (1L to 10L).map(i => (0L, i))
    val mis = checkMis(star, 5L)
    assert(mis == Set(0L) || mis == (1L to 10L).toSet)
  }

  test("MIS of isolated vertices is everything") {
    val e = undirected(Seq((0L, 1L))).where("src > 100") // empty edge set
    val spark2 = spark
    import spark2.implicits._
    val v = Seq(1L, 2L, 3L).toDF("v")
    val mis = MaximalIndependentSet.run(e, v, 1L).collect().map(_.getLong(0)).toSet
    assert(mis == Set(1L, 2L, 3L))
  }
}
