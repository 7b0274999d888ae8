package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{BipartiteMatching, MaximumMatching}

/** Maximum-cardinality matching: validity, optimality (differential vs a
  * driver-side Kuhn augmenting-path algorithm — the cardinality of a
  * maximum matching is unique even though the matching is not),
  * improvement over greedy, and determinism across partitionings. */
class MaxMatchingSpec extends AnyFunSuite {
  import TestSpark._

  /** Exact maximum-matching cardinality (Kuhn's algorithm). */
  private def kuhn(edges: Seq[(Long, Long)]): Int = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val mateC = collection.mutable.Map[Long, Long]()
    def tryAug(r: Long, visited: collection.mutable.Set[Long]): Boolean = {
      for (c <- adj.getOrElse(r, Nil) if !visited(c)) {
        visited += c
        if (!mateC.contains(c) || tryAug(mateC(c), visited)) {
          mateC(c) = r; return true
        }
      }
      false
    }
    edges.map(_._1).distinct.sorted
      .count(r => tryAug(r, collection.mutable.Set[Long]()))
  }

  private def bipartite(nR: Int, nC: Int, nE: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to nE).map(_ => (rnd.nextInt(nR).toLong, rnd.nextInt(nC).toLong)).distinct
  }

  private def check(pairs: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    val e = pairs.toDF("r", "c")
    val got = MaximumMatching.run(e).collect().map(r => (r.getLong(0), r.getLong(1)))
    // validity: a matching over genuine edges
    assert(got.map(_._1).distinct.length == got.length, "row matched twice")
    assert(got.map(_._2).distinct.length == got.length, "col matched twice")
    val es = pairs.toSet
    assert(got.forall(es.contains), "matched pair is not an edge")
    // optimality: cardinality equals the exact maximum
    assert(got.length == kuhn(pairs), s"not maximum: ${got.length} vs ${kuhn(pairs)}")
    // never below the greedy init it starts from
    val greedy = BipartiteMatching.run(e).count()
    assert(got.length >= greedy)
    // determinism under input repartitioning
    val again = MaximumMatching.run(e.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.sameElements(got.sorted), "not deterministic")
  }

  test("greedy-suboptimal 3-edge path: maximum rematches to cardinality 2") {
    val s = spark
    import s.implicits._
    // greedy min-min matches (1,1) and strands r=2, c=2; maximum = 2
    val e = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("r", "c")
    val got = MaximumMatching.run(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.length == 2)
    assert(got.sameElements(Seq((1L, 2L), (2L, 1L))))
  }

  test("matches the exact maximum cardinality on random bipartite graphs") {
    for (seed <- Seq(1L, 7L, 23L)) check(bipartite(50, 50, 180, seed))
    check(bipartite(80, 30, 250, seed = 5L)) // skewed sides
    check(bipartite(20, 20, 400, seed = 9L)) // dense: perfect matching likely
  }

  test("long augmenting chain (alternating path of length 2k+1)") {
    // edges (i,i) for i<k plus (i,i+1): greedy strands one endpoint; the
    // maximum is k+... — exact value from kuhn; exercises deep augments.
    val k = 12
    val chain = (0 until k).flatMap(i =>
      Seq((i.toLong, i.toLong), (i.toLong, (i + 1).toLong)))
    check(chain)
  }
}
