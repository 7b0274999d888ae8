package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{MaximumMatching, WeightedCycleMatching}

/** Weight-improving 4-cycle exchange (AWPM family): weight monotonicity,
  * cardinality/vertex-set preservation, no-positive-cycle fixpoint,
  * the 2/3 guarantee on perfect matchings, determinism. */
class CycleMatchingSpec extends AnyFunSuite {
  import TestSpark._

  private def weightOf(m: Seq[(Long, Long)], w: Map[(Long, Long), Double]) =
    m.map(w).sum

  /** Brute-force max-weight perfect matching over a complete n×n weight
    * function (all permutations). */
  private def optimalPerfect(n: Int, w: (Int, Int) => Double): Double =
    (0 until n).permutations.map(p =>
      p.zipWithIndex.map { case (c, r) => w(r, c) }.sum).max

  /** Any weight-increasing 4-cycle left? (driver-side exhaustive scan) */
  private def hasPositiveCycle(edges: Seq[(Long, Long, Double)],
                               m: Seq[(Long, Long)]): Boolean = {
    val w = edges.map(e => (e._1, e._2) -> e._3).toMap
    val mateR = m.toMap
    val mateC = m.map(_.swap).toMap
    edges.exists { case (i, j, wij) =>
      (mateR.get(i), mateC.get(j)) match {
        case (Some(ji), Some(mj)) if ji != j =>
          w.get((mj, ji)).exists(w2 =>
            wij + w2 - w((i, ji)) - w((mj, j)) > 0)
        case _ => false
      }
    }
  }

  test("textbook 2x2 swap: one cycle exchange reaches the optimal pairing") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 1L, 1.0), (1L, 2L, 5.0), (2L, 1L, 5.0), (2L, 2L, 1.0))
      .toDF("r", "c", "w")
    val init = Seq((1L, 1L), (2L, 2L)).toDF("r", "c")
    val got = WeightedCycleMatching.run(e, init).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(Seq((1L, 2L), (2L, 1L))))
  }

  test("random graphs: weight up, cardinality+vertex sets preserved, fixpoint") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3L, 17L)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 260).map(_ => (rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong, (rnd.nextInt(50) + 1).toDouble)).distinct
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val w = edges.map(e => (e._1, e._2) -> e._3).toMap
      val eDf = edges.toDF("r", "c", "w")
      val init = MaximumMatching.run(eDf.select("r", "c")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = WeightedCycleMatching.run(eDf, init.toDF("r", "c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.map(_._1).sorted == init.map(_._1).sorted, "rows changed")
      assert(got.map(_._2).sorted == init.map(_._2).sorted, "cols changed")
      assert(got.forall(p => w.contains(p)), "non-edge in result")
      assert(weightOf(got, w) >= weightOf(init, w), "weight decreased")
      assert(!hasPositiveCycle(edges, got), "positive 4-cycle remains")
      // determinism under repartitioning
      val again = WeightedCycleMatching.run(eDf.repartition(5),
        init.toDF("r", "c")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(again.sorted == got.sorted, "not deterministic")
    }
  }

  test("complete 6x6: reaches >= 2/3 of the optimal perfect weight") {
    val s = spark
    import s.implicits._
    def wf(r: Int, c: Int): Double = ((r * 13 + c * 29) % 37 + 1).toDouble
    val edges = for (r <- 0 until 6; c <- 0 until 6)
      yield (r.toLong, c.toLong, wf(r, c))
    val w = edges.map(e => (e._1, e._2) -> e._3).toMap
    val init = (0 until 6).map(i => (i.toLong, i.toLong)) // identity perfect
    val got = WeightedCycleMatching.run(edges.toDF("r", "c", "w"),
      init.toDF("r", "c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val opt = optimalPerfect(6, wf)
    assert(got.length == 6)
    assert(weightOf(got, w) >= (2.0 / 3.0) * opt,
      s"${weightOf(got, w)} < 2/3 of $opt")
    assert(weightOf(got, w) >= weightOf(init, w))
  }
}
