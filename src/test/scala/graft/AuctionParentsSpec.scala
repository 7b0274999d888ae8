package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kernels._

/** Round-3 kernels: auction matching and the BFS parent tree. */
class AuctionParentsSpec extends AnyFunSuite {
  import TestSpark._

  private def weighted(seed: Long, nR: Int, nC: Int, nE: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to nE).map { _ =>
      (rnd.nextInt(nR).toLong, (1000 + rnd.nextInt(nC)).toLong,
        (1 + rnd.nextInt(50)).toLong)
    }.distinct.toDF("r", "c", "w")
  }

  test("auction matching is a valid matching over genuine edges") {
    val be = weighted(11L, 30, 20, 120)
    val m = AuctionMatching.run(be).collect()
    assert(m.nonEmpty)
    assert(m.map(_.getLong(0)).distinct.length == m.length, "each row matched once")
    assert(m.map(_.getLong(1)).distinct.length == m.length, "each col matched once")
    val edgeSet = be.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m.forall(r => edgeSet.contains((r.getLong(0), r.getLong(1), r.getLong(2)))),
      "matched pairs are genuine edges with their weights")
  }

  test("auction total weight >= greedy maximal matching's weight") {
    for (seed <- Seq(1L, 2L, 3L, 4L)) {
      val be = weighted(seed, 25, 25, 150)
      val auctionW = AuctionMatching.run(be)
        .agg(sum("w")).first().getLong(0)
      val greedyW = BipartiteMatching.run(be.select("r", "c"))
        .join(be, Seq("r", "c")).agg(sum("w")).first().getLong(0)
      assert(auctionW >= greedyW,
        s"seed $seed: auction $auctionW < greedy $greedyW")
    }
  }

  test("auction matching is parallelism-invariant (repartition)") {
    val be = weighted(7L, 20, 15, 90)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(AuctionMatching.run(be.repartition(1))) ==
      rows(AuctionMatching.run(be.repartition(7))))
  }

  private val pairs = RefKernels.randomGraph(80, 200, seed = 5L)
  private def edges = undirected(pairs)
  private val root = pairs.map(_._1).min

  test("bfs parents: dist agrees with bfs levels") {
    val p = BFS.parents(edges, root).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val l = BFS.levels(edges, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == l)
  }

  test("bfs parents: Graph500 five-check validation passes") {
    val tree = BFS.parents(edges, root)
    val checks = BFS.validateParents(edges, tree, root).collect()
    assert(checks.length == 5)
    assert(checks.forall(_.getLong(1) == 0L),
      "violations: " + checks.filter(_.getLong(1) != 0).mkString(", "))
  }

  test("bfs parents: direction-forced variants agree with adaptive") {
    def rows(alpha: Double) =
      BFS.parents(edges, root, alpha = alpha).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val adaptive = rows(2.0)
    assert(rows(0.0) == adaptive)               // pure top-down
    assert(rows(Double.MaxValue) == adaptive)   // bottom-up after level 0
  }

  test("seeded random-parent tree: valid, same dists, differs from min-parent") {
    val tree = BFS.parents(edges, root, seed = Some(42L))
    val checks = BFS.validateParents(edges, tree, root).collect()
    assert(checks.forall(_.getLong(1) == 0L),
      "violations: " + checks.filter(_.getLong(1) != 0).mkString(", "))
    val seeded = tree.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val minTree = BFS.parents(edges, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same reached set and levels, but the seed actually shuffles parents
    assert(seeded.map(t => t._1 -> t._3).toMap == minTree.map(t => t._1 -> t._3).toMap)
    assert(seeded.toSet != minTree.toSet, "seed had no effect on parent picks")
    // direction-forced variants agree (the candidate sets are identical)
    def rows(alpha: Double) =
      BFS.parents(edges, root, alpha = alpha, seed = Some(42L)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(0.0) == seeded.toSet && rows(Double.MaxValue) == seeded.toSet)
  }

  test("bfs validator detects a corrupted tree") {
    val s = spark
    import s.implicits._
    val tree = BFS.parents(edges, root)
    // corrupt: point one non-root vertex at itself as parent
    val victim = tree.where(col("vid") =!= root)
      .orderBy("vid").limit(1).collect()(0).getLong(0)
    val bad = tree.withColumn("parent",
      when(col("vid") === victim, col("vid")).otherwise(col("parent")))
    val checks = BFS.validateParents(edges, bad, root).collect()
    assert(checks.exists(_.getLong(1) > 0L))
  }

  test("rcm double-sweep ordering is a permutation and oracle-shaped") {
    val r = RCM.order(edges).collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = r.length
    assert(r.map(_._2).sorted.toSeq == (0L until n).toSeq, "0-based permutation")
  }

  /** Cuthill-McKee rank from a GIVEN root — the pre-double-sweep rule, for
    * the bandwidth-no-worse comparison. */
  private def cmBandwidth(e: org.apache.spark.sql.DataFrame,
                          ps: Seq[(Long, Long)], root: Long): Long = {
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val levels = BFS.levels(e, root, 50).select(col("vid").as("v"), col("dist"))
    val n = levels.count()
    val rank = graft.graph.Ranking.globalRank(levels.join(deg, Seq("v")),
        Seq(col("dist").asc, col("deg").asc, col("v").asc), "rank")
      .collect().map(r => r.getAs[Long]("v") -> (n - 1 - r.getAs[Long]("rank"))).toMap
    ps.filter(p => rank.contains(p._1) && rank.contains(p._2))
      .map { case (a, b) => math.abs(rank(a) - rank(b)) }.max
  }

  test("double-sweep root gives no-worse bandwidth than the min-degree root") {
    // long grid: the canonical RCM-friendly mesh
    val w = 4; val h = 20
    def id(x: Int, y: Int) = (y * w + x).toLong
    val gridPairs = (for { y <- 0 until h; x <- 0 until w
                           (dx, dy) <- Seq((1, 0), (0, 1))
                           if x + dx < w && y + dy < h }
      yield (id(x, y), id(x + dx, y + dy)))
    val ge = undirected(gridPairs)
    val deg = ge.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val root0 = deg.orderBy(col("deg").asc, col("v").asc).limit(1)
      .collect()(0).getLong(0)
    val oldBw = cmBandwidth(ge, gridPairs, root0)
    val order = RCM.order(ge).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newBw = gridPairs.map { case (a, b) => math.abs(order(a) - order(b)) }.max
    assert(newBw <= oldBw, s"double sweep worsened bandwidth: $newBw > $oldBw")
  }
}
