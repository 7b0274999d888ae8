package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.Ranking
import graft.util.Checkpoints

/** Reverse Cuthill-McKee-style bandwidth-reducing ordering — the
  * reference's Ordering application (Applications/Ordering/RCM.cpp, after
  * Azad et al.'s parallel RCM).
  *
  * Variant implemented (same level-set relaxation of the strictly
  * sequential ordering as the reference):
  *  - root = PSEUDO-PERIPHERAL via the George-Liu double sweep (reference
  *    RCM.cpp's pseudo-peripheral root finder): start from the
  *    (degree, id)-minimum vertex, BFS, take the farthest vertex
  *    (max level, then min degree, then min id — pinned tiebreaks) as the
  *    root. The double sweep lands on/near the diameter's end, which is
  *    what makes level sets thin and the bandwidth small on meshes;
  *  - level sets = BFS levels from that root ([[BFS]] — shared
  *    direction-optimizing kernel);
  *  - within the ordering, vertices sort by (level, degree, id) — the
  *    Cuthill-McKee level-set/degree rule with id tiebreak (exact
  *    parent-rank refinement is inherently sequential; RCM.cpp relaxes it
  *    the same way per level set);
  *  - ranks are REVERSED (the R in RCM).
  *
  * Ranks come from [[Ranking.globalRank]] — range-partitioned two-phase
  * ranking, never a global single-partition window. Only the root's
  * connected component is ordered (reference RCM operates per component).
  *
  * @return (vid, rcm) — a 0-based permutation of the reached vertices
  */
object RCM {

  /** The double-sweep pseudo-peripheral root (exposed for the oracle and
    * the bandwidth specs). */
  def pseudoPeripheralRoot(edges: DataFrame, deg: DataFrame, maxDepth: Int): Long = {
    val root0 = deg.orderBy(col("deg").asc, col("v").asc).limit(1)
      .collect()(0).getLong(0)
    val sweep = BFS.levels(edges, root0, maxDepth)
    sweep.join(deg, sweep("vid") === deg("v"))
      .orderBy(col("dist").desc, col("deg").asc, col("vid").asc)
      .limit(1).collect()(0).getAs[Long]("vid")
  }

  def order(edges: DataFrame, maxDepth: Int = 50): DataFrame =
    Checkpoints.scoped(edges.sparkSession) {
      val deg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
        .persist()
      val root = pseudoPeripheralRoot(edges, deg, maxDepth)
      val levels = BFS.levels(edges, root, maxDepth)
        .select(col("vid").as("v"), col("dist"))
      val n = levels.count()
      val ranked = Ranking.globalRank(
        levels.join(deg, Seq("v")),
        Seq(col("dist").asc, col("deg").asc, col("v").asc), "rank")
      val out = ranked.select(col("v").as("vid"), (lit(n - 1) - col("rank")).as("rcm"))
      // scoped() materializes `out` before this frame is released
      deg.unpersist(false)
      out
    }
}
