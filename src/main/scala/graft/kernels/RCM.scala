package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.Ranking

/** Reverse Cuthill-McKee-style bandwidth-reducing ordering — the
  * reference's Ordering application (Applications/Ordering/RCM.cpp, after
  * Azad et al.'s parallel RCM).
  *
  * Variant implemented (declared simplification, same spirit as the
  * reference's level-set relaxation of the strictly sequential ordering):
  *  - root = the (degree, id)-minimum vertex (the classic minimum-degree
  *    root choice; the reference's pseudo-peripheral double-sweep is an
  *    optimization of the same heuristic);
  *  - level sets = BFS levels from the root ([[BFS]] — shared
  *    direction-optimizing kernel);
  *  - within the ordering, vertices sort by (level, degree, id) — the
  *    Cuthill-McKee level-set/degree rule with id tiebreak (exact parent-
  *    rank refinement is inherently sequential; RCM.cpp relaxes it the
  *    same way per level set);
  *  - ranks are REVERSED (the R in RCM).
  *
  * Ranks come from [[Ranking.globalRank]] — range-partitioned two-phase
  * ranking, never a global single-partition window. Only the root's
  * connected component is ordered (reference RCM operates per component).
  *
  * @return (vid, rcm) — a 0-based permutation of the reached vertices
  */
object RCM {

  def order(edges: DataFrame, maxDepth: Int = 50): DataFrame = {
    val deg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
      .persist()
    val root = deg.orderBy(col("deg").asc, col("v").asc).limit(1)
      .collect()(0).getLong(0)
    val levels = BFS.levels(edges, root, maxDepth)
      .select(col("vid").as("v"), col("dist"))
    val n = levels.count()
    val ranked = Ranking.globalRank(
      levels.join(deg, Seq("v")),
      Seq(col("dist").asc, col("deg").asc, col("v").asc), "rank")
    val out = ranked.select(col("v").as("vid"), (lit(n - 1) - col("rank")).as("rcm"))
    deg.unpersist(false)
    out
  }
}
