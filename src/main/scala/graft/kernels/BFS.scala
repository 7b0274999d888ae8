package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.{Select2ndMin, SpMV}

/** Top-down BFS — the reference's flagship Graph500 kernel
  * (reference TopDownBFS.cpp:427-466): iterate
  *   fringe = SpMV⟨Select2nd⟩(A, fringe); fringe = fringe ∖ visited
  * until the fringe empties.
  *
  * The frontier is a sparse vector (SpMSpV, reference ParFriends.h:
  * 1738-1895); early levels are tiny, so the frontier side of the join is
  * broadcast (AQE does this below the broadcast threshold — the analog of
  * the reference's hand-rolled sparse/dense switch, CC.h:1256-1294). The
  * "remove already-visited" step is the EWiseMult(exclude) anti-join
  * (reference ParFriends.h:2257, TopDownBFS.cpp:441).
  */
object BFS {

  /** Levels from `root`, capped at `maxDepth`; unreached vertices omitted.
    * @param edges symmetric (src, dst); @return (vid: long, dist: long) */
  def levels(edges: DataFrame, root: Long, maxDepth: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq((root, 0L)).toDF("v", "dist").localCheckpoint()
    var frontier = visited
    var depth = 0
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = SpMV(edges, frontier.select(col("v"), col("dist").as("xv")),
          Select2ndMin, broadcastX = true)
        .select(col("v"), (col("yv") + 1L).as("dist"))
        .join(visited.select("v"), Seq("v"), "left_anti")
        .localCheckpoint()
      frontierSize = next.count()
      if (frontierSize > 0) {
        val prev = visited
        visited = visited.union(next).localCheckpoint()
        prev.unpersist(false); frontier.unpersist(false)
        frontier = next
      }
    }
    visited.select(col("v").as("vid"), col("dist"))
  }
}
