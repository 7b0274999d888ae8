package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Direction-optimizing BFS — the reference's flagship Graph500 kernel
  * (top-down: TopDownBFS.cpp:427-466; direction-optimizing:
  * DirOptBFS.cpp:374-415 with the bottom-up probe of BFSFriends.h:458-565
  * over the BitMapFringe).
  *
  * Per level the fringe advances by ONE of two result-identical steps:
  *
  *  - TOP-DOWN (sparse fringe): next = distinct dst of edges whose src is
  *    in the fringe, minus visited — the SpMSpV⟨Select2nd,min⟩ of reference
  *    ParFriends.h:1738-1895 (with a single root every fringe vertex holds
  *    the same level, so the min collapses to a distinct). The fringe side
  *    of the join is BROADCAST only while it is genuinely sparse
  *    (< broadcastMax, the same dense/sparse switch as
  *    [[PageRank.BroadcastMax]]); past that it degrades to a shuffle-hash
  *    join — never an unconditional driver collect of an O(V) fringe.
  *
  *  - BOTTOM-UP (saturated fringe): on a web graph the mid-BFS fringe
  *    touches most edges, so instead the (now small) UNVISITED remainder
  *    probes its in-edges: keep only edges INTO unvisited vertices (a semi
  *    join that broadcasts the small unvisited set), then keep those whose
  *    src is in the fringe. Work is O(edges into unvisited), not
  *    O(fringe · deg) — Beamer's asymmetry, reference DirOptBFS.cpp:374-415.
  *
  * The switch mirrors the reference's fringe-density heuristic: bottom-up
  * when |unvisited| ≤ alpha · |fringe|. Both steps compute the identical
  * next fringe, so the heuristic affects cost only, never the result.
  * The "minus visited" step is the EWiseMult(exclude) anti-join
  * (reference ParFriends.h:2257, TopDownBFS.cpp:441).
  */
object BFS {

  /** Fringe sizes below this broadcast into the top-down join; above it the
    * broadcast build (a serial driver collect) is the Amdahl bottleneck and
    * the shuffle-hash join wins. */
  val BroadcastMax: Long =
    sys.env.getOrElse("SPARK_GRAFT_BCAST_MAX", "200000").toLong

  /** Levels from `root`, capped at `maxDepth`; unreached vertices omitted.
    * @param edges symmetric (src, dst)
    * @param alpha direction switch: bottom-up when |unvisited| ≤ alpha·|fringe|
    *              (0 forces pure top-down; Double.MaxValue forces bottom-up
    *              after level 0 — both used by the equivalence spec)
    * @return (vid: long, dist: long) */
  def levels(edges: DataFrame, root: Long, maxDepth: Int = 10,
             broadcastMax: Long = BroadcastMax,
             alpha: Double = 2.0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val cp = new graft.util.Checkpoints(spark)
    // Static operands built once: the edge table and the probe universe
    // (every vertex with at least one in-edge — symmetric edges, so src
    // covers it; isolated vertices are unreachable by construction).
    val e = edges.select("src", "dst").persist()
    val universe = e.select(col("src").as("v")).distinct().persist()
    val nAll = universe.count()

    var visited = cp(Seq((root, 0L)).toDF("v", "dist"))
    var frontier = visited.select("v")
    var frontierBack: DataFrame = null
    var depth = 0
    var frontierSize = 1L
    var visitedCount = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val unvisitedCount = nAll - visitedCount // upper bound on reachable-unvisited
      val nextV =
        if (unvisitedCount <= alpha * frontierSize) {
          // bottom-up: unvisited probe their in-edges for a fringe parent
          val unvisited = universe.join(visited.select("v"), Seq("v"), "left_anti")
          e.join(unvisited.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
            .join(frontier.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
            .select(col("dst").as("v")).distinct()
        } else {
          // top-down SpMSpV: adaptive broadcast of the sparse fringe
          val fsrc = frontier.withColumnRenamed("v", "src")
          val fx = if (frontierSize < broadcastMax) broadcast(fsrc)
                   else fsrc.hint("shuffle_hash")
          e.join(fx, Seq("src"), "left_semi")
            .select(col("dst").as("v")).distinct()
            .join(visited.select("v"), Seq("v"), "left_anti")
        }
      val next = cp(nextV.withColumn("dist", lit(depth.toLong)))
      frontierSize = next.count()
      if (frontierSize > 0) {
        val prev = visited
        visited = cp(visited.union(next))
        visitedCount += frontierSize
        cp.free(prev)
        // the previous level's frame fed nextV, which is materialized now
        if (frontierBack ne null) cp.free(frontierBack)
        frontierBack = next
        frontier = next.select("v")
      } else cp.free(next)
    }
    e.unpersist(false); universe.unpersist(false)
    // The per-level `next` frames are freed here; only the final visited
    // frame (the result) stays materialized for the caller.
    cp.freeAllExcept(visited)
    visited.select(col("v").as("vid"), col("dist"))
  }
}
