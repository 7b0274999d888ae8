package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.{PlusTimes, SpMV}

/** PageRank over the (+, *) semiring — the flagship SpMV iteration.
  *
  * Semantics follow the reference implementation bundled with CombBLAS
  * (Applications/CC_ipdps18/HPCGraph/0.1/pagerank.cpp:59-182): damping
  * d = 0.85, init 1/n, out-degree normalization, dangling-vertex mass
  * redistributed uniformly each iteration:
  *   pr'(v) = (1-d)/n + d * (Σ_{(u,v)∈E} pr(u)/outdeg(u) + sinkSum/n)
  *
  * Scale design:
  *  - the edge⋈degree join is computed ONCE and persisted (the analog of
  *    building DCSC once, reference SpParMat.cpp:2893) — per iteration only
  *    the small pr vector moves;
  *  - the dangling mass is a 1-row aggregate cross-joined back in (no
  *    per-iteration driver action on the hot path);
  *  - `localCheckpoint` truncates lineage every iteration so planning cost
  *    stays O(1) in the iteration count (the analog of CombBLAS mutating
  *    vectors in place). On a real cluster this becomes a reliable
  *    checkpoint via [[graft.checkpoint.SnapshotStore]].
  */
object PageRank {

  /** @return (vid: long, pr: double rounded to 6 decimals) */
  def run(edges: DataFrame, vertices: DataFrame, iters: Int = 10,
          d: Double = 0.85): DataFrame =
    runExact(edges, vertices, iters, d)
      .select(col("v").as("vid"), round(col("r"), 6).as("pr"))

  /** Unrounded ranks (v: long, r: double). */
  def runExact(edges: DataFrame, vertices: DataFrame, iters: Int,
               d: Double): DataFrame = {
    val spark = edges.sparkSession
    val n = vertices.count()

    val outdeg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("outdeg"))
    // Static per-edge operand: (src, dst, outdeg(src)) — built once, reused
    // every iteration. Normalization at the source is CombBLAS DimApply
    // (reference SpParMat.cpp:801-887).
    val edgesDeg = edges.join(outdeg.withColumnRenamed("v", "src"), "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .persist()
    edgesDeg.count() // materialize before iterating

    val verts = vertices.persist()
    var pr = verts.select(col("v"), lit(1.0 / n).as("r")).localCheckpoint()

    for (_ <- 1 to iters) {
      val x = pr.join(outdeg, Seq("v"), "inner")
        .select(col("v"), (col("r") / col("outdeg")).as("xv"))
      val contribs = SpMV(edgesDeg.select("src", "dst"), x, PlusTimes)
      // Dangling (outdeg = 0) mass, kept lazy as a 1-row broadcastable DF.
      val sink = pr.join(outdeg, Seq("v"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("sinkSum"))
      val prev = pr
      pr = verts.join(contribs.withColumnRenamed("yv", "s"), Seq("v"), "left")
        .crossJoin(broadcast(sink))
        .select(col("v"),
          (lit((1 - d) / n) + lit(d) * (coalesce(col("s"), lit(0.0)) + col("sinkSum") / n)).as("r"))
        .localCheckpoint()
      prev.unpersist(false)
    }
    edgesDeg.unpersist(false)
    pr
  }
}
