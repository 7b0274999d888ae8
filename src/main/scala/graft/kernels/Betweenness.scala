package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** Batched Brandes betweenness centrality (reference BetwCent.cpp:100-237):
  * the fringe is an n×b matrix — here a DataFrame keyed by (s, v) so all
  * `b` sources advance in ONE SpMV-shaped join per level (their batched
  * `PSpGEMM<PlusTimes>` at BetwCent.cpp:185), and the dependency
  * back-propagation walks the stored levels in reverse with the same join
  * shape (their EWiseApply backprop at :204).
  *
  * Unweighted BFS variant (the reference's), exact for the given sources;
  * full-graph BC uses sources = all vertices (O(V·E) total — the b knob
  * trades memory for rounds exactly as in the reference).
  *
  * Storage hygiene: every per-level frame goes through a [[Checkpoints]]
  * tracker and is freed before return — with maxDepth 20 and 16 sources
  * the untracked version retained ~40 cached frames per call until the
  * ContextCleaner happened to GC them. Only the final (vid, bc) frame
  * stays materialized for the caller.
  */
object Betweenness {

  /** @param edges symmetric (src, dst)
    * @return (vid, bc): σ-weighted dependency sums from the given sources
    *         (v ≠ s), rounded to 6 decimals. */
  def forSources(edges: DataFrame, sources: Seq[Long],
                 maxDepth: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val cp = new Checkpoints(spark)

    // ---- forward: per (source, vertex) BFS level + path count σ ----
    var frontier = cp(sources.map(s => (s, s, 1.0)).toDF("s", "v", "sigma"))
    var levels = List(frontier) // deepest level first after the loop
    var visited = cp(frontier.select("s", "v"))
    var depth = 0
    var more = true
    while (more && depth < maxDepth) {
      depth += 1
      val next = cp(frontier.join(edges, frontier("v") === edges("src"))
        .groupBy(col("s"), col("dst").as("v"))
        .agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti"))
      if (next.isEmpty) { more = false; cp.free(next) }
      else {
        levels = next :: levels
        val prevVisited = visited
        visited = cp(visited.union(next.select("s", "v")))
        cp.free(prevVisited)
        frontier = next
      }
    }
    cp.free(visited)

    // ---- backward: δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)) ----
    var lowerDelta = cp(levels.head
      .select(col("s"), col("v"), col("sigma"), lit(0.0).as("delta")))
    cp.free(levels.head)
    var acc = lowerDelta.select(col("s"), col("v"), col("delta"))
    for (upper <- levels.tail) {
      val contribs = lowerDelta
        .select(col("s"), col("v").as("w"), col("sigma").as("wsigma"),
          col("delta").as("wdelta"))
        .join(edges.select(col("src").as("v"), col("dst").as("w")), Seq("w"))
        .join(upper.select(col("s"), col("v"), col("sigma")), Seq("s", "v"))
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sigma") / col("wsigma") * (col("wdelta") + 1.0)).as("contrib"))
      val upperDelta = cp(upper.select(col("s"), col("v"), col("sigma"))
        .join(contribs, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("contrib"), lit(0.0)).as("delta")))
      cp.free(upper) // level frame fully consumed
      acc = acc.union(upperDelta.select(col("s"), col("v"), col("delta")))
      lowerDelta = upperDelta
    }
    // Materialize the result BEFORE freeing the delta frames it reads from
    // (checkpoint lineage is truncated — a freed frame cannot recompute).
    val out = cp(acc.where(col("v") =!= col("s"))
      .groupBy(col("v").as("vid"))
      .agg(round(sum("delta"), 6).as("bc")))
    cp.freeAllExcept(out)
    out
  }
}
