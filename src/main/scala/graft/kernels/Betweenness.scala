package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  */
object Betweenness {

  /** @param edges symmetric (src, dst)
    * @return (vid, bc): σ-weighted dependency sums from the given sources
    *         (v ≠ s), rounded to 6 decimals. */
  def forSources(edges: DataFrame, sources: Seq[Long],
                 maxDepth: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // ---- forward: per (source, vertex) BFS level + path count σ ----
    var frontier = sources.map(s => (s, s, 1.0)).toDF("s", "v", "sigma")
      .localCheckpoint()
    var levels = List(frontier) // deepest level first after the loop
    var visited = frontier.select("s", "v").localCheckpoint()
    var depth = 0
    var more = true
    while (more && depth < maxDepth) {
      depth += 1
      val next = frontier.join(edges, frontier("v") === edges("src"))
        .groupBy(col("s"), col("dst").as("v"))
        .agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) { more = false }
      else {
        levels = next :: levels
        visited = visited.union(next.select("s", "v")).localCheckpoint()
        frontier = next
      }
    }

    // ---- backward: δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w)) ----
    var lowerDelta = levels.head
      .select(col("s"), col("v"), col("sigma"), lit(0.0).as("delta"))
      .localCheckpoint()
    var acc = lowerDelta.select(col("s"), col("v"), col("delta"))
    for (upper <- levels.tail) {
      val contribs = lowerDelta
        .select(col("s"), col("v").as("w"), col("sigma").as("wsigma"),
          col("delta").as("wdelta"))
        .join(edges.select(col("src").as("v"), col("dst").as("w")), Seq("w"))
        .join(upper.select(col("s"), col("v"), col("sigma")), Seq("s", "v"))
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sigma") / col("wsigma") * (col("wdelta") + 1.0)).as("contrib"))
      val upperDelta = upper.select(col("s"), col("v"), col("sigma"))
        .join(contribs, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("contrib"), lit(0.0)).as("delta"))
        .localCheckpoint()
      acc = acc.union(upperDelta.select(col("s"), col("v"), col("delta")))
      lowerDelta = upperDelta
    }
    acc.where(col("v") =!= col("s"))
      .groupBy(col("v").as("vid"))
      .agg(round(sum("delta"), 6).as("bc"))
  }
}
