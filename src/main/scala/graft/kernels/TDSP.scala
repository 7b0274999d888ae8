package graft.kernels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-dependent single-source shortest paths — the reference's TDSP
  * application (reference TDSP/deliverable/tdsp/tdsp.cpp:116-138: the same
  * SpMV + EWiseApply label-correcting loop as SSSP, over a Node(dist,
  * parent) payload whose relaxation calls the edge's time-dependent
  * `arrivalTime(t)` instead of adding a static weight; the travel-time
  * profile is Ft.h:30-33).
  *
  * Semantics: `dist(v)` = earliest ARRIVAL time at v when departing `root`
  * at `startT`. Relaxation over edge (u→v, w):
  * `arrive(t, w) = t + (2 − 4·((t mod P)/P − 0.5)²)·w` — free-flow cost w
  * scaled by a periodic congestion factor in [1, 2] (1× at period
  * boundaries, 2× mid-period; the reference's documented profile with
  * P = 86400 s). The factor is continuous across period boundaries (both
  * ends evaluate to 1×) and ∂arrive/∂t = 1 − 8u·w/P > 0 whenever
  * w < P/4, so arrival is increasing in departure time (FIFO) for any
  * realistic edge cost and the label-correcting loop converges to the true
  * earliest arrivals — Dijkstra-valid, Bellman-Ford-exact. (For w ≥ P/4
  * the loop still converges, to the min-over-paths fixpoint of the
  * recurrence, which is what the oracle computes.)
  *
  * Spark shape: identical to [[SSSP]] (frontier-only relaxation, adaptive
  * fringe broadcast, map-side-combined min, per-round lineage truncation) —
  * the relaxation is a pure codegen'd column expression, written with a
  * pinned operation order so the DuckDB oracle reproduces it bit-for-bit.
  */
object TDSP {

  val Period = 86400.0

  /** Earliest arrival over one edge; operation order pinned (left-assoc
    * multiplies, remainder-then-divide) to match the oracle exactly. */
  def arrive(d: Column, w: Column): Column = {
    val u = (d % lit(Period)) / lit(Period) - lit(0.5)
    d + (lit(2.0) - lit(4.0) * u * u) * w
  }

  /** @param edges weighted (src, dst, w), w ≥ 0 (free-flow travel time)
    * @param startT departure time at the root
    * @return (vid: long, dist: double) — earliest arrival times */
  def run(edges: DataFrame, root: Long, startT: Double, maxIters: Int = 30,
          broadcastMax: Long = BFS.BroadcastMax): DataFrame =
    SSSP.run(edges, root, maxIters, broadcastMax, init = startT,
      relax = arrive)
}
