package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximal bipartite matching — the reference's maximal-matching
  * application family (Applications/BipartiteMatchings/
  * BPMaximalMatching.cpp, greedy variant).
  *
  * Mutual-min handshake per round over the ACTIVE edge set:
  *   1. every active row proposes to its minimum active column neighbor
  *      (one hash aggregate — the SpMV⟨Select2ndMin⟩ shape);
  *   2. every proposed column accepts its minimum proposing row — the
  *      accepted (row, col) pairs are genuine edges and pairwise disjoint;
  *   3. matched rows and columns leave the active set with their edges.
  * The loop drains the active set (each proposed column matches someone
  * each round), so on exit with no active edges the matching is MAXIMAL:
  * any unmatched edge would still be active. Deterministic at any
  * parallelism — min/min is order-free.
  *
  * Scale: two map-side-combinable aggregates plus two anti-joins per
  * round, all keyed — no driver-side state, no per-vertex loop.
  */
object BipartiteMatching {

  /** @param edges bipartite (r, c)
    * @return matched (r, c) pairs — a valid maximal matching */
  def run(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val cp = new graft.util.Checkpoints(edges.sparkSession)
    var active = cp(edges.select("r", "c"))
    var matched = cp(active.where(lit(false)))
    var remaining = active.count()
    var round = 0
    while (remaining > 0 && round < maxRounds) {
      round += 1
      val proposals = active.groupBy("r").agg(min("c").as("c"))
      val accepted = cp(proposals.groupBy("c").agg(min("r").as("r"))
        .select("r", "c"))
      val (prevM, prevA) = (matched, active)
      matched = cp(matched.unionByName(accepted))
      active = cp(prevA
        .join(accepted.select("r"), Seq("r"), "left_anti")
        .join(accepted.select("c"), Seq("c"), "left_anti"))
      remaining = active.count()
      cp.free(prevM); cp.free(prevA); cp.free(accepted)
    }
    cp.freeAllExcept(matched)
    matched
  }
}
