package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.linalg.PlusTimes
import graft.operators.MatrixOps

/** MCL / HipMCL Markov clustering — the reference's flagship SpGEMM
  * pipeline (reference MCL.cpp, 860 lines):
  *
  *   loop: expand A ← A·A (MemEfficientSpGEMM, MCL.cpp:574 →
  *         ParFriends.h:452), inflate w ← w^r (Apply(exponentiate),
  *         MCL.cpp:447-450), MakeColStochastic (MCL.cpp:389-395),
  *         prune/select per column (MCLPruneRecoverySelect,
  *         ParFriends.h:188-356), Chaos convergence (MCL.cpp:407-421),
  *   then Interpret = symmetrize + connected components (MCL.cpp:373-386).
  *
  * Spark formulation: expand is the SpGEMM join+agg; inflation and
  * normalization are column expressions; prune/select is a hard threshold
  * plus a per-column top-S window (their prune→recover→select collapses to
  * threshold+select here — recovery matters only near memory limits, which
  * Spark handles by spilling); chaos is two aggregates. The reference's
  * multi-phase memory-bounded SpGEMM maps to AQE + spill — phases are not
  * re-implemented.
  *
  * Determinism: the top-S window orders by (w desc, src asc) — pinned
  * tiebreak; chaos loop has a fixed iteration cap.
  */
object MarkovClustering {

  /** @param edges symmetric weighted (src, dst, w), w > 0
    * @return (vid: long, cluster: long) — cluster = min vid of its cluster */
  def run(edges: DataFrame, vertices: DataFrame,
          inflation: Double = 2.0, maxIters: Int = 20,
          epsilon: Double = 1e-4, pruneThreshold: Double = 1e-4,
          selectTop: Int = 50): DataFrame = {

    // AdjustLoops: ensure a self-loop per vertex (reference MCL.cpp:463)
    val selfLoops = vertices.select(col("v").as("src"), col("v").as("dst"), lit(1.0).as("w"))
    var a = normalizeColumns(
      edges.select("src", "dst", "w").unionByName(selfLoops)
        .groupBy("src", "dst").agg(sum("w").as("w")))
      .localCheckpoint()

    var chaos = Double.MaxValue
    var it = 0
    while (chaos > epsilon && it < maxIters) {
      it += 1
      val expanded = MatrixOps.spgemm(a, a, PlusTimes)
      val inflated = expanded.select(col("src"), col("dst"),
        pow(col("w"), inflation).as("w"))
      val pruned = select(normalizeColumns(inflated), pruneThreshold, selectTop)
      a = normalizeColumns(pruned).localCheckpoint()
      chaos = chaosOf(a)
    }
    // Interpret: clusters = connected components of the attractor pattern
    val pattern = a.where(col("w") > lit(1e-9)).select("src", "dst")
    val sym = pattern.unionByName(
      pattern.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    ConnectedComponents.run(sym, vertices)
      .select(col("vid"), col("component").as("cluster"))
  }

  /** MakeColStochastic (reference MCL.cpp:389-395). */
  def normalizeColumns(m: DataFrame): DataFrame = {
    val colSums = m.groupBy(col("dst")).agg(sum("w").as("csum"))
    m.join(colSums, "dst").select(col("src"), col("dst"), (col("w") / col("csum")).as("w"))
  }

  /** Hard-threshold prune + per-column top-S select (reference
    * MCLPruneRecoverySelect, ParFriends.h:188-356). */
  def select(m: DataFrame, threshold: Double, top: Int): DataFrame = {
    val byCol = Window.partitionBy("dst").orderBy(col("w").desc, col("src").asc)
    m.where(col("w") >= threshold)
      .withColumn("rn", row_number().over(byCol))
      .where(col("rn") <= top)
      .select("src", "dst", "w")
  }

  /** Chaos = max over columns of (colMax − Σ w²) (reference MCL.cpp:407-421). */
  def chaosOf(m: DataFrame): Double = {
    val r = m.groupBy("dst")
      .agg((max("w") - sum(col("w") * col("w"))).as("c"))
      .agg(coalesce(max("c"), lit(0.0)))
      .first().getDouble(0)
    r
  }
}
