package graft.linalg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse matrix-vector multiply as a Catalyst-planned join + aggregate.
  *
  * CombBLAS SpMV (reference ParFriends.h:1938-2010) is: scatter x to the
  * diagonal, allgather down the process column, local DCSC multiply, reduce
  * along the process row. In Spark the identical dataflow is one shuffle
  * join on the inner index plus a hash aggregate with partial (map-side)
  * combine — Catalyst places the exchanges.
  *
  * Conventions: edges carry (src, dst[, w]); the vector x carries (v, xv).
  * Result carries (v, yv) keyed by destination.
  *
  * The sparse-vector case (SpMSpV, reference ParFriends.h:1738-1895) is the
  * same plan with a small x: pass `broadcastX = true` (the frontier fits in
  * memory) and the shuffle on the edge side disappears entirely — the analog
  * of CombBLAS's dense/sparse switch (reference Applications/CC.h:1256-1294),
  * which AQE also performs automatically under the broadcast threshold.
  */
object SpMV {

  /** y = Aᵀ ⊗ x over semiring `sr` (contributions flow src → dst). */
  def apply(edges: DataFrame, x: DataFrame, sr: ColumnSemiring,
            broadcastX: Boolean = false): DataFrame = {
    val xx = if (broadcastX) broadcast(x) else x
    val w = if (edges.columns.contains("w")) col("w") else lit(1.0)
    edges.join(xx, edges("src") === xx("v"))
      .groupBy(edges("dst").as("v"))
      .agg(sr.add(sr.multiply(w, xx("xv"))).as("yv"))
  }
}
