package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, lit, count => fcount}

/** Triangle counting via masked SpGEMM of the triangular splits.
  *
  * The canonical CombBLAS composition: split A with `PruneI`
  * (reference SpParMat.h:162-175), wedge-build `B = L·U` via SUMMA SpGEMM
  * (reference ParFriends.h:1018-1123), mask `C = B .* A` with `EWiseMult`
  * (reference ParFriends.h:2187-2203), then `Reduce`
  * (reference SpParMat.cpp:888).
  *
  * Scale design:
  *  - DEGREE-ordered orientation (each undirected edge kept low→high in the
  *    (degree, id) total order): the triangle count is orientation-
  *    invariant, but this orientation minimizes Σ outdeg² — the wedge
  *    fan-out — which is what explodes on power-law hubs. The standard
  *    mitigation, equivalent to the reference's L·U split at its best.
  *  - the mask is a LEFT SEMI join: wedge payloads are never materialized.
  *  - adaptive broadcast: when the oriented edge list fits comfortably in
  *    an executor (< BroadcastMaxEdges), both the wedge join and the mask
  *    join broadcast it, so the (huge) wedge stream never shuffles — the
  *    explicit analog of CombBLAS's replicate-when-cheap cost model
  *    (reference Applications/CC.h:367-376). Past the threshold the plan
  *    degrades to shuffle joins and AQE handles residual skew.
  */
object Triangles {

  val BroadcastMaxEdges = 8000000L

  /** @param edges symmetric (src, dst); @return single row (triangles: long) */
  def count(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("u")).agg(fcount(lit(1)).as("d"))
    val l = edges
      .join(deg.select(col("u").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("u").as("dst"), col("d").as("dd")), "dst")
      .where(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"))
      .persist()
    val nL = l.count()
    def maybeBcast(df: DataFrame): DataFrame =
      if (nL < BroadcastMaxEdges) broadcast(df) else df

    val wedges = l.join(
        maybeBcast(l.select(col("a").as("b"), col("b").as("c"))), "b")
      .select(col("a"), col("c"))
    val closed = wedges.join(
      maybeBcast(l.select(col("a"), col("b").as("c"))), Seq("a", "c"), "left_semi")
    // Materialize before unpersisting `l` — otherwise the cached oriented
    // edge list leaks executor storage across repeated calls in a session.
    val n = closed.agg(fcount(lit(1)).as("triangles")).first().getLong(0)
    l.unpersist(false)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq(n).toDF("triangles")
  }
}
