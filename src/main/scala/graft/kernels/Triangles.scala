package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting via masked SpGEMM of the triangular splits.
  *
  * The canonical CombBLAS composition: split A into L (strictly lower) with
  * `PruneI` (reference SpParMat.h:162-175), wedge-build `B = L·U` via SUMMA
  * SpGEMM (reference ParFriends.h:1018-1123), mask `C = B .* A` with
  * `EWiseMult` (reference ParFriends.h:2187-2203), then `Reduce`
  * (reference SpParMat.cpp:888).
  *
  * Spark plan: L is the oriented edge set (src < dst, each undirected edge
  * once); wedges are the self-equi-join on the middle vertex; the mask is a
  * LEFT SEMI join against L — Catalyst never materializes matched wedge
  * payloads, and the final count is a partial-aggregated scalar. The
  * degree-orientation (low→high id) bounds wedge fan-out on hubs — the
  * standard mitigation for power-law skew in L·U.
  */
object Triangles {

  /** @param edges symmetric (src, dst); @return single row (triangles: long) */
  def count(edges: DataFrame): DataFrame = {
    val l = edges.where(col("src") < col("dst")).select("src", "dst").persist()
    val e1 = l.select(col("src").as("a"), col("dst").as("b"))
    val e2 = l.select(col("src").as("b"), col("dst").as("c"))
    val wedges = e1.join(e2, "b").select("a", "c")
    val closed = wedges.join(
      l.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"), "left_semi")
    closed.agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }
}
