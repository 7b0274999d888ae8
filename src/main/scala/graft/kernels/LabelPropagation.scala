package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation with the argmax-count "semiring"
  * (reference Applications/CC_ipdps18/HPCGraph/0.1/labelprop.cpp:67-260).
  *
  * Per round, every vertex adopts the label most frequent among its
  * neighbors (edges are symmetric, so in+out neighbors as in the
  * reference); vertices with no neighbors keep their own label
  * (labelprop.cpp keep-own semantics). The reference's tiebreak is
  * hash-map iteration order (labelprop.cpp:227 `get_max_key`) — an
  * unspecified order — so we PIN the deterministic tiebreak
  * (max count, then min label) and encode the same rule in the oracle.
  *
  * The count-then-argmax is two hash aggregates; the rank-1 selection is a
  * window over (v) — all map-side combinable, no driver-side state. A fixed
  * round count keeps the result well-defined (synchronous LP may oscillate).
  */
object LabelPropagation {

  /** Vector sizes below this broadcast into the edge join. */
  val BroadcastMax = 5000000L

  /** @param edges symmetric (src, dst); @return (vid: long, label: long) */
  def run(edges: DataFrame, vertices: DataFrame, rounds: Int = 5): DataFrame = {
    val bcast = vertices.count() < BroadcastMax
    var labels = vertices.select(col("v"), col("v").as("label")).localCheckpoint()
    val byVertex = Window.partitionBy("v").orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      val lbl = labels.withColumnRenamed("v", "src")
      val counts = edges.join(if (bcast) broadcast(lbl) else lbl, Seq("src"))
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .withColumn("rn", row_number().over(byVertex))
        .where(col("rn") === 1)
        .select(col("v"), col("label").as("newLabel"))
      val prev = labels
      labels = labels.join(best, Seq("v"), "left")
        .select(col("v"), coalesce(col("newLabel"), col("label")).as("label"))
        .localCheckpoint()
      prev.unpersist(false)
    }
    labels.select(col("v").as("vid"), col("label"))
  }
}
