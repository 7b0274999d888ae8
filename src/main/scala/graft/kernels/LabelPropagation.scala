package graft.kernels

import org.apache.spark.sql.DataFrame
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
  * Scale design: the edge table is persisted ONCE (pre-partitioned by src
  * in the shuffle-join regime) — per round only the label vector moves.
  * The count-then-argmax is two hash aggregates, both map-side combinable:
  * the argmax is a struct-max (count, −label) — lexicographic struct
  * ordering implements the pinned tiebreak with partial aggregation, where
  * a row_number window would force a per-vertex sort instead. A fixed
  * round count keeps the result well-defined (synchronous LP may
  * oscillate).
  */
object LabelPropagation {

  /** Vector sizes below this broadcast into the edge join. */
  val BroadcastMax = 5000000L

  /** @param edges symmetric (src, dst); @return (vid: long, label: long) */
  def run(edges: DataFrame, vertices: DataFrame, rounds: Int = 5): DataFrame = {
    val cp = new graft.util.Checkpoints(edges.sparkSession)
    val bcast = vertices.count() < BroadcastMax
    val e = (if (bcast) edges.select("src", "dst")
             else edges.select("src", "dst").repartition(col("src"))).persist()
    e.count()
    var labels = cp(vertices.select(col("v"), col("v").as("label")))
    for (_ <- 1 to rounds) {
      val lbl = labels.withColumnRenamed("v", "src")
      val counts = e.join(if (bcast) broadcast(lbl) else lbl.hint("shuffle_hash"), Seq("src"))
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax-count with (max c, min label) tiebreak: labels are nonneg
      // vertex ids, so max over (c, −label) structs picks it exactly
      val best = counts.groupBy("v")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("newLabel"))
      val prev = labels
      labels = cp(labels.join(best, Seq("v"), "left")
        .select(col("v"), coalesce(col("newLabel"), col("label")).as("label")))
      cp.free(prev)
    }
    e.unpersist(false)
    cp.freeAllExcept(labels)
    labels.select(col("v").as("vid"), col("label"))
  }
}
