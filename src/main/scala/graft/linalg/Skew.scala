package graft.linalg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit power-law skew handling for the SpMV join.
  *
  * Web link graphs are hub-skewed (RMAT/Zipf in-degree). In the shuffle
  * join edges⋈x on src, a hub source key sends ALL its edge rows to one
  * reducer — the straggler that kills scaling at 1000 executors. CombBLAS
  * meets the same problem in its gather: it broadcasts hot targets when
  * `locLen·log p < totrecv` (reference Applications/CC.h:347-408
  * `replicate`, 580-737 `ReduceAssign` cost model).
  *
  * The Spark analog implemented here: split the vector into the (few) hub
  * entries and the long tail —
  *  - hub slice: map-side broadcast join (zero shuffle of the heavy edge
  *    rows; every partition multiplies its own hub edges locally);
  *  - tail slice: ordinary shuffle join (no skew left by construction);
  * then aggregate the UNION of both contribution streams once per dst.
  * Correct for every semiring because `add` runs once over the union.
  *
  * The final groupBy(dst) is safe on in-degree hubs because hash
  * aggregation is map-side partial — each partition pre-combines before the
  * exchange (the analog of the reference's scatter pre-reduction,
  * CC.h:580-737). AQE's skew-join splitting remains on underneath as a
  * second safety net for residual imbalance.
  */
object Skew {

  /** Sources with out-degree above `minDegree` — the hub set. */
  def hubs(edges: DataFrame, minDegree: Long): DataFrame =
    edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
      .where(col("deg") > minDegree)
      .select("v")

  /** Two-phase SALTED aggregation for skewed group keys: rows of a hot key
    * are spread over `salts` sub-keys (deterministic hash of the payload),
    * partially aggregated per (key, salt), then combined — so no single
    * reducer owns a hub's entire in-edge stream. Result-identical to a
    * direct groupBy for any associative+commutative semiring add.
    * (The repartitioning form of the same cost model [[spmv]] applies on
    * the join side; Spark's map-side partial agg already gives one level —
    * salting adds an explicit intermediate reduce for extreme in-degree.) */
  def saltedAggregate(contribs: DataFrame, sr: ColumnSemiring,
                      salts: Int = 16): DataFrame = {
    // Salt by the PRODUCING partition, never by the payload: hashing the
    // contribution value degenerates to a single bucket whenever a hub's
    // contributions share one value (unweighted edges × uniform x — the
    // common case). spark_partition_id spreads a hot key evenly over the
    // salt space by construction; the result is salt-invariant because
    // the semiring add is associative + commutative.
    contribs
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col("v"), col("__salt"))
      .agg(sr.add(col("c")).as("partial"))
      .groupBy(col("v"))
      .agg(sr.add(col("partial")).as("yv"))
  }

  /** Skew-aware SpMV: identical result to [[SpMV]], hub-broadcast plan. */
  def spmv(edges: DataFrame, x: DataFrame, sr: ColumnSemiring,
           minDegree: Long = 1000): DataFrame = {
    val hot = hubs(edges, minDegree).persist()
    val xHot = x.join(hot, Seq("v"), "left_semi")
    val xCold = x.join(hot, Seq("v"), "left_anti")
    val w = if (edges.columns.contains("w")) col("w") else lit(1.0)

    def contribs(xpart: DataFrame, bcast: Boolean): DataFrame = {
      val xx = if (bcast) broadcast(xpart) else xpart
      edges.join(xx, edges("src") === xx("v"))
        .select(edges("dst").as("v"), sr.multiply(w, xx("xv")).as("c"))
    }

    // Materialize before releasing the hub cache (a lazily returned plan
    // would silently recompute `hot` after unpersist — or leak it).
    val out = contribs(xHot, bcast = true)
      .union(contribs(xCold, bcast = false))
      .groupBy("v")
      .agg(sr.add(col("c")).as("yv"))
      .localCheckpoint()
    hot.unpersist(false)
    out
  }
}
