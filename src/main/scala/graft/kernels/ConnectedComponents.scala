package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.{Select2ndMin, SpMV}

/** Connected components via FastSV-style min-label iteration
  * (reference Applications/FastSV.h:335-374; LACC semantics CC.h:1404-1544).
  *
  * Each iteration over symmetric edges:
  *   1. mngp(v)  = min over in-neighbors u of f(u)        — SpMV⟨Select2ndMin⟩
  *   2. hooking  : cand(f(v)) = min(mngp(v)) grouped by f(v) — the scatter
  *      with min-duplicate-reduction of reference CC.h:746-1028 `Assign`,
  *      realized as groupBy(target).agg(min) (partial agg = their
  *      pre-reduction of duplicates before the wire, CC.h:580-737)
  *   3. shortcut : f(v) = f(f(v))                          — pointer jumping,
  *      a self-join (reference FastSV.h:359-366 `Extract` gather)
  * Converges in O(log n) rounds to the min vertex id per component — exact
  * labels, matching LACC's `LabelCC` semantics.
  */
object ConnectedComponents {

  /** Vector sizes below this use a broadcast SpMV join (the persisted edge
    * table is never re-shuffled — CombBLAS's Allgatherv analog). */
  val BroadcastMax = 5000000L

  /** @param edges symmetric (src, dst); @return (vid: long, component: long) */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 50): DataFrame = {
    val bcast = vertices.count() < BroadcastMax
    var f = vertices.select(col("v"), col("v").as("label")).localCheckpoint()
    // Labels are monotone non-increasing, so convergence = unchanged label
    // sum — one scan of the cached vector instead of a join+count
    // (the analog of the reference's cheap Allreduce convergence test,
    // FastSV.h:364). Sum as DECIMAL(38) so 10^12 × 10^12-scale ids can't
    // overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0)
    var prevSum = labelSum(f)
    var changed = true
    var it = 0
    while (changed && it < maxIters) {
      it += 1
      // 1. neighbor-min of current labels
      val mngp = SpMV(edges, f.select(col("v"), col("label").as("xv")), Select2ndMin,
          broadcastX = bcast)
        .select(col("v"), col("yv").as("mngp"))
      // 2. hook: propose min(mngp(v)) to each current root f(v)
      val hooks = f.join(mngp, Seq("v"))
        .groupBy(col("label").as("v"))
        .agg(min(col("mngp")).as("cand"))
      val hooked = f.join(mngp, Seq("v"), "left").join(hooks, Seq("v"), "left")
        .select(col("v"),
          least(col("label"),
            coalesce(col("mngp"), col("label")),
            coalesce(col("cand"), col("label"))).as("label"))
      // 3. shortcut: f(v) = f(f(v))
      val parents = hooked.select(col("label").as("pv"), col("v"))
      val next = parents
        .join(hooked.select(col("v").as("pv"), col("label").as("glabel")), Seq("pv"))
        .select(col("v"), col("glabel").as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      f.unpersist(false)
      f = next
    }
    f.select(col("v").as("vid"), col("label").as("component"))
  }
}
