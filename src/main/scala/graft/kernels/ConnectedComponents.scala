package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.{Select2ndMin, SpMV}

/** Connected components via FastSV-style min-label iteration
  * (reference Applications/FastSV.h:335-374; LACC semantics CC.h:1404-1544).
  *
  * Each iteration over symmetric edges:
  *   1. mngp(v)  = min over in-neighbors u of f(u)       — SpMV⟨Select2ndMin⟩
  *   2. hooking  : cand(L) = min over the tree {v : f(v)=L} of mngp(v) — the
  *      scatter-with-min-reduction of reference CC.h:746-1028 `Assign`; the
  *      candidate is folded back to EVERY tree member in the same join
  *      (hook + spread fused):  f'(v) = min(f(v), mngp(v), cand(f(v)))
  *   3. shortcut : f''(v) = f'(f'(v))                    — pointer jumping
  *      (reference FastSV.h:359-366 `Extract` gather), realized against the
  *      LABEL-RESTRICTED map only (one row per live label, not per vertex).
  *
  * Per-vertex labels are monotone non-increasing and component-closed, so
  * the fixpoint is the exact min vertex id per component — LACC `LabelCC`
  * semantics.
  *
  * Scale design (what survives 1000 executors):
  *  - the edge table is persisted ONCE (pre-partitioned by src in the
  *    shuffle-join regime) — per iteration only the n-row label vector
  *    moves, never the edges;
  *  - f ⋈ mngp is computed once and reused by hooking (round 1 of this
  *    engine joined it twice);
  *  - `hooks` (one row per live label) and the shortcut `labelMap` SHRINK
  *    geometrically: once the live-label count — tracked exactly by the
  *    convergence scan, and never increasing — drops under the broadcast
  *    ceiling, hooking and shortcutting become broadcast joins and the
  *    n-row tables stop shuffling entirely. On a web graph with a giant
  *    component this happens after round 1, cutting the serial floor from
  *    ~6 to ~2 exchanges per iteration;
  *  - convergence = unchanged label sum, one scan of the cached vector
  *    (the reference's cheap Allreduce test, FastSV.h:364), fused with the
  *    live-label count in the same aggregate.
  */
object ConnectedComponents {

  /** Vector sizes below this use a broadcast SpMV join (the persisted edge
    * table is never re-shuffled — CombBLAS's Allgatherv analog). Measured
    * crossover (BENCH.md round 2): broadcasting the label vector wins up to
    * ~1M connected vertices; past that the per-iteration driver collect is
    * the Amdahl bottleneck and the pre-partitioned shuffle join scales. */
  val BroadcastMax = 1000000L

  /** Broadcast ceiling for the per-iteration small tables (hooks/labelMap),
    * keyed by live-label count. */
  val SmallMax: Long =
    sys.env.getOrElse("SPARK_GRAFT_BCAST_MAX", "200000").toLong

  /** Vertex-id spaces up to this size run the in-memory label-vector
    * kernel ([[BlockCC]] — one treeAggregate job per round plus free
    * driver-side full pointer compression, ~4 rounds instead of ~14);
    * beyond it the fully-distributed relational FastSV runs. 2^23 labels
    * = 32 MB per per-partition accumulator — the array path's footprint
    * is O(V) per task, which is why its ceiling sits far below
    * [[BFS.BitmapMax]]'s. */
  val ArrayMax: Long =
    sys.env.getOrElse("SPARK_GRAFT_CC_ARRAY_MAX", (1L << 23).toString).toLong

  /** @param edges symmetric (src, dst); @return (vid: long, component: long) */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 50,
          broadcastMax: Long = BroadcastMax,
          arrayMax: Long = ArrayMax): DataFrame = {
    if (arrayMax > 0) {
      // Probe min ids too: negative vertex ids are legal on the relational
      // FastSV path but would mis-bucket in the packed-long block build —
      // fall through to relational rather than corrupt.
      val vr = vertices.agg(coalesce(max(col("v")), lit(-1L)),
        coalesce(min(col("v")), lit(0L))).first()
      val er = edges.agg(
        coalesce(greatest(max(col("src")), max(col("dst"))), lit(-1L)),
        coalesce(least(min(col("src")), min(col("dst"))), lit(0L))).first()
      val maxId = math.max(vr.getLong(0), er.getLong(0))
      val minId = math.min(vr.getLong(1), er.getLong(1))
      if (minId >= 0 && maxId >= 0 && maxId + 1 <= arrayMax)
        return BlockCC.run(edges, vertices, maxId, maxIters = maxIters)
    }
    fastsv(edges, vertices, maxIters, broadcastMax, None, None)
  }

  /** Checkpointed FastSV: commits every iteration's label vector to `store`
    * (atomic manifest + per-partition lineage + nnz/flop metrics) and
    * resumes from the latest snapshot — the convergence state (label sum,
    * live-label count) is re-derived from the loaded vector with the same
    * one-scan aggregate the loop already runs, so a resumed run continues
    * bit-identically. Pass `stopAfter` to abandon mid-run (crash
    * simulation). Always the fully-distributed relational kernel: per-round
    * parquet commits would dominate the in-memory array kernel's 1-3 s
    * rounds, and at the scale where resumability matters (above
    * [[ArrayMax]]) the relational path is the dispatch target anyway. */
  def resumable(edges: DataFrame, vertices: DataFrame,
                store: graft.checkpoint.SnapshotStore, maxIters: Int = 50,
                broadcastMax: Long = BroadcastMax,
                stopAfter: Option[Int] = None): DataFrame =
    fastsv(edges, vertices, maxIters, broadcastMax, Some(store), stopAfter)

  private def fastsv(edges: DataFrame, vertices: DataFrame, maxIters: Int,
                     broadcastMax: Long,
                     store: Option[graft.checkpoint.SnapshotStore],
                     stopAfter: Option[Int]): DataFrame = {
    val cp = new graft.util.Checkpoints(edges.sparkSession)
    val e = edges.select("src", "dst")
    // Isolated vertices are their own component by construction and can
    // never change label — iterating over them only pads every per-round
    // table AND keeps the live-label count pinned above the broadcast
    // ceiling (on RMAT/web graphs a third of the id space is isolated, so
    // without this the hooks/label-map tables never become broadcastable).
    val connected = cp(vertices
      .join(e.select(col("src").as("v")), Seq("v"), "left_semi"))
    val isolated = vertices.join(connected, Seq("v"), "left_anti")
    val nVerts = connected.count()
    val bcast = nVerts < broadcastMax
    val eP = (if (bcast) e else e.repartition(col("src"))).persist()
    val nnz = eP.count()
    val resumed = store.flatMap(_.latest())
    var f = resumed match {
      case Some(s) => cp(store.get.load(edges.sparkSession, s))
      case None =>
        val init = cp(connected.select(col("v"), col("v").as("label")))
        store.foreach(_.commit(init, 0, nnz, 0L))
        init
    }
    // Sum as DECIMAL(38) so 10^12 × 10^12-scale ids can't overflow.
    def scan(df: DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(sum(col("label").cast("decimal(38,0)")),
        count_distinct(col("label"))).first()
      (r.getDecimal(0), r.getLong(1))
    }
    // On resume the convergence state comes from the same one-scan
    // aggregate over the loaded vector (an extra fixpoint round is a no-op
    // by label monotonicity, so a run resumed at convergence still ends
    // with identical labels).
    var (prevSum, labelCount) = resumed match {
      case Some(_) => scan(f)
      case None => (scan(f)._1, nVerts) // live labels never grow
    }
    var changed = true
    var it = resumed.map(_.iteration).getOrElse(0)
    val limit = stopAfter.map(s => math.min(s, maxIters)).getOrElse(maxIters)
    while (changed && it < limit) {
      it += 1
      def small(df: DataFrame): DataFrame =
        if (labelCount < SmallMax) broadcast(df) else df
      // 1. neighbor-min of current labels
      val mngp = SpMV(eP, f.select(col("v"), col("label").as("xv")), Select2ndMin,
          broadcastX = bcast)
        .select(col("v"), col("yv").as("mngp"))
      val fm = f.join(mngp, Seq("v"), "left")
      // 2. hook + spread: candidate per tree, folded back to all members
      val hooks = fm.groupBy(col("label")).agg(min(col("mngp")).as("cand"))
      val hooked = fm.join(small(hooks), Seq("label"), "left")
        .select(col("v"),
          least(col("label"),
            coalesce(col("mngp"), col("label")),
            coalesce(col("cand"), col("label"))).as("label"))
      // 3. shortcut against the label-restricted map (small after round 1).
      // Post-hook label values are least(label, mngp, cand) — every one a
      // PRE-hook label of some vertex — so the map's domain is exactly
      // hooks' key set, already computed: no extra n-row distinct needed.
      val labelMap = hooked.join(small(hooks.select(col("label").as("v"))),
          Seq("v"), "left_semi")
        .select(col("v").as("pv"), col("label").as("glabel"))
      // (A second pointer-jump per round was tried and measured SLOWER at
      // scale-22 — the extra materialization outweighs the saved rounds.)
      val next = cp(hooked.join(small(labelMap), col("label") === col("pv"), "left")
        .select(col("v"), coalesce(col("glabel"), col("label")).as("label")))
      val (s, lc) = scan(next)
      // 2 flops per stored edge per round: the Select2ndMin compare in the
      // SpMV plus the hook/shortcut min fold.
      store.foreach(_.commit(next, it, nnz, 2L * nnz))
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      labelCount = lc
      cp.free(f)
      f = next
    }
    eP.unpersist(false)
    // `isolated` is an anti-join against `connected`, so the final result
    // still reads the connected frame — keep it and the final f; free the
    // superseded per-round frames (already freed in-loop; this catches the
    // initial f when the loop ran zero rounds).
    cp.freeAllExcept(f, connected)
    f.unionByName(isolated.select(col("v"), col("v").as("label")))
      .select(col("v").as("vid"), col("label").as("component"))
  }
}
