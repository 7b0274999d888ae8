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
    * @param recoverNum re-admit the top-recoverNum entries of a column the
    *        hard threshold over-pruned (kept nnz < recoverNum AND kept mass
    *        < recoverPct) — the MCL.cpp -R/-pct knobs scaled for test
    *        graphs; 0 disables recovery (prune+select only)
    * @param phaseFlopBudget memory bound on a single expansion job: when
    *        the estimated expansion flops (reference EstimateFLOP,
    *        ParFriends.h:358-444) exceed it, the expansion runs in
    *        ceil(flops/budget) output-column phases, each materialized
    *        before the next starts — the relational analog of the
    *        reference's CalculateNumberOfPhases / MemEfficientSpGEMM
    *        integration into HipMCL (ParFriends.h:452-745). Expansion
    *        densifies precisely mid-run, which is why the bound lives
    *        INSIDE the loop, not only in the standalone SpGEMM.
    * @param store optional snapshot store: each iteration's matrix is
    *        committed with its nnz and estimated flops, so the manifest
    *        chain records the phase decision (phases =
    *        ceil(flops/budget)) exactly as the reference logs it
    * @return (vid: long, cluster: long) — cluster = min vid of its cluster */
  def run(edges: DataFrame, vertices: DataFrame,
          inflation: Double = 2.0, maxIters: Int = 20,
          epsilon: Double = 1e-4, pruneThreshold: Double = 1e-4,
          selectTop: Int = 50, recoverNum: Int = 10,
          recoverPct: Double = 0.5,
          phaseFlopBudget: Long = 500000000L,
          store: Option[graft.checkpoint.SnapshotStore] = None): DataFrame = {

    // AdjustLoops: ensure a self-loop per vertex (reference MCL.cpp:463)
    val cp = new graft.util.Checkpoints(edges.sparkSession)
    val selfLoops = vertices.select(col("v").as("src"), col("v").as("dst"), lit(1.0).as("w"))
    var a = cp(normalizeColumns(
      edges.select("src", "dst", "w").unionByName(selfLoops)
        .groupBy("src", "dst").agg(sum("w").as("w"))))

    var chaos = Double.MaxValue
    var it = 0
    while (chaos > epsilon && it < maxIters) {
      it += 1
      val flops = estimateFlops(a)
      val phases = math.max(1L, (flops + phaseFlopBudget - 1) / phaseFlopBudget).toInt
      val expanded = expandPhased(a, phases, cp)
      val inflated = expanded.select(col("src"), col("dst"),
        pow(col("w"), inflation).as("w"))
      val pruned = pruneRecoverySelect(normalizeColumns(inflated),
        pruneThreshold, selectTop, recoverNum, recoverPct, cp)
      val prev = a
      a = cp(normalizeColumns(pruned))
      chaos = chaosOf(a)
      store.foreach { st =>
        val nnz = a.count()
        st.commit(a, it, nnz, flops)
      }
      cp.free(prev)
      cp.freeAllExcept(a) // drops the round's phase + `ranked` frames
    }
    // Interpret: clusters = connected components of the attractor pattern
    val pattern = a.where(col("w") > lit(1e-9)).select("src", "dst")
    val sym = pattern.unionByName(
      pattern.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val clusters = ConnectedComponents.run(sym, vertices)
      .select(col("vid"), col("component").as("cluster"))
    // CC materialized everything it needs from `a` during the call above —
    // the returned plan reads only CC-internal checkpoints.
    cp.freeAll()
    clusters
  }

  /** Gate-mode MCL: the same expand → inflate → normalize → prune/recover/
    * select pipeline as [[run]], with every FP-order-sensitive reduction
    * PINNED to a left fold over value-sorted operands so an independent
    * engine (the DuckDB oracle, [[graft.oracle.GraphOracles.mclSql]])
    * reproduces bit-identical doubles:
    *
    *  - column sums (MakeColStochastic, MCL.cpp:389-395) and expansion
    *    dot products (MCL.cpp:574) are `aggregate(array_sort(
    *    collect_list(...)))` — a sequential fold in sorted order, which
    *    DuckDB's `list_sum(list_sort(list(...)))` evaluates identically
    *    (both are left folds; equal elements are adjacent after the sort,
    *    so their internal order cannot change the fold);
    *  - inflation is fixed at r = 2 and spelled w·w (pow() tie-rules
    *    differ across libm builds; multiplication is IEEE-exact);
    *  - the chaos early-exit is replaced by a FIXED iteration count
    *    (chaos is a diagnostic here, not a gate input).
    *
    * Every comparison downstream (prune threshold, recovery mode, the
    * (w desc, src asc) select window) then sees identical doubles, so the
    * final attractor pattern — and the cluster assignment it induces
    * (Interpret, MCL.cpp:373-386) — hash-matches across engines. The
    * collect_list groups are single matrix columns (≤ selectTop + recovery
    * entries after the first prune), so the pinned fold is gate-scale
    * bounded, not a scale path; [[run]] remains the throughput kernel.
    *
    * @return (vid, cluster) — cluster = min vid of the vertex's cluster */
  def gateRun(edges: DataFrame, vertices: DataFrame, iters: Int = 3,
              pruneThreshold: Double = 1e-4, selectTop: Int = 50,
              recoverNum: Int = 10, recoverPct: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.Column
    val cp = new graft.util.Checkpoints(edges.sparkSession)
    def pinnedSum(c: Column): Column =
      aggregate(array_sort(collect_list(c)), lit(0.0), (acc, x) => acc + x)
    def normalize(m: DataFrame): DataFrame = {
      val cs = m.groupBy("dst").agg(pinnedSum(col("w")).as("csum"))
      m.join(cs, "dst")
        .select(col("src"), col("dst"), (col("w") / col("csum")).as("w"))
    }
    // AdjustLoops (MCL.cpp:463): edges are loop-free and the loop rows are
    // src==dst, so the union has no duplicate cells — no cell-merge sum.
    val selfLoops = vertices.select(col("v").as("src"), col("v").as("dst"),
      lit(1.0).as("w"))
    var a = cp(normalize(edges.select("src", "dst", "w").unionByName(selfLoops)))
    for (_ <- 1 to iters) {
      val expanded = a.as("l").join(a.as("r"), col("l.dst") === col("r.src"))
        .groupBy(col("l.src").as("src"), col("r.dst").as("dst"))
        .agg(pinnedSum(col("l.w") * col("r.w")).as("w"))
      val inflated = expanded.select(col("src"), col("dst"),
        (col("w") * col("w")).as("w"))
      val normed = normalize(inflated)
      // prune → recover → select with the keptSum stat pinned the same way
      val byCol = Window.partitionBy("dst").orderBy(col("w").desc, col("src").asc)
      val ranked = cp(normed.withColumn("rn", row_number().over(byCol)))
      val stats = ranked.groupBy("dst").agg(
        count(lit(1)).as("allNnz"),
        sum(when(col("w") > pruneThreshold, 1L).otherwise(0L)).as("keptNnz"),
        pinnedSum(when(col("w") > pruneThreshold, col("w"))).as("keptSum"))
      val mode = stats
        .withColumn("doRecover", col("keptNnz") < recoverNum &&
          col("allNnz") > col("keptNnz") && col("keptSum") < recoverPct)
        .withColumn("doSelect", !col("doRecover") && col("keptNnz") > selectTop)
        .select("dst", "doRecover", "doSelect")
      val thrRec = ranked.where(col("rn") === recoverNum)
        .select(col("dst"), col("w").as("thrRec"))
      val thrSel = ranked.where(col("rn") === selectTop)
        .select(col("dst"), col("w").as("thrSel"))
      val pruned = ranked.join(mode, "dst")
        .join(thrRec, Seq("dst"), "left")
        .join(thrSel, Seq("dst"), "left")
        .where(
          when(col("doRecover"),
            col("w") >= coalesce(col("thrRec"), lit(Double.NegativeInfinity)))
          .when(col("doSelect"), col("w") >= col("thrSel"))
          .otherwise(col("w") > pruneThreshold))
        .select("src", "dst", "w")
      val prev = a
      a = cp(normalize(pruned))
      cp.free(prev)
      cp.freeAllExcept(a)
    }
    val pattern = a.where(col("w") > lit(1e-9)).select("src", "dst")
    val sym = pattern.unionByName(
      pattern.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val clusters = ConnectedComponents.run(sym, vertices)
      .select(col("vid"), col("component").as("cluster"))
    cp.freeAll()
    clusters
  }

  /** Expansion flop estimate for A·A: Σ_k nnz(column k of left) ·
    * nnz(row k of right) — the reference's EstimateFLOP
    * (ParFriends.h:358-444), two map-side-combined degree aggregates and
    * one keyed join. */
  def estimateFlops(a: DataFrame): Long = {
    val byDst = a.groupBy(col("dst").as("k")).agg(count(lit(1)).as("cd"))
    val bySrc = a.groupBy(col("src").as("k")).agg(count(lit(1)).as("cs"))
    byDst.join(bySrc, "k")
      .agg(coalesce(sum(col("cd") * col("cs")), lit(0L)))
      .first().getLong(0)
  }

  /** A·A in `phases` disjoint output-column groups (phase of an output
    * cell = hash of its dst), each phase MATERIALIZED before the next
    * starts so peak accumulator memory is bounded by ~flops/phases — the
    * relational analog of the reference's column-range phases in
    * MemEfficientSpGEMM (ParFriends.h:452-745). Output cells land in
    * exactly one phase, so the union is the exact unphased product (no
    * re-aggregation needed). */
  def expandPhased(a: DataFrame, phases: Int,
                   cp: graft.util.Checkpoints): DataFrame = {
    if (phases <= 1) MatrixOps.spgemm(a, a, PlusTimes)
    else (0 until phases).map { p =>
      cp(MatrixOps.spgemm(a, a.where(pmod(col("dst"), lit(phases)) === p),
        PlusTimes))
    }.reduce(_ unionByName _)
  }

  /** MakeColStochastic (reference MCL.cpp:389-395). */
  def normalizeColumns(m: DataFrame): DataFrame = {
    val colSums = m.groupBy(col("dst")).agg(sum("w").as("csum"))
    m.join(colSums, "dst").select(col("src"), col("dst"), (col("w") / col("csum")).as("w"))
  }

  /** Hard-threshold prune + per-column top-S select (reference
    * MCLPruneRecoverySelect, ParFriends.h:188-356; select-only form). */
  def select(m: DataFrame, threshold: Double, top: Int): DataFrame = {
    val byCol = Window.partitionBy("dst").orderBy(col("w").desc, col("src").asc)
    m.where(col("w") >= threshold)
      .withColumn("rn", row_number().over(byCol))
      .where(col("rn") <= top)
      .select("src", "dst", "w")
  }

  /** Full prune → recover → select (reference MCLPruneRecoverySelect,
    * ParFriends.h:188-356). Per column the effective keep-rule is:
    *  - RECOVER (hard threshold kept < recoverNum entries AND < recoverPct
    *    of the pre-prune entry count remained... precisely: kept nnz <
    *    recoverNum, kept nnz < unpruned nnz, kept mass < recoverPct):
    *    keep w ≥ the recoverNum-th largest UNPRUNED value (Kselect on A) —
    *    over-pruned columns re-admit their top entries;
    *  - SELECT (kept nnz > selectNum): keep w ≥ the selectNum-th largest
    *    value (ties at the boundary survive, as the reference's
    *    PruneColumn-by-value does);
    *  - otherwise keep w > threshold (the reference's Prune(less_equal)).
    * Deviation (documented): the reference's post-select second recovery
    * attempt (ParFriends.h:290-356) is dropped — it only fires when
    * selection itself re-starves a column, which the value-threshold
    * select here cannot do below selectNum. */
  def pruneRecoverySelect(m: DataFrame, threshold: Double, selectNum: Int,
                          recoverNum: Int, recoverPct: Double,
                          cp: graft.util.Checkpoints = null): DataFrame = {
    if (recoverNum <= 0) return select(m, threshold, selectNum)
    val byCol = Window.partitionBy("dst").orderBy(col("w").desc, col("src").asc)
    val ranked0 = m.withColumn("rn", row_number().over(byCol))
    val ranked = if (cp != null) cp(ranked0) else ranked0.localCheckpoint()
    val stats = ranked.groupBy("dst").agg(
      count(lit(1)).as("allNnz"),
      sum(when(col("w") > threshold, 1L).otherwise(0L)).as("keptNnz"),
      sum(when(col("w") > threshold, col("w")).otherwise(0.0)).as("keptSum"))
    val mode = stats
      .withColumn("doRecover", col("keptNnz") < recoverNum &&
        col("allNnz") > col("keptNnz") && col("keptSum") < recoverPct)
      .withColumn("doSelect", !col("doRecover") && col("keptNnz") > selectNum)
      .select("dst", "doRecover", "doSelect")
    val thrRec = ranked.where(col("rn") === recoverNum)
      .select(col("dst"), col("w").as("thrRec"))
    val thrSel = ranked.where(col("rn") === selectNum)
      .select(col("dst"), col("w").as("thrSel"))
    ranked.join(mode, "dst")
      .join(thrRec, Seq("dst"), "left")
      .join(thrSel, Seq("dst"), "left")
      .where(
        when(col("doRecover"),
          // column shorter than recoverNum → no kth value → keep all
          col("w") >= coalesce(col("thrRec"), lit(Double.NegativeInfinity)))
        .when(col("doSelect"), col("w") >= col("thrSel"))
        .otherwise(col("w") > threshold))
      .select("src", "dst", "w")
  }

  /** Chaos = max over columns of (colMax − Σ w²) · nnz
    * (reference MCL.cpp Chaos: colmaxs −= colssqs, then EWiseApply with
    * nnzPerColumn via multiplies, then max-reduce). */
  def chaosOf(m: DataFrame): Double = {
    val r = m.groupBy("dst")
      .agg(((max("w") - sum(col("w") * col("w"))) * count(lit(1))).as("c"))
      .agg(coalesce(max("c"), lit(0.0)))
      .first().getDouble(0)
    r
  }
}
