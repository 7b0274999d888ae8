package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.checkpoint.SnapshotStore

/** PageRank over the (+, *) semiring — the flagship SpMV iteration.
  *
  * Semantics follow the reference implementation bundled with CombBLAS
  * (Applications/CC_ipdps18/HPCGraph/0.1/pagerank.cpp:59-182): damping
  * d = 0.85, init 1/n, out-degree normalization, dangling-vertex mass
  * redistributed uniformly each iteration:
  *   pr'(v) = (1-d)/n + d * (Σ_{(u,v)∈E} pr(u)/outdeg(u) + sinkSum/n)
  *
  * Scale design (the plan you'd want at 1000 executors):
  *  - STATIC operands built once and persisted: the degree-normalized edge
  *    table (w = 1/outdeg — DimApply, reference SpParMat.cpp:801-887) and
  *    the dangling vertex set. Per iteration only the rank vector moves —
  *    the analog of building DCSC once (reference SpParMat.cpp:2893);
  *  - the rank vector is BROADCAST into the SpMV join when it fits
  *    (vertices < broadcastMax): the edge table is never re-shuffled, which
  *    is exactly CombBLAS's dense-vector Allgatherv down the process column
  *    (reference ParFriends.h:1938-2010). Past the threshold it degrades to
  *    a shuffle hash join and AQE takes over;
  *  - the contribution aggregate is map-side combined (their per-process
  *    local SpMV + MPI_Reduce along the proc row);
  *  - dangling mass: one semi-join aggregate on the cached vector, folded
  *    back lazily via a broadcast 1-row cross join — no driver action in
  *    the loop;
  *  - `localCheckpoint` truncates lineage every iteration so planning cost
  *    stays O(1) in iteration count;
  *  - [[resumable]] commits every iteration to a [[SnapshotStore]]
  *    (Iceberg-style manifest, per-partition lineage, nnz/flop metrics) and
  *    restarts from the latest snapshot.
  */
object PageRank {

  /** Vector sizes below this use a broadcast SpMV join. */
  val BroadcastMax = 5000000L

  /** @return (vid: long, pr: double rounded to 6 decimals) */
  def run(edges: DataFrame, vertices: DataFrame, iters: Int = 10,
          d: Double = 0.85): DataFrame =
    runExact(edges, vertices, iters, d)
      .select(col("v").as("vid"), round(col("r"), 6).as("pr"))

  private case class Ctx(edgesNorm: DataFrame, dangling: DataFrame,
                         verts: DataFrame, n: Long, nnz: Long, bcast: Boolean)

  private def prepare(edges: DataFrame, vertices: DataFrame): Ctx = {
    val n = vertices.count()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesNorm = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .persist()
    val nnz = edgesNorm.count()
    val verts = vertices.persist()
    val dangling = verts
      .join(outdeg.select(col("src").as("v")), Seq("v"), "left_anti").persist()
    dangling.count()
    Ctx(edgesNorm, dangling, verts, n, nnz, n < BroadcastMax)
  }

  /** One synchronous iteration (pure function of the previous vector). */
  private def step(ctx: Ctx, pr: DataFrame, d: Double): DataFrame = {
    val x = if (ctx.bcast) broadcast(pr) else pr
    val contribs = ctx.edgesNorm.join(x, ctx.edgesNorm("src") === x("v"))
      .groupBy(ctx.edgesNorm("dst").as("v"))
      .agg(sum(col("w") * col("r")).as("s"))
    val sink = pr.join(ctx.dangling, Seq("v"), "left_semi")
      .agg(coalesce(sum(col("r")), lit(0.0)).as("sinkSum"))
    ctx.verts.join(contribs, Seq("v"), "left")
      .crossJoin(broadcast(sink))
      .select(col("v"),
        (lit((1 - d) / ctx.n) +
          lit(d) * (coalesce(col("s"), lit(0.0)) + col("sinkSum") / ctx.n)).as("r"))
  }

  private def release(ctx: Ctx): Unit = {
    ctx.edgesNorm.unpersist(false); ctx.dangling.unpersist(false)
  }

  /** Unrounded ranks (v: long, r: double). */
  def runExact(edges: DataFrame, vertices: DataFrame, iters: Int,
               d: Double): DataFrame = {
    val ctx = prepare(edges, vertices)
    var pr = ctx.verts.select(col("v"), lit(1.0 / ctx.n).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val prev = pr
      pr = step(ctx, pr, d).localCheckpoint()
      prev.unpersist(false)
    }
    release(ctx)
    pr
  }

  /** Checkpointed run: commits every iteration's vector to `store` and
    * resumes from the latest snapshot. Pass `stopAfter` to abandon the run
    * mid-way (crash simulation / test).
    * @return (v, r) at the last completed iteration ≤ iters */
  def resumable(edges: DataFrame, vertices: DataFrame, store: SnapshotStore,
                iters: Int = 10, d: Double = 0.85,
                stopAfter: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    val ctx = prepare(edges, vertices)
    val resumed = store.latest()
    var iter = resumed.map(_.iteration).getOrElse(0)
    var pr = resumed match {
      case Some(s) => store.load(spark, s).localCheckpoint()
      case None =>
        val init = ctx.verts.select(col("v"), lit(1.0 / ctx.n).as("r")).localCheckpoint()
        store.commit(init, 0, ctx.nnz, 0L)
        init
    }
    val limit = stopAfter.map(s => math.min(s, iters)).getOrElse(iters)
    while (iter < limit) {
      iter += 1
      val prev = pr
      pr = step(ctx, pr, d).localCheckpoint()
      // 2 flops per stored edge per SpMV iteration (multiply + add).
      store.commit(pr, iter, ctx.nnz, 2L * ctx.nnz)
      prev.unpersist(false)
    }
    release(ctx)
    pr
  }
}
