package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.checkpoint.SnapshotStore
import graft.linalg.{PlusTimes, SpMV}

/** PageRank over the (+, *) semiring — the flagship SpMV iteration.
  *
  * Semantics follow the reference implementation bundled with CombBLAS
  * (Applications/CC_ipdps18/HPCGraph/0.1/pagerank.cpp:59-182): damping
  * d = 0.85, init 1/n, out-degree normalization, dangling-vertex mass
  * redistributed uniformly each iteration:
  *   pr'(v) = (1-d)/n + d * (Σ_{(u,v)∈E} pr(u)/outdeg(u) + sinkSum/n)
  *
  * Scale design:
  *  - the edge⋈degree join is computed ONCE and persisted (the analog of
  *    building DCSC once, reference SpParMat.cpp:2893) — per iteration only
  *    the small pr vector moves;
  *  - the dangling mass is a 1-row aggregate cross-joined back in (no
  *    per-iteration driver action on the hot path);
  *  - `localCheckpoint` truncates lineage every iteration so planning cost
  *    stays O(1) in the iteration count (the analog of CombBLAS mutating
  *    vectors in place);
  *  - [[resumable]] commits every iteration to a [[SnapshotStore]]
  *    (Iceberg-style manifest with per-partition lineage + nnz/flop
  *    metrics) and restarts bit-exactly from the latest snapshot.
  */
object PageRank {

  /** @return (vid: long, pr: double rounded to 6 decimals) */
  def run(edges: DataFrame, vertices: DataFrame, iters: Int = 10,
          d: Double = 0.85): DataFrame =
    runExact(edges, vertices, iters, d)
      .select(col("v").as("vid"), round(col("r"), 6).as("pr"))

  private case class Ctx(edges: DataFrame, outdeg: DataFrame,
                         verts: DataFrame, n: Long, nnz: Long)

  private def prepare(edges: DataFrame, vertices: DataFrame): Ctx = {
    val n = vertices.count()
    val outdeg = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("outdeg"))
      .persist()
    val verts = vertices.persist()
    val e = edges.persist()
    val nnz = e.count()
    Ctx(e, outdeg, verts, n, nnz)
  }

  /** One synchronous iteration (pure function of the previous vector). */
  private def step(ctx: Ctx, pr: DataFrame, d: Double): DataFrame = {
    val x = pr.join(ctx.outdeg.withColumnRenamed("v", "v"), Seq("v"), "inner")
      .select(col("v"), (col("r") / col("outdeg")).as("xv"))
    val contribs = SpMV(ctx.edges, x, PlusTimes)
    val sink = pr.join(ctx.outdeg, Seq("v"), "left_anti")
      .agg(coalesce(sum(col("r")), lit(0.0)).as("sinkSum"))
    ctx.verts.join(contribs.withColumnRenamed("yv", "s"), Seq("v"), "left")
      .crossJoin(broadcast(sink))
      .select(col("v"),
        (lit((1 - d) / ctx.n) +
          lit(d) * (coalesce(col("s"), lit(0.0)) + col("sinkSum") / ctx.n)).as("r"))
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
    ctx.edges.unpersist(false); ctx.outdeg.unpersist(false)
    pr
  }

  /** Checkpointed run: commits every iteration's vector to `store` and
    * resumes from the latest snapshot (bit-exact continuation). Pass
    * `stopAfter` to abandon the run mid-way (crash simulation / test).
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
    ctx.edges.unpersist(false); ctx.outdeg.unpersist(false)
    pr
  }
}
