package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.BlockMatrix

/** PageRank over the 2D block-CSR representation — identical semantics to
  * [[PageRank]] (differential-tested), but the per-iteration multiply runs
  * the local CSR kernel inside each block instead of a row-level join.
  *
  * The out-degree normalization is folded into the block values at build
  * time (w = 1/outdeg(src)), making the matrix column-stochastic over
  * non-dangling sources — so the dangling mass needs no separate vector:
  *   sinkSum = Σx − Σ(Aᵀx)
  * (each non-dangling column sums to 1). One pass, no driver loop over data.
  */
object PageRankBlocked {

  def run(edges: DataFrame, vertices: DataFrame, blockSize: Int = 1024,
          iters: Int = 10, d: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val n = vertices.count()
    val maxId = vertices.agg(max(col("v"))).first().getLong(0)
    val nb = BlockMatrix.numBlocks(maxId + 1, blockSize)

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesNorm = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
    val blocks = BlockMatrix.fromEdges(edgesNorm, blockSize).persist()
    blocks.count()

    val cp = new graft.util.Checkpoints(spark)
    val verts = vertices.persist()
    var pr = cp(verts.select(col("v"), lit(1.0 / n).as("xv")))

    for (_ <- 1 to iters) {
      val xseg = BlockMatrix.toSegments(pr, blockSize, nb)
      val y = BlockMatrix.spmv(blocks, xseg, blockSize, 0.0, _ + _, _ * _)
      val yv = BlockMatrix.toVector(y, blockSize, suppress = Some(0.0))
      val sums = pr.agg(sum(col("xv")).as("sx"))
        .crossJoin(yv.agg(coalesce(sum(col("yv")), lit(0.0)).as("sy")))
      val prev = pr
      pr = cp(verts.join(yv, Seq("v"), "left")
        .crossJoin(broadcast(sums))
        .select(col("v"),
          (lit((1 - d) / n) +
            lit(d) * (coalesce(col("yv"), lit(0.0)) + (col("sx") - col("sy")) / n)).as("xv")))
      cp.free(prev)
    }
    blocks.unpersist(false); verts.unpersist(false)
    cp.freeAllExcept(pr)
    pr.select(col("v").as("vid"), col("xv").as("pr"))
  }
}
