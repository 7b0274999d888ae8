package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.RMat
import graft.kernels.PageRank

/** Two-cluster-size scaling evidence (BASELINE.json north_rule: ≥0.8
  * efficiency from N to 4N). No real cluster exists in this sandbox, so the
  * SAME job runs on the SAME deterministic input at two parallelism levels
  * (local[8] vs local[32]) and reports throughput at both.
  *
  * The input is a seeded RMAT graph big enough to be compute-bound (the
  * sf0.1 co-occurrence graph is scheduler-bound at 32 threads — fixed
  * per-stage latency dominates; see BENCH.md). Usage:
  *   SPARK_GRAFT_CPUS=8|32 runMain graft.ScalingBench [scale] [edgeFactor]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val scale = if (args.length > 0) args(0).toInt else 20
    val ef = if (args.length > 1) args(1).toInt else 8
    val iters = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = RMat.symmetricGraph(spark, scale, ef).persist()
    val nnz = edges.count()
    val verts = spark.range(1L << scale).toDF("v").persist()
    verts.count()
    // warmup
    PageRank.run(edges, verts, 1).count()
    val t0 = System.nanoTime()
    PageRank.run(edges, verts, iters).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val eps = iters * nnz / sec
    println(f"""{"metric":"pagerank_eps","value":$eps%.0f,"unit":"edges/sec","sec":$sec%.2f,"iters":$iters,"scale":$scale,"edgefactor":$ef,"nnz":$nnz,"cpus":$cpus}""")
    spark.stop()
  }
}
