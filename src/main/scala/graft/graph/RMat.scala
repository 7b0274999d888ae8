package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pages.PageGen

/** Seeded R-MAT (Kronecker) edge generator — the Spark analog of
  * `DistEdgeList::GenGraph500Data` (reference DistEdgeList.cpp:223-289)
  * with the Graph500 initiator a=.57, b=c=.19, d=.05
  * (reference RefGen21.h:69-76).
  *
  * Every edge is a pure function of (seed, edgeIndex): `spark.range` +
  * `map`, no shuffle, byte-identical output at any parallelism — the same
  * property the reference gets from its per-rank deterministic streams.
  * Self-loops are kept here (the matrix build removes them), matching the
  * reference's generate-then-clean split.
  */
object RMat {
  val A = 0.57; val B = 0.19; val C = 0.19 // D = 0.05

  /** One endpoint-pair from the quadrant bit-recursion. */
  def edge(seed: Long, i: Long, scale: Int): (Long, Long) = {
    var rlo = 0L; var clo = 0L
    var level = 0
    while (level < scale) {
      val r = PageGen.u01(seed, i, level.toLong, 0x9E37L)
      val half = 1L << (scale - 1 - level)
      if (r < A) { /* top-left */ }
      else if (r < A + B) { clo += half }
      else if (r < A + B + C) { rlo += half }
      else { rlo += half; clo += half }
      level += 1
    }
    (rlo, clo)
  }

  /** (src, dst) edge table: 2^scale vertices, edgeFactor·2^scale edges. */
  def edges(spark: SparkSession, scale: Int, edgeFactor: Int = 16,
            seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val m = (1L << scale) * edgeFactor
    spark.range(m).map(i => edge(seed, i, scale)).toDF("src", "dst")
  }

  /** Cleaned symmetric graph: dedup, drop loops, add transposes — the
    * matrix-build step (reference SpParMat ctor + `A += Aᵀ`). */
  def symmetricGraph(spark: SparkSession, scale: Int, edgeFactor: Int = 16,
                     seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = edges(spark, scale, edgeFactor, seed).where(col("src") =!= col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }
}
