package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.Ranking

/** Distributed vector operators (SURVEY.md §2.5) — reference
  * FullyDistVec::sort / RandPerm (FullyDistVec.cpp:746-827), realized as
  * the same sample-sort shape Spark plans for range partitioning. */
object VectorOps {

  /** Global dense rank (0-based sort permutation) of rows under `sortCols`
    * — the caller must make the key chain a total order (tiebreaker!). */
  def sortPerm(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    Ranking.globalRank(df, sortCols, "rank")

  /** Seeded random permutation — reference FullyDistVec::RandPerm
    * (FullyDistVec.cpp:783-827): sort on deterministic hashed keys. */
  def randPerm(df: DataFrame, idCol: String, seed: Long): DataFrame =
    Ranking.globalRank(
      df.withColumn("__h", xxhash64(lit(seed), col(idCol))),
      Seq(col("__h"), col(idCol)), "rank").drop("__h")
}
