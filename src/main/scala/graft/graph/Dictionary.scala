package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-key → dense Long id dictionary encoding — the Spark analog of
  * `ReadGeneralizedTuples` (reference SpParMat.cpp:3882-3971), which
  * exchanges unique labels, builds a global permutation, and returns the
  * id↔label mapper alongside the matrix.
  *
  * vid = global rank of the key in lexicographic order (dense 0..V-1,
  * deterministic, parallelism-independent), computed by [[Ranking]]'s
  * two-phase range-partitioned rank — no global single-partition window,
  * so the encoding survives 10^12 keys. The result does not depend on the
  * sampled range boundaries: the global rank of a distinct key is invariant
  * to where partitions split.
  */
object Dictionary {

  /** @param keys single-column DataFrame of (possibly duplicated) keys
    * @return (keyCol: string, vid: long), one row per distinct key */
  def encode(keys: DataFrame, keyCol: String = "url", parts: Int = 0): DataFrame = {
    val distinctKeys = keys.select(col(keyCol).as("key")).distinct()
    Ranking.globalRank(distinctKeys, Seq(col("key")), "vid", parts)
      .select(col("key").as(keyCol), col("vid"))
  }
}
