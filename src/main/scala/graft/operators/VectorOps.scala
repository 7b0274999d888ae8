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

  /** Gather through an index vector: out(i) = dense(sv(i)) — reference CC
    * `Extract` (Applications/CC.h:419-575). sv carries (v, xv) where xv is
    * the index to gather; dense carries (v, xv). Hot-target replication is
    * [[graft.linalg.Skew]]'s job when the gather key is skewed. */
  def gather(sv: DataFrame, dense: DataFrame): DataFrame =
    sv.select(col("v"), col("xv").cast("long").as("idx"))
      .join(dense.select(col("v").as("idx"), col("xv").as("gathered")), Seq("idx"))
      .select(col("v"), col("gathered").as("xv"))

  /** Scatter with duplicate min-reduction: out(target) = min(values) —
    * reference CC `Assign`/`ReduceAssign` (Applications/CC.h:746-1028),
    * whose duplicate pre-reduction before the wire is Spark's map-side
    * partial aggregate. updates carries (target, xv). */
  def scatterMin(dense: DataFrame, updates: DataFrame): DataFrame = {
    val mins = updates.groupBy(col("target").as("v")).agg(min(col("xv")).as("upd"))
    dense.join(mins, Seq("v"), "left")
      .select(col("v"), least(col("xv"), coalesce(col("upd"), col("xv"))).as("xv"))
  }

  /** Distinct values with min-index representative — reference
    * FullyDistSpVec::Uniq (FullyDistSpVec.cpp:890-957). */
  def uniq(vec: DataFrame): DataFrame =
    vec.groupBy(col("xv")).agg(min(col("v")).as("v")).select(col("v"), col("xv"))

  /** Invert index↔value with a duplicate-resolving min — reference
    * FullyDistSpVec::Invert(dupOp) (FullyDistSpVec.h:89-93). */
  def invert(vec: DataFrame): DataFrame =
    vec.select(col("xv").cast("long").as("v"), col("v").as("value"))
      .groupBy("v").agg(min(col("value")).cast("double").as("xv"))

  /** Concatenate vectors with offset ids — reference Concatenate
    * (ParFriends.h:63-162). */
  def concat(a: DataFrame, b: DataFrame, offset: Long): DataFrame =
    a.unionByName(b.select((col("v") + offset).as("v"), col("xv")))

  /** Global argmin — reference FullyDistVec::MinElement (FullyDistVec.h:260). */
  def minElement(vec: DataFrame): DataFrame =
    vec.orderBy(col("xv").asc, col("v").asc).limit(1)

  /** k random non-isolated start candidates, seeded — reference
    * SelectCandidates (TopDownBFS.cpp:313-331). */
  def selectCandidates(degrees: DataFrame, k: Int, seed: Long): DataFrame =
    degrees.where(col("outdeg") > 0)
      .orderBy(xxhash64(lit(seed), col("v")), col("v"))
      .limit(k)
      .select(col("v"))
}
