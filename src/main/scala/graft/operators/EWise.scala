package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized elementwise / indexing / assignment operators
  * (SURVEY.md §2.3, §2.6).
  */
object EWise {

  /** Generalized elementwise apply over the union of sparsity patterns —
    * reference EWiseApply (ParFriends.h:2207-2255) with its
    * allowANulls/allowBNulls semantics: a FULL OUTER join on the
    * coordinates with per-side defaults, combined by `f`.
    * intersect-only (allowIntersect semantics) = inner join. */
  def ewiseApply(a: DataFrame, b: DataFrame,
                 f: (Column, Column) => Column,
                 aDefault: Column = lit(0.0), bDefault: Column = lit(0.0),
                 join: String = "full_outer"): DataFrame = {
    val aa = a.select(col("src"), col("dst"), col("w").as("wa"))
    val bb = b.select(col("src"), col("dst"), col("w").as("wb"))
    aa.join(bb, Seq("src", "dst"), join)
      .select(col("src"), col("dst"),
        f(coalesce(col("wa"), aDefault), coalesce(col("wb"), bDefault)).as("w"))
  }

  /** Generalized indexing A(ri, ci) — reference SubsRef_SR
    * (SpParMat.cpp:2028-2256), there realized as two permutation-matrix
    * SpGEMMs with BoolCopy semirings; in relational form it is two
    * semi-joins against the index sets (Catalyst broadcasts small sets). */
  def subsRef(m: DataFrame, rows: DataFrame, cols: DataFrame): DataFrame =
    m.join(rows.select(col("v").as("src")), Seq("src"), "left_semi")
      .join(cols.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .select(m.columns.map(col): _*)

  /** A(ri, ci) = B — reference SpAsgn (SpParMat.cpp:2427-2474): anti-join
    * out the (ri × ci) hole, union the replacement entries. */
  def spAsgn(m: DataFrame, rows: DataFrame, cols: DataFrame, b: DataFrame): DataFrame = {
    // USING-joins reorder columns; re-project before the positional exceptAll.
    val hole = m.join(rows.select(col("v").as("src")), Seq("src"), "left_semi")
      .join(cols.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .select(m.columns.map(col): _*)
    m.exceptAll(hole).unionByName(b)
  }

  /** Value prune — reference SpParMat::Prune (SpParMat.cpp:2477-2521):
    * drop entries whose value fails the predicate. Pure Catalyst filter —
    * pushes to the scan when `m` is a base relation. */
  def prune(m: DataFrame, keep: Column): DataFrame = m.where(keep)

  /** Per-column threshold prune — reference PruneColumn
    * (SpParMat.cpp:2567-2648, MCL's column pruning): drop entries whose
    * value falls below the column's threshold vector. */
  def pruneColumn(m: DataFrame, thresholds: DataFrame): DataFrame =
    m.join(thresholds.select(col("v").as("dst"), col("xv").as("thr")), Seq("dst"))
      .where(col("w") >= col("thr"))
      .select(col("src"), col("dst"), col("w"))

  /** Matrix shape statistics — reference Bandwidth/Profile
    * (SpParMat.cpp:1743-1848). Single row. */
  def bandwidth(m: DataFrame): DataFrame =
    m.agg(max(abs(col("src") - col("dst"))).as("bandwidth"),
      count(lit(1)).as("nnz"),
      countDistinct(col("src")).as("nonempty_rows"))
}
