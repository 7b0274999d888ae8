package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.linalg.ColumnSemiring

/** The CombBLAS matrix-operator family over the edge-relation encoding
  * (SURVEY.md §2.2-§2.6). A "matrix" here is a DataFrame (src, dst[, w]) —
  * the COO relation; Catalyst plans every op as pruned scans + shuffles with
  * partial aggregation.
  */
object MatrixOps {

  /** Row reduction (dim=row): per-src nnz and weight sum —
    * reference SpParMat::Reduce, SpParMat.cpp:888-1119. */
  def reduceRows(m: DataFrame): DataFrame =
    m.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("nnz"), sum(col("w")).as("wsum"))

  /** Column reduction (dim=col). */
  def reduceCols(m: DataFrame): DataFrame =
    m.groupBy(col("dst").as("v"))
      .agg(count(lit(1)).as("nnz"), sum(col("w")).as("wsum"))

  /** Reduce only rows whose src is in (or, with exclude, not in) the mask —
    * reference SpParMat::MaskedReduce, SpParMat.cpp:1849-1991. */
  def maskedReduceRows(m: DataFrame, mask: DataFrame, exclude: Boolean = false): DataFrame = {
    val joined = m.join(mask.select(col("v").as("src")), Seq("src"),
      if (exclude) "left_anti" else "left_semi")
    reduceRows(joined)
  }

  /** Top-k entries per column by (w desc, src asc) — reference
    * SpParMat::Kselect, SpParMat.cpp:1120-1742 (k-th largest per column). */
  def kselectPerColumn(m: DataFrame, k: Int): DataFrame = {
    val byCol = Window.partitionBy("dst").orderBy(col("w").desc, col("src").asc)
    m.withColumn("rn", row_number().over(byCol).cast("long"))
      .where(col("rn") <= k)
      .select(col("dst").as("v"), col("src"), col("w"), col("rn"))
  }

  /** Aᵀ — swap indices (free: no shuffle until consumed). */
  def transpose(m: DataFrame): DataFrame = {
    val cols = Seq(col("dst").as("src"), col("src").as("dst")) ++
      (if (m.columns.contains("w")) Seq(col("w")) else Nil)
    m.select(cols: _*)
  }

  /** Strictly-triangular splits — reference SpParMat::PruneI
    * (SpParMat.h:162-175), used for the tricnt L/U split. */
  def lowerTriangular(m: DataFrame): DataFrame = m.where(col("src") > col("dst"))
  def upperTriangular(m: DataFrame): DataFrame = m.where(col("src") < col("dst"))

  /** Hadamard-style sparsity intersect: entries of A present in B —
    * reference EWiseMult(exclude=false), ParFriends.h:2187-2203. */
  def ewiseIntersect(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.select("src", "dst"), Seq("src", "dst"), "left_semi")

  /** A .* ¬B — the EWiseMult exclude=true mask / SetDifference —
    * reference ParFriends.h:2187, 2171-2186. */
  def ewiseExclude(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.select("src", "dst"), Seq("src", "dst"), "left_anti")

  /** SpGEMM: C = A ⊗ B over a semiring — join on the inner dimension +
    * semiring aggregate (reference Mult_AnXBn_Synch SUMMA,
    * ParFriends.h:1018-1123; the √p broadcast stages become one planned
    * shuffle with map-side partial aggregation). */
  def spgemm(a: DataFrame, b: DataFrame, sr: ColumnSemiring): DataFrame = {
    val aw = if (a.columns.contains("w")) a else a.withColumn("w", lit(1.0))
    val bw = if (b.columns.contains("w")) b else b.withColumn("w", lit(1.0))
    aw.select(col("src").as("i"), col("dst").as("k"), col("w").as("aw"))
      .join(bw.select(col("src").as("k"), col("dst").as("j"), col("w").as("bw")), "k")
      .groupBy(col("i").as("src"), col("j").as("dst"))
      .agg(sr.add(sr.multiply(col("aw"), col("bw"))).as("w"))
  }

  /** Galerkin triple product S·A·Sᵀ — the multigrid restriction benchmark
    * (reference ReleaseTests/Galerkin.cpp:54-140, which times both
    * association orders of the same two Mult_AnXBn calls). Left-evaluated
    * ((S·A)·Sᵀ) here; association invariance over (+,*) is spec-tested.
    * When S aggregates disjoint fine vertices (0/1 rows), Catalyst plans
    * this as two keyed joins with map-side-combined sums — no densification,
    * scale-safe. */
  def galerkin(s: DataFrame, a: DataFrame, sr: ColumnSemiring): DataFrame =
    spgemm(spgemm(s, a, sr), transpose(s), sr)

  /** Scale each edge by a per-src (dim=row) or per-dst (dim=col) vector —
    * reference DimApply, SpParMat.cpp:801-887 (PageRank normalize /
    * MakeColStochastic). Size-gated: the vector is broadcast only below
    * `broadcastMax` rows (one count probe); beyond the gate — a per-vertex
    * vector at 10^9 vertices would blow any broadcast limit — it falls
    * back to a shuffle-hash join on src (never sort-merge: the edge side
    * dominates and needs no sort). `broadcastMax = 0` skips the probe and
    * forces the shuffle path; `Long.MaxValue` forces broadcast. */
  def dimApplyRows(m: DataFrame, vec: DataFrame,
                   f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                   broadcastMax: Long = 4L << 20): DataFrame = {
    val v = vec.select(col("v").as("src"), col("xv"))
    val vx =
      if (broadcastMax == Long.MaxValue) broadcast(v)
      else if (broadcastMax > 0 && vec.count() <= broadcastMax) broadcast(v)
      else v.hint("shuffle_hash")
    m.join(vx, Seq("src"))
      .select(col("src"), col("dst"), f(col("w"), col("xv")).as("w"))
  }

  /** Route each component's induced subgraph to a single partition and
    * build its local adjacency there — reference InducedSubgraphs2Procs
    * (SpParMat.cpp:4908-5045), which ships every component's edges to a
    * dedicated processor pair. Spark shape: two label joins (keep edges
    * whose endpoints share a component), ONE repartition on the component
    * key, then a per-partition pass that accumulates each component's
    * edge count and distinct-source count (the local CSR's nnz and
    * occupied-row count). Per-partition state is one counter pair per
    * component routed there — bounded by components-per-partition, not
    * edges. Component sizes (nrows, incl. isolated vertices) come from the
    * label table, so empty components still appear.
    *
    * @param labels (vid, component)
    * @return (component, nrows, nnz, nsrc) */
  def inducedSubgraphStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val bySrc = labels.select(col("vid").as("src"), col("component"))
    val byDst = labels.select(col("vid").as("dst"), col("component").as("c2"))
    val routed = edges.join(bySrc, "src").join(byDst, "dst")
      .where(col("component") === col("c2"))
      .select(col("component"), col("src"), col("dst"))
      .repartition(col("component"))
    val local = routed.as[(Long, Long, Long)].mapPartitions { it =>
      val nnz = new java.util.HashMap[Long, Array[Long]]()
      val srcs = new java.util.HashMap[Long, java.util.HashSet[Long]]()
      it.foreach { case (c, s, _) =>
        nnz.computeIfAbsent(c, _ => Array(0L))(0) += 1
        srcs.computeIfAbsent(c, _ => new java.util.HashSet[Long]()).add(s)
      }
      import scala.jdk.CollectionConverters._
      nnz.entrySet().iterator().asScala.map { e =>
        (e.getKey, e.getValue()(0), srcs.get(e.getKey).size().toLong)
      }
    }.toDF("component", "nnz", "nsrc")
    val sizes = labels.groupBy("component").agg(count(lit(1)).as("nrows"))
    sizes.join(local, Seq("component"), "left")
      .select(col("component"), col("nrows"),
        coalesce(col("nnz"), lit(0L)).as("nnz"),
        coalesce(col("nsrc"), lit(0L)).as("nsrc"))
  }

  /** Union with add-combine: A + B — reference operator+= / MergeAll,
    * SpParMat.cpp:741-772 (e.g. the A += Aᵀ symmetrize). */
  def add(a: DataFrame, b: DataFrame, sr: ColumnSemiring): DataFrame =
    a.select("src", "dst", "w").union(b.select("src", "dst", "w"))
      .groupBy("src", "dst").agg(sr.add(col("w")).as("w"))
}
