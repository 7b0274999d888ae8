package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kernels.{Betweenness, MarkovClustering}

/** MCL clustering and batched-Brandes betweenness centrality. */
class MclBcSpec extends AnyFunSuite {
  import TestSpark._

  def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("MCL separates two cliques joined by a weak bridge") {
    val pairs = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 10L))
    val e = undirected(pairs).withColumn("w", lit(1.0))
    val v = verticesOf(pairs)
    val clusters = MarkovClustering.run(e, v).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    val c1 = Seq(0L, 1L, 2L, 3L).map(clusters).distinct
    val c2 = Seq(10L, 11L, 12L, 13L).map(clusters).distinct
    assert(c1.length == 1, s"first clique split: $clusters")
    assert(c2.length == 1, s"second clique split: $clusters")
    assert(c1.head != c2.head, s"cliques merged: $clusters")
  }

  test("gate-mode MCL separates cliques and is invariant to input partitioning") {
    val pairs = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 10L))
    val e = undirected(pairs).withColumn("w", lit(1.0))
    val v = verticesOf(pairs)
    def cl(edges: org.apache.spark.sql.DataFrame) =
      MarkovClustering.gateRun(edges, v, iters = 4).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = cl(e)
    assert(Seq(0L, 1L, 2L, 3L).map(clusters).distinct.length == 1, s"first clique split: $clusters")
    assert(Seq(10L, 11L, 12L, 13L).map(clusters).distinct.length == 1, s"second clique split: $clusters")
    assert(clusters(0L) != clusters(10L), s"cliques merged: $clusters")
    // the pinned-fold numerics make the result exactly reproducible
    assert(cl(e.repartition(7)) == clusters, "gateRun not partitioning-invariant")
  }

  test("MCL on disconnected components yields one cluster per component") {
    val pairs = clique(Seq(0L, 1L, 2L)) ++ clique(Seq(5L, 6L, 7L)) ++ Seq((20L, 21L))
    val e = undirected(pairs).withColumn("w", lit(1.0))
    val clusters = MarkovClustering.run(e, verticesOf(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.values.toSet.size == 3)
  }

  test("phased expansion inside the MCL loop equals the single-phase run") {
    val pairs = clique(Seq(0L, 1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L), (2L, 12L))
    val e = undirected(pairs).withColumn("w", lit(1.0))
    val v = verticesOf(pairs)
    def clusters(budget: Long) = MarkovClustering.run(e, v,
        phaseFlopBudget = budget).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // budget 10 forces many phases on this graph (flops per round >> 10);
    // huge budget = single phase. Cell-disjoint phases -> identical result.
    assert(clusters(10L) == clusters(Long.MaxValue))
  }

  test("expansion flop estimate matches the brute-force count") {
    val s = spark
    import s.implicits._
    val m = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0), (0L, 2L, 1.0))
      .toDF("src", "dst", "w")
    // flops = sum over k of nnzCol(k)*nnzRow(k):
    // cols: 1->1, 2->2, 0->1; rows: 0->2, 1->1, 2->1
    // k=1: 1*1=1; k=2: 2*1=2; k=0: 1*2=2 -> 5
    assert(MarkovClustering.estimateFlops(m) == 5L)
  }

  test("MCL manifest chain records per-iteration nnz and expansion flops") {
    val pairs = clique(Seq(0L, 1L, 2L)) ++ clique(Seq(5L, 6L, 7L))
    val e = undirected(pairs).withColumn("w", lit(1.0))
    val dir = java.nio.file.Files.createTempDirectory("mclsnap").toString
    val store = new graft.checkpoint.SnapshotStore(dir)
    MarkovClustering.run(e, verticesOf(pairs), store = Some(store)).count()
    val snaps = store.snapshots()
    assert(snaps.nonEmpty)
    assert(snaps.map(_.iteration) == snaps.indices.map(_ + 1), "one commit per iteration")
    assert(snaps.forall(s => s.flops > 0 && s.nnz > 0 && s.rows == s.nnz))
  }

  test("pruneRecoverySelect re-admits top entries of over-pruned columns") {
    val s = spark
    import s.implicits._
    // column 0: 20 sub-threshold entries with distinct values -> the hard
    // threshold alone would empty it; recovery must keep the top 3.
    // column 1: two healthy entries -> default strict-threshold rule.
    val m = ((1 to 20).map(i => (i.toLong, 0L, 0.001 * i)) ++
      Seq((1L, 1L, 0.6), (2L, 1L, 0.4))).toDF("src", "dst", "w")
    val out = MarkovClustering.pruneRecoverySelect(m, 0.05, 5, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.filter(_._2 == 0L).map(_._1).toSet == Set(18L, 19L, 20L),
      s"recovery should keep top-3 of column 0: ${out.toSeq}")
    assert(out.filter(_._2 == 1L).map(_._1).toSet == Set(1L, 2L))
  }

  test("chaos carries the reference's per-column nnz factor") {
    val s = spark
    import s.implicits._
    val m = Seq((0L, 0L, 0.7), (1L, 0L, 0.3)).toDF("src", "dst", "w")
    // (max 0.7 − (0.49 + 0.09)) × nnz 2 = 0.24
    assert(math.abs(MarkovClustering.chaosOf(m) - 0.24) < 1e-12)
  }

  test("batched Brandes matches brute force on path graph") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val e = undirected(pairs)
    val edgeSeq = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val verts = Seq(0L, 1L, 2L, 3L, 4L)
    val bc = Betweenness.forSources(e, verts).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = RefKernels.brandes(edgeSeq, verts, verts)
    for (v <- verts)
      assert(math.abs(bc.getOrElse(v, 0.0) - ref(v)) < 1e-6, s"$v: ${bc.get(v)} vs ${ref(v)}")
    assert(bc(2L) == 8.0)
  }

  test("batched Brandes matches brute force on seeded random graph") {
    val pairs = RefKernels.randomGraph(40, 120, seed = 21L)
    val e = undirected(pairs)
    val edgeSeq = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val verts = edgeSeq.flatMap(p => Seq(p._1, p._2)).distinct
    val sources = verts.sorted.take(10)
    val bc = Betweenness.forSources(e, sources).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = RefKernels.brandes(edgeSeq, verts, sources)
    for (v <- verts)
      assert(math.abs(bc.getOrElse(v, 0.0) - ref(v)) < 1e-5, s"$v: ${bc.get(v)} vs ${ref(v)}")
  }
}
