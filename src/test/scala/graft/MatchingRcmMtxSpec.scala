package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kernels.{BipartiteMatching, ConnectedComponents, RCM}
import graft.sources.MatrixMarket

/** Bipartite matching invariants, RCM ordering properties, and
  * MatrixMarket interchange IO (cross-validated against the reference's
  * own test matrices where present). */
class MatchingRcmMtxSpec extends AnyFunSuite {
  import TestSpark._

  // ---- bipartite matching ----

  def bipartite(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.distinct.toDF("r", "c")
  }

  test("matching is a valid maximal matching on a seeded bipartite graph") {
    val rnd = new scala.util.Random(31L)
    val pairs = (1 to 300).map(_ => (rnd.nextInt(40).toLong, (100 + rnd.nextInt(40)).toLong)).distinct
    val e = bipartite(pairs)
    val m = BipartiteMatching.run(e).collect().map(r => (r.getLong(0), r.getLong(1)))
    // validity: matched pairs are edges; each side used at most once
    assert(m.forall(pairs.contains), "matched pairs must be edges")
    assert(m.map(_._1).distinct.length == m.length, "row matched twice")
    assert(m.map(_._2).distinct.length == m.length, "col matched twice")
    // maximality: no edge has both endpoints unmatched
    val mr = m.map(_._1).toSet; val mc = m.map(_._2).toSet
    assert(pairs.forall { case (r, c) => mr(r) || mc(c) }, "matching not maximal")
  }

  test("matching is deterministic under repartitioning") {
    val rnd = new scala.util.Random(32L)
    val pairs = (1 to 200).map(_ => (rnd.nextInt(30).toLong, (50 + rnd.nextInt(30)).toLong)).distinct
    val a = BipartiteMatching.run(bipartite(pairs)).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = BipartiteMatching.run(bipartite(pairs).repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  // ---- RCM ----

  test("RCM on a shuffled path graph gives bandwidth 1") {
    // path over shuffled vertex labels: 7-3-11-0-9-5-2-8
    val labels = Seq(7L, 3L, 11L, 0L, 9L, 5L, 2L, 8L)
    val pairs = labels.zip(labels.tail)
    val e = undirected(pairs)
    val order = RCM.order(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(order.values.toSeq.sorted == (0L until labels.length).toList, "not a permutation")
    val bw = pairs.map { case (a, b) => math.abs(order(a) - order(b)) }.max
    assert(bw == 1L, s"path bandwidth after RCM should be 1, got $bw ($order)")
  }

  test("RCM is a permutation of the reached component and deterministic") {
    val pairs = RefKernels.randomGraph(60, 200, seed = 17L)
    val e = undirected(pairs)
    val a = RCM.order(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = RCM.order(e.repartition(9)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "RCM not deterministic under repartitioning")
    assert(a.values.toSeq.sorted == (0L until a.size).toList, "not a dense permutation")
  }

  // ---- MatrixMarket ----

  test("mtx roundtrip: write then read preserves entries") {
    val s = spark
    import s.implicits._
    val m = Seq((0L, 1L, 2.5), (1L, 2L, 1.0), (3L, 0L, -4.0)).toDF("src", "dst", "w")
    val path = java.nio.file.Files.createTempDirectory("mtx").toString + "/t.mtx"
    MatrixMarket.write(m, path, 4, 4)
    val back = MatrixMarket.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set((0L, 1L, 2.5), (1L, 2L, 1.0), (3L, 0L, -4.0)))
    val h = MatrixMarket.readHeader(path)
    assert(h.rows == 4 && h.cols == 4 && h.nnz == 3 && !h.symmetric)
  }

  test("mtx symmetric storage expands to both triangles") {
    val dir = java.nio.file.Files.createTempDirectory("mtx")
    val path = dir.toString + "/sym.mtx"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "%%MatrixMarket matrix coordinate real symmetric\n% comment\n3 3 3\n2 1 1.0\n3 2 2.0\n2 2 5.0\n")
    val got = MatrixMarket.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 0L, 1.0), (0L, 1L, 1.0), (2L, 1L, 2.0), (1L, 2L, 2.0), (1L, 1L, 5.0)))
  }

  test("reference fixture sevenvertex.mtx loads and CC matches union-find") {
    val path = "/root/reference/ReleaseTests/sevenvertex.mtx"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    // driver-side parse of the same file = independent expected value
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
      .dropWhile(_.startsWith("%")).drop(1).filter(_.trim.nonEmpty)
    val expected = lines.map { l =>
      val p = l.trim.split("\\s+"); (p(0).toLong - 1, p(1).toLong - 1, p(2).toDouble)
    }
    val got = MatrixMarket.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected.toSet)
    // cross-validate a kernel over the loaded matrix
    val sym = (expected.map(t => (t._1, t._2)) ++ expected.map(t => (t._2, t._1))).distinct
    val s = spark
    import s.implicits._
    val e = sym.toDF("src", "dst")
    val verts = sym.flatMap(p => Seq(p._1, p._2)).distinct
    val cc = ConnectedComponents.run(e, verts.toDF("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == RefKernels.components(sym, verts))
  }
}
