package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pages.{Extract, PageGen}
import graft.graph.{Dictionary, WebGraph}

/** Ingest invariants from BASELINE.json: byte-identical text extraction per
  * url, pure link extraction, deterministic dense dictionary ids — all
  * independent of parallelism. */
class IngestSpec extends AnyFunSuite {
  import TestSpark._

  lazy val pages = PageGen.pages(spark, 500).persist()

  test("extractText(html) == text byte-identical for every page") {
    val bad = Extract.textTable(pages)
      .join(pages.select("url", "text"), "url")
      .where(col("extracted") =!= col("text"))
      .count()
    assert(bad == 0)
  }

  test("extraction is a pure function of html bytes (parallelism invariant)") {
    val a = Extract.linkTable(pages).collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = Extract.linkTable(pages.repartition(17)).collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("page generation is a pure function of (seed, index)") {
    val p1 = PageGen.page(42L, 7L, 500L, 97)
    val p2 = PageGen.page(42L, 7L, 500L, 97)
    assert(p1.url == p2.url && p1.text == p2.text && p1.html.sameElements(p2.html))
    assert(PageGen.page(43L, 7L, 500L, 97).text != p1.text || PageGen.page(43L, 7L, 500L, 97).html.sameElements(p1.html) == false)
  }

  test("link targets are hub-skewed (RMAT): max in-degree well above mean") {
    val links = Extract.linkTable(pages)
    val indeg = links.groupBy("dstUrl").count().agg(max("count").as("mx"), avg("count").as("mean")).collect()(0)
    assert(indeg.getLong(0) > 10 * indeg.getDouble(1), s"max ${indeg.getLong(0)} mean ${indeg.getDouble(1)}")
  }

  test("dictionary: dense 0..V-1 ids in lexicographic key order") {
    val urls = pages.select("url")
    val dict = Dictionary.encode(urls, "url").collect().map(r => (r.getString(0), r.getLong(1)))
    val sortedKeys = dict.map(_._1).sorted
    val expected = sortedKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toMap
    assert(dict.toMap == expected)
    assert(dict.map(_._2).sorted.sameElements(0L until dict.length))
  }

  test("dictionary is invariant to partition count") {
    val urls = pages.select("url")
    val a = Dictionary.encode(urls, "url", parts = 2).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = Dictionary.encode(urls.repartition(11), "url", parts = 9).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("webgraph build: loop-free deduped edges over dense vids") {
    val built = WebGraph.build(pages)
    val e = built.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.nonEmpty)
    assert(e.forall(p => p._1 != p._2), "self-loops removed")
    assert(e.distinct.length == e.length, "deduplicated")
    val maxVid = built.dict.agg(max("vid")).collect()(0).getLong(0)
    val nVids = built.dict.count()
    assert(maxVid == nVids - 1, "dense id space")
  }

  test("all kernels over the extracted web graph match brute-force oracles") {
    val built = graph.WebGraph.build(PageGen.pages(spark, 400))
    val sym = graph.WebGraph.symmetrize(built.edges).persist()
    val verts = built.vertices.persist()
    val edgeSeq = sym.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vertSeq = verts.collect().map(_.getLong(0)).toSeq

    val pr = kernels.PageRank.runExact(sym, verts, 10, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prRef = RefKernels.pageRank(edgeSeq, vertSeq)
    for ((k, x) <- pr) assert(math.abs(x - prRef(k)) < 1e-9, s"pr $k")

    val cc = kernels.ConnectedComponents.run(sym, verts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == RefKernels.components(edgeSeq, vertSeq))

    val lp = kernels.LabelPropagation.run(sym, verts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp == RefKernels.labelProp(edgeSeq, vertSeq))

    val tc = kernels.Triangles.count(sym).collect()(0).getLong(0)
    assert(tc == RefKernels.triangles(edgeSeq))
  }

  test("end-to-end: pagerank over the web graph is deterministic across runs") {
    val b1 = WebGraph.build(PageGen.pages(spark, 300).repartition(3))
    val b2 = WebGraph.build(PageGen.pages(spark, 300).repartition(8))
    val s1 = WebGraph.symmetrize(b1.edges)
    val s2 = WebGraph.symmetrize(b2.edges)
    val pr1 = kernels.PageRank.run(s1, b1.vertices).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val pr2 = kernels.PageRank.run(s2, b2.vertices).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(pr1.sameElements(pr2))
  }
}
