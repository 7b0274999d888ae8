package graft.pages

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A synthetic Common-Crawl-style page. html is binary per the input shape
  * (url: string, warc_ts: timestamp, html: binary, text: string, lang: string). */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic web-page synthesis.
  *
  * Every page is a PURE function of (seed, pageIndex, nPages) — the Spark
  * analog of the reference's in-memory Graph500 RMAT generator
  * (reference DistEdgeList.cpp:223-289; RefGen21.h:69-76 initiator
  * a=.57, b=c=.19, d=.05), which likewise generates each edge from (seed,
  * index) so any rank can produce its slice independently. Links between
  * pages follow the same RMAT bit-recursion, giving the hub-skewed
  * power-law degree distribution the skew-handling layer needs to exist for.
  *
  * Generation is `spark.range(n).map(...)` — embarrassingly parallel, no
  * shuffle, identical output at any parallelism.
  */
object PageGen {
  val RmatA = 0.57; val RmatB = 0.19; val RmatC = 0.19 // d = 0.05
  val BaseTs = 1704067200000L // 2024-01-01T00:00:00Z

  /** splitmix64 — deterministic 64-bit mix (public-domain algorithm). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0,1) from a hash of the given words. */
  def u01(seed: Long, a: Long, b: Long, c: Long): Double =
    ((mix(mix(mix(seed ^ a) ^ b) ^ c) >>> 11).toDouble) / (1L << 53).toDouble

  def url(i: Long, nSites: Int): String = s"https://site${i % nSites}.example/p/$i"

  /** RMAT target vertex: descend log2(n) levels of the adjacency quadrant
    * recursion, choosing quadrants by hashed coin flips (column half only —
    * the row is fixed to the source page). */
  def rmatTarget(seed: Long, src: Long, j: Int, n: Long): Long = {
    var lo = 0L
    var hi = n
    var level = 0
    while (hi - lo > 1) {
      val r = u01(seed, src, j.toLong, level.toLong)
      val right = r >= (RmatA + RmatC) // P(col in right half) = b + d
      val midWidth = (hi - lo) / 2
      if (right) lo = lo + midWidth else hi = lo + midWidth
      level += 1
    }
    lo
  }

  private val Vocab = Array("web", "graph", "link", "rank", "crawl", "page",
    "sparse", "matrix", "vector", "block", "spark", "shuffle", "join",
    "degree", "vertex", "edge", "hub", "authority", "index", "anchor")

  def outDegree(seed: Long, i: Long): Int =
    1 + (mix(seed ^ (i * 31 + 7)) & 0x7).toInt // 1..8 links

  def bodyText(seed: Long, i: Long): String = {
    val nWords = 8 + (mix(seed ^ (i * 17 + 3)) & 0xF).toInt
    val words = (0 until nWords).map { k =>
      Vocab(((mix(seed ^ (i * 131 + k)) >>> 8) % Vocab.length).toInt)
    }
    s"page $i " + words.mkString(" ")
  }

  def links(seed: Long, i: Long, n: Long, nSites: Int): Seq[String] =
    (0 until outDegree(seed, i)).map(j => url(rmatTarget(seed, i, j, n), nSites))

  /** Render html embedding the exact body text and anchor links. */
  def html(text: String, linkUrls: Seq[String], i: Long): String = {
    val anchors = linkUrls.map(u => s"""<a href="$u">l</a>""").mkString
    s"<html><head><title>p$i</title></head><body><p>$text</p>$anchors</body></html>"
  }

  def page(seed: Long, i: Long, n: Long, nSites: Int): Page = {
    val text = bodyText(seed, i)
    val h = html(text, links(seed, i, n, nSites), i)
    Page(url(i, nSites), new Timestamp(BaseTs + i * 1000L),
      h.getBytes(StandardCharsets.UTF_8), text, if (mix(seed ^ i) % 10 == 0) "de" else "en")
  }

  /** The pages table: (url, warc_ts, html, text, lang). */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L, nSites: Int = 97): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => page(seed, i, n, nSites)).toDF()
  }
}
