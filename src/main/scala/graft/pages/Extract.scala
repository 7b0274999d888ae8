package graft.pages

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Pure, deterministic extraction from raw html bytes.
  *
  * Per-row invariant (BASELINE.json): `extractText(html) == text`
  * byte-identical, at every parallelism level — the extractor is a pure
  * function of the html bytes with no session, locale, or ordering
  * dependence. Mirrors the reference's string-keyed ingest
  * (`ReadGeneralizedTuples`, reference SpParMat.cpp:3882-3971) where parsing
  * happens rank-locally on byte ranges.
  */
object Extract {
  private val PTag = "(?s)<p>(.*?)</p>".r
  private val ATag = """<a href="([^"]+)"""".r

  /** Concatenated <p> block contents (pure function of bytes). */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    PTag.findAllMatchIn(s).map(_.group(1)).mkString("\n")
  }

  /** All anchor targets in document order (pure function of bytes). */
  def extractLinks(html: Array[Byte]): Seq[String] = {
    val s = new String(html, StandardCharsets.UTF_8)
    ATag.findAllMatchIn(s).map(_.group(1)).toSeq
  }

  /** pages(url, html, ...) → url-level link table (srcUrl, dstUrl).
    * The html column is read ONLY here; downstream plans must never scan it
    * (Parquet column pruning keeps the 100TB of html out of every query
    * that doesn't extract). */
  def linkTable(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .flatMap { case (u, h) => extractLinks(h).map(d => (u, d)) }
      .toDF("srcUrl", "dstUrl")
  }

  /** pages → (url, text) via extraction (for the byte-identity check). */
  def textTable(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .map { case (u, h) => (u, extractText(h)) }
      .toDF("url", "extracted")
  }
}
