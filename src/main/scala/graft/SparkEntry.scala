package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.kernels._
import graft.oracle.GraphOracles

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val edges = LinkGraph.edges(spark, dir)
    PageRank.run(edges, LinkGraph.vertices(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> ((s, dir) =>
      PageRank.run(LinkGraph.edges(s, dir), LinkGraph.vertices(s, dir))
        .orderBy("vid")),
    "cc_fastsv" -> ((s, dir) =>
      ConnectedComponents.run(LinkGraph.edges(s, dir), LinkGraph.vertices(s, dir))
        .orderBy("vid")),
    "labelprop" -> ((s, dir) =>
      LabelPropagation.run(LinkGraph.edges(s, dir), LinkGraph.vertices(s, dir))
        .orderBy("vid")),
    "tricnt" -> ((s, dir) =>
      Triangles.count(LinkGraph.edges(s, dir))),
    "bfs_levels" -> ((s, dir) => {
      val verts = LinkGraph.vertices(s, dir)
      val root = verts.agg(min(col("v"))).first().getLong(0)
      BFS.levels(LinkGraph.edges(s, dir), root).orderBy("vid")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "pagerank" -> GraphOracles.pagerankSql(),
    "cc_fastsv" -> GraphOracles.ccSql,
    "labelprop" -> GraphOracles.labelPropSql(),
    "tricnt" -> GraphOracles.trianglesSql,
    "bfs_levels" -> GraphOracles.bfsSql(),
  )
}
