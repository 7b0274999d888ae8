package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic link graph used by the correctness gate.
  *
  * Edge relation: two parts are linked iff they co-occur in some order
  * (lineitem self-join on l_orderkey). The result is symmetric by
  * construction, deduplicated, and self-loop free — the Spark analog of
  * CombBLAS's edge-list → matrix build, where `SparseCommon`
  * (reference SpParMat.cpp:2893-2973) merges duplicate triples and the
  * SpParMat ctor removes loops (reference SpParMat.h:86).
  *
  * The same relation is expressed in ANSI SQL by
  * [[graft.oracle.GraphOracles.edgesCte]] so DuckDB can act as the oracle.
  *
  * Scale notes: the self-join shuffles on l_orderkey only once; `distinct`
  * is a hash aggregate on (src,dst) that AQE coalesces. At web scale the
  * same shape is produced by the pages→links extractor
  * ([[graft.pages.Extract]]) followed by dictionary encoding
  * ([[graft.graph.Dictionary]]).
  */
object LinkGraph {

  /** Per-(session, dir) cache of the derived relations: a multi-query run
    * (the Verify gate, the bench) otherwise re-executes the lineitem
    * self-join for every kernel. Entries persist for the session — the
    * working set is a handful of small derived tables per sf dir. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def cached(spark: SparkSession, dir: String, key: String)
                    (build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, dir, key), _ => build.persist())

  /** Unweighted symmetric edges (src: long, dst: long). */
  def edges(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "edges") {
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("src"))
      val b = li.select(col("ok"), col("l_partkey").as("dst"))
      a.join(b, "ok")
        .where(col("src") =!= col("dst"))
        .select("src", "dst")
        .distinct()
    }

  /** Weighted edges: w = number of distinct orders the pair co-occurs in. */
  def weightedEdges(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "wedges") {
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey")).distinct()
      val a = li.select(col("ok"), col("l_partkey").as("src"))
      val b = li.select(col("ok"), col("l_partkey").as("dst"))
      a.join(b, "ok")
        .where(col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(count(lit(1)).cast("double").as("w"))
    }

  /** Vertex set: every part referenced by lineitem (includes isolated
    * vertices that never co-occur with another part). (v: long) */
  def vertices(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "verts") {
      Tables.lineitem(spark, dir).select(col("l_partkey").as("v")).distinct()
    }

  /** Out-degrees over the unweighted edge set. (v: long, outdeg: long) */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("outdeg"))
}
