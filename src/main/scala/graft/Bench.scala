package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.kernels._
import graft.linalg.{PlusTimes, SpMV}

/** Benchmark driver. Builds the link graph ONCE (persisted — the analog of
  * the one-time DCSC build), then times the flagship kernels. Prints one
  * JSON line:
  *   {"metric":"total","value":S,"unit":"sec","queries":{...},"sf":...,
  *    "cpus":N,"nnz":E,"pagerank_eps":EPS,
  *    "sentinel_pre_sec":...,"sentinel_post_sec":...,
  *    "sentinel_drift":...,"valid":true|false}
  * pagerank_eps = iterations × nnz / seconds — the edges/sec SpMV
  * throughput of BASELINE.json (TEPS-style, reference TopDownBFS.cpp:460).
  *
  * Contention sentinel: a fixed single-thread spin is timed before and
  * after the suite. On an idle box the two times agree within a few
  * percent; a concurrent JVM (compile, test run) on the same box inflates
  * one of them. drift = max/min of the two; drift > 1.3 marks the run
  * `valid: false` — the measurement was contaminated by external load and
  * must be rerun, not published (this exact failure produced the driver's
  * round-2 bench JSON, 2.1× the clean numbers).
  *
  * Run at two parallelism levels (SPARK_GRAFT_CPUS=8 vs 32) on the same
  * input to evidence scaling efficiency (BASELINE.md).
  */
object Bench {

  /** Fixed single-thread spin (~0.3s on an idle core): splitmix64 chain,
    * result consumed so the JIT cannot elide the loop. */
  def sentinelSpin(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 60000000) {
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      i += 1
    }
    if (x == 42L) println("") // consume
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions sized to the DATA, not the cores: at sf0.1 the
    // contribution exchange volume grows with partition count (see
    // BENCH.md), so 8 is optimal across local[8..32].
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = LinkGraph.edges(spark, sfDir).persist()
    val verts = LinkGraph.vertices(spark, sfDir).persist()
    // Weighted edges pre-materialized like the other static operands — the
    // sssp entry must time the kernel, not the one-time derivation.
    val wedges = LinkGraph.weightedEdges(spark, sfDir).persist()
    val nnz = edges.count()
    val nv = verts.count()
    wedges.count()

    // JIT/IO warmup: one SpMV round
    SpMV(edges, verts.select(col("v"), lit(1.0).as("xv")), PlusTimes).count()

    sentinelSpin() // JIT warm the sentinel loop itself
    val sentinelPre = sentinelSpin()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val prIters = 10
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("pagerank") = time { PageRank.run(edges, verts, prIters).count() }
    // in-memory rank-vector kernel (same iteration count; differential-
    // tested against the relational result at 1e-9 in KernelSpec)
    results("pagerank_arr") = time { PageRankArray.run(edges, verts, prIters).count() }
    results("pagerank_blocked") = time {
      PageRankBlocked.run(edges, verts, blockSize = 4096, iters = prIters).count()
    }
    results("cc_fastsv") = time { ConnectedComponents.run(edges, verts).count() }
    results("labelprop") = time { LabelPropagation.run(edges, verts).count() }
    results("tricnt") = time { Triangles.count(edges).collect() }
    results("bfs") = time {
      val root = verts.agg(min(col("v"))).first().getLong(0)
      BFS.levels(edges, root).count()
    }
    results("sssp") = time {
      val root = verts.agg(min(col("v"))).first().getLong(0)
      SSSP.run(wedges, root).count()
    }
    results("spgemm") = time {
      operators.MatrixOps.spgemm(edges, edges, PlusTimes)
        .groupBy(col("src")).agg(sum(col("w"))).count()
    }
    results("dedup_minhash") = time {
      dedup.Dedup.minhash(Tables.documents(spark, sfDir)).count()
    }
    results("ann_topk") = time {
      sim.Ann.cosineTopK(Tables.embeddings(spark, sfDir), 20, 5).count()
    }

    val sentinelPost = sentinelSpin()
    val drift = math.max(sentinelPre, sentinelPost) /
      math.max(1e-9, math.min(sentinelPre, sentinelPost))
    val valid = drift <= 1.3

    val eps = prIters.toLong * nnz / results("pagerank")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"vertices":$nv,"nnz":$nnz,"pagerank_eps":$eps%.0f,"sentinel_pre_sec":$sentinelPre%.3f,"sentinel_post_sec":$sentinelPost%.3f,"sentinel_drift":$drift%.3f,"valid":$valid}""")
    if (!valid)
      System.err.println(f"[bench] WARNING: sentinel drift $drift%.2fx > 1.3x — " +
        "external load contaminated this run; numbers are NOT publishable")
    spark.stop()
  }
}
