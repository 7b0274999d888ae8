package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set — Luby's algorithm (reference FilteredMIS.cpp
  * runs the same random-priority MIS over the semiring layer).
  *
  * Per round over the ACTIVE subgraph: a vertex joins the MIS iff its
  * seeded priority (xxhash64, tie-broken by id — a total order) is
  * strictly smaller than every active neighbor's; winners and their
  * neighborhoods then leave the active set. Deterministic for a fixed
  * seed at any parallelism; expected O(log n) rounds.
  *
  * The neighbor-minimum is the Select2ndMin SpMV over a (priority, id)
  * struct — Spark orders structs lexicographically, so `min` implements
  * the total order directly. The priority is md5(seed:v) — identical hex
  * in every engine, so the DuckDB oracle replays the exact same rounds
  * (xxhash64 would be Spark-only). */
object MaximalIndependentSet {

  /** @param edges symmetric (src, dst); @return (v: long) — the MIS. */
  def run(edges: DataFrame, vertices: DataFrame, seed: Long = 42L,
          maxRounds: Int = 60): DataFrame = {
    val spark = edges.sparkSession
    val cp = new graft.util.Checkpoints(spark)
    var active = cp(vertices.select(col("v")))
    var activeEdges = cp(edges.select("src", "dst"))
    var mis = cp(active.where(lit(false)))
    var remaining = active.count()
    var round = 0
    while (remaining > 0 && round < maxRounds) {
      round += 1
      val prio = active.select(col("v"),
        struct(md5(concat_ws(":", lit(seed.toString), col("v").cast("string"))).as("p"),
          col("v").as("id")).as("pr"))
      val nbrMin = activeEdges
        .join(prio.select(col("v").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst").as("v"))
        .agg(min(col("pr")).as("nbrMin"))
      val winners = cp(prio.join(nbrMin, Seq("v"), "left")
        .where(col("nbrMin").isNull || col("pr") < col("nbrMin"))
        .select("v"))
      val removed = cp(winners.unionByName(
          activeEdges.join(winners.withColumnRenamed("v", "src"), Seq("src"))
            .select(col("dst").as("v")))
        .distinct())
      val (prevM, prevA, prevE) = (mis, active, activeEdges)
      mis = cp(mis.unionByName(winners))
      active = cp(prevA.join(removed, Seq("v"), "left_anti"))
      activeEdges = cp(prevE
        .join(removed.withColumnRenamed("v", "src"), Seq("src"), "left_anti")
        .join(removed.withColumnRenamed("v", "dst"), Seq("dst"), "left_anti")
        .select("src", "dst"))
      remaining = active.count()
      Seq(prevM, prevA, prevE, winners, removed).foreach(cp.free)
    }
    // Contract guard: if the round cap fired with vertices still active the
    // set is independent but NOT maximal — surface it instead of silently
    // returning a weaker result (expected rounds are O(log n), so hitting
    // the cap signals a pathological input or a too-small maxRounds).
    if (remaining > 0)
      throw new IllegalStateException(
        s"MIS round cap $maxRounds hit with $remaining vertices still active; " +
          "result would not be maximal — raise maxRounds")
    cp.freeAllExcept(mis)
    mis.select(col("v"))
  }
}
