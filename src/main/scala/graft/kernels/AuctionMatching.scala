package graft.kernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Checkpoints

/** Auction-based weighted bipartite matching — the reference's second
  * matching family (Applications/BipartiteMatchings/auction.cpp; Bertsekas
  * auction with ε-scaling collapsed to a fixed ε = 1 over integral
  * weights).
  *
  * Synchronous Jacobi rounds:
  *  1. every UNASSIGNED row values each incident column at w − price(c)
  *     and bids for its best column (value desc, c asc — pinned tiebreak);
  *     the bid raises the price to price(c*) + (best − second) + 1, where
  *     `second` is the row's second-best value, or best − B for a
  *     single-candidate row (B above any weight — the row claims the
  *     column outright);
  *  2. every bid-for column accepts its highest bidder (bid desc, r asc),
  *     displacing that column's previous assignee back into the pool;
  *  3. prices rise to the winning bids.
  * Prices are monotone non-decreasing and strictly rise on every contested
  * column, so displacement cycles terminate; with ε = 1 the fixpoint is
  * within n·ε of the maximum-weight assignment (Bertsekas 1988 — public
  * result), and in particular ≥ the greedy maximal matching's weight on
  * the specs' inputs.
  *
  * All arithmetic is integral and every tiebreak pinned, so the rounds are
  * deterministic at any parallelism and replayable round-for-round by the
  * DuckDB oracle (same round count — rounds after the pool drains are
  * no-ops, so any oracle round count ≥ the kernel's cap compares equal
  * once drained; the gate pins both to the same constant).
  *
  * Scale shape: per round two keyed window aggregates (per-row argmax bid,
  * per-column argmax accept) and two anti-joins — the same two
  * map-side-combinable exchanges as the reference's bid/assign
  * MPI collectives. No driver-side per-vertex state.
  */
object AuctionMatching {

  /** @param edges bipartite (r, c, w) — w integral ≥ 0 (cast to long)
    * @param rounds fixed synchronous round budget (oracle-pinned)
    * @return matched (r, c, w) pairs */
  def run(edges: DataFrame, rounds: Int = 20, big: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    val cp = new Checkpoints(spark)
    val e = cp(edges.groupBy(col("r"), col("c"))
      .agg(max(col("w").cast("long")).as("w")))
    val allRows = cp(e.select("r").distinct())
    var prices = cp(e.select(col("c")).distinct().withColumn("p", lit(0L)))
    var assigned = cp(e.select("r", "c").where(lit(false)))
    var open = allRows.count()
    var round = 0
    while (round < rounds && open > 0) {
      round += 1
      val unassigned = e.join(assigned.select("r"), Seq("r"), "left_anti")
      val byRow = Window.partitionBy("r").orderBy(col("v").desc, col("c").asc)
      val ranked = unassigned.join(prices, "c")
        .select(col("r"), col("c"), col("p"), (col("w") - col("p")).as("v"))
        .withColumn("rn", row_number().over(byRow))
      val best = ranked.where(col("rn") === 1).select("r", "c", "p", "v")
      val second = ranked.where(col("rn") === 2).select(col("r"), col("v").as("v2"))
      val bids = best.join(second, Seq("r"), "left")
        .select(col("r"), col("c"),
          (col("p") + (col("v") - coalesce(col("v2"), col("v") - big)) + 1L).as("bid"))
      val byCol = Window.partitionBy("c").orderBy(col("bid").desc, col("r").asc)
      val wins = cp(bids.withColumn("wrn", row_number().over(byCol))
        .where(col("wrn") === 1).select("r", "c", "bid"))
      val (prevA, prevP) = (assigned, prices)
      assigned = cp(prevA.join(wins.select("c"), Seq("c"), "left_anti")
        .select("r", "c").unionByName(wins.select("r", "c")))
      prices = cp(prevP.join(wins.select("c"), Seq("c"), "left_anti")
        .unionByName(wins.select(col("c"), col("bid").as("p"))))
      open = allRows.join(assigned.select("r"), Seq("r"), "left_anti").count()
      cp.free(prevA); cp.free(prevP); cp.free(wins)
    }
    val out = cp(assigned.join(e, Seq("r", "c")).select("r", "c", "w"))
    cp.freeAllExcept(out)
    out
  }
}
