package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global dense ranking — the engine behind [[Dictionary]] and the
  * vector sort/permutation operators (reference FullyDistVec::sort,
  * FullyDistVec.cpp:746-782, which uses a sample-based parallel sort
  * exactly like this: range-partition, sort locally, offset by prefix sums).
  *
  * Never uses a global single-partition window: ranks are computed per
  * range-partition and shifted by collected per-partition counts (a P-row
  * driver collect, P = shuffle partitions).
  *
  * The rank is deterministic iff the sort key chain is a total order over
  * the rows — callers must include a tiebreaker column.
  */
object Ranking {

  /** Adds a dense 0-based `rankCol` ordered by `sortCols`. */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                 parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint PINS the range boundaries: RangePartitioner samples
    // with a seed derived from the rdd id, so re-executing the plan could
    // draw different boundaries — the size collect and the returned plan
    // must read the SAME materialized shuffle output or rows near a
    // boundary get offset by the wrong partition count.
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val sizes = ranged.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, c) => val row = (pid, acc); acc += c; row }
    val offsetsDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val perPart = Window.partitionBy("__pid").orderBy(sortCols: _*)
    ranged
      .withColumn("__rank", row_number().over(perPart).cast("long") - 1L)
      .join(offsetsDf, "__pid")
      .withColumn(rankCol, col("__rank") + col("__offset"))
      .drop("__pid", "__rank", "__offset")
  }
}
