package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String-key → dense Long id dictionary encoding — the Spark analog of
  * `ReadGeneralizedTuples` (reference SpParMat.cpp:3882-3971), which
  * exchanges unique labels, builds a global permutation, and returns the
  * id↔label mapper alongside the matrix.
  *
  * vid = global rank of the key in lexicographic order (dense 0..V-1,
  * deterministic, parallelism-independent). Two implementations:
  *
  *  - [[encode]] — scalable two-phase rank: range-repartition by key, rank
  *    within partitions, add per-partition offsets (collected once; P rows).
  *    No global single-partition window, so it survives 10^12 keys. The
  *    result does NOT depend on the sampled range boundaries: global rank of
  *    a distinct key is invariant to where partitions split.
  *  - a naive `row_number over (order by key)` would funnel all keys through
  *    one partition — correct at test scale, dead at web scale, so it is
  *    deliberately not used anywhere.
  */
object Dictionary {

  /** @param keys single-column DataFrame of (possibly duplicated) keys
    * @return (key: string, vid: long), one row per distinct key */
  def encode(keys: DataFrame, keyCol: String = "url", parts: Int = 0): DataFrame = {
    val spark = keys.sparkSession
    val p = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    val distinctKeys = keys.select(col(keyCol).as("key")).distinct()
      .repartitionByRange(p, col("key"))
      .sortWithinPartitions("key")
    val withPid = distinctKeys.withColumn("pid", spark_partition_id())
    // P-row collect of partition sizes → cumulative offsets (broadcast join).
    import spark.implicits._
    val sizes = withPid.groupBy("pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, c) => val row = (pid, acc); acc += c; row }
    val offsetsDf = broadcast(offsets.toSeq.toDF("pid", "offset"))
    val perPart = Window.partitionBy("pid").orderBy("key")
    withPid
      .withColumn("rank", row_number().over(perPart).cast("long") - 1L)
      .join(offsetsDf, "pid")
      .select(col("key").as(keyCol), (col("rank") + col("offset")).as("vid"))
  }
}
