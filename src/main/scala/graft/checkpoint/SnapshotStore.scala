package graft.checkpoint

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One committed snapshot of an iteration's state. */
case class Snapshot(snapshotId: Long, parentId: Long, iteration: Int,
                    dataPath: String, rows: Long, nnz: Long, flops: Long,
                    createdAtMs: Long)

/** Iceberg-style table layer: Parquet data + an atomic JSON manifest per
  * commit (no Iceberg runtime jar in this environment — SURVEY.md §7).
  *
  * Guarantees:
  *  - atomic commit: data is written to a snapshot-private directory, the
  *    manifest to a temp file, then ATOMIC_MOVE'd into place — readers see
  *    either the previous snapshot or the complete new one, never a torn
  *    state (the reference's analog: per-iteration vectors are only
  *    observable between collectives);
  *  - lineage: every manifest carries its parent snapshot id (chain =
  *    iteration lineage) plus a per-partition row-count sidecar
  *    (partstats parquet), the per-partition bookkeeping CombBLAS keeps as
  *    LoadImbalance / nnz metrics (reference SpParMat.cpp:773-800);
  *  - metrics: nnz and flops per iteration (reference EstimateFLOP,
  *    ParFriends.h:358-444);
  *  - resume: `latest()` returns the newest VALID manifest; half-written
  *    temp files and stray garbage are ignored.
  */
class SnapshotStore(root: String) extends Serializable {
  Files.createDirectories(Paths.get(root))

  private def manifestPath(id: Long) = Paths.get(root, f"manifest-$id%06d.json")

  /** Commit `df` as the state of `iteration`. Returns the snapshot id. */
  def commit(df: DataFrame, iteration: Int, nnz: Long, flops: Long): Long = {
    val prev = latest()
    val id = prev.map(_.snapshotId + 1).getOrElse(0L)
    val parent = prev.map(_.snapshotId).getOrElse(-1L)
    val dataPath = s"$root/data-$id"
    df.write.mode("overwrite").parquet(dataPath)
    // per-partition lineage sidecar (partition id → rows written).
    // ONE pass over the committed data: the row count is the collected
    // sidecar's sum, not a second parquet scan.
    val spark = df.sparkSession
    val stats = spark.read.parquet(dataPath)
      .groupBy(spark_partition_id().as("partitionId"))
      .agg(count(lit(1)).as("rows"))
      .persist()
    stats.write.mode("overwrite").parquet(s"$root/partstats-$id")
    val rows = stats.agg(coalesce(sum(col("rows")), lit(0L))).first().getLong(0)
    stats.unpersist(false)
    val json =
      s"""{"snapshotId": $id, "parentId": $parent, "iteration": $iteration,
         | "dataPath": "$dataPath", "rows": $rows, "nnz": $nnz, "flops": $flops,
         | "createdAtMs": ${System.currentTimeMillis()}}""".stripMargin
    val tmp = Paths.get(root, s".manifest-$id.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(id), StandardCopyOption.ATOMIC_MOVE)
    id
  }

  private def parseLong(json: String, key: String): Option[Long] =
    s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
  private def parseString(json: String, key: String): Option[String] =
    s""""$key"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))

  private def parse(json: String): Option[Snapshot] =
    for {
      id <- parseLong(json, "snapshotId"); parent <- parseLong(json, "parentId")
      iter <- parseLong(json, "iteration"); path <- parseString(json, "dataPath")
      rows <- parseLong(json, "rows"); nnz <- parseLong(json, "nnz")
      flops <- parseLong(json, "flops"); ts <- parseLong(json, "createdAtMs")
    } yield Snapshot(id, parent, iter.toInt, path, rows, nnz, flops, ts)

  /** Newest valid snapshot, tolerating garbage/torn manifests. */
  def latest(): Option[Snapshot] = snapshots().lastOption

  /** All valid snapshots, oldest first (the lineage chain). */
  def snapshots(): Seq[Snapshot] = {
    if (!Files.isDirectory(Paths.get(root))) return Nil
    val stream = Files.list(Paths.get(root))
    try
      stream.iterator.asScala
        .filter(p => p.getFileName.toString.matches("manifest-\\d+\\.json"))
        .flatMap { p =>
          try parse(Files.readString(p)) catch { case _: Exception => None }
        }
        .toSeq.sortBy(_.snapshotId)
    finally stream.close() // Files.list leaks a directory fd if left open
  }

  def load(spark: SparkSession, s: Snapshot): DataFrame =
    spark.read.parquet(s.dataPath)

  /** Per-partition lineage sidecar for a snapshot. */
  def partitionStats(spark: SparkSession, s: Snapshot): DataFrame =
    spark.read.parquet(s"$root/partstats-${s.snapshotId}")
}
