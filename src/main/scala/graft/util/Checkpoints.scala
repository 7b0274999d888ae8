package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tracked lineage truncation for iterative kernels.
  *
  * `Dataset.unpersist` is a NO-OP on a `localCheckpoint`ed frame: the
  * checkpoint's backing RDD is persisted directly on the SparkContext,
  * outside the SQL cache manager that `unpersist` talks to (verified
  * empirically on Spark 4.1 — the `getPersistentRDDs` entry survives the
  * call and the frame remains usable). A kernel that checkpoints per round
  * therefore retains every round's frame until the ContextCleaner happens
  * to GC the dropped references — non-deterministic storage pressure in a
  * long-lived session or a benchmark suite. This helper frees the backing
  * RDDs BY ID, deterministically.
  *
  * Usage: `val cp = new Checkpoints(spark)`; `cp(df)` in place of
  * `df.localCheckpoint()`; `cp.free(prev)` when a round's frame is
  * superseded; `cp.freeAllExcept(result)` before returning (the returned
  * frame stays materialized for the caller; once the caller drops it the
  * ContextCleaner reclaims that last RDD).
  *
  * Id attribution diffs the context's persistent-RDD set around the
  * checkpoint call, so each instance must be used single-threaded (which
  * every iterative kernel here is — the parallelism lives inside jobs).
  */
object Checkpoints {
  /** Run `body`, checkpoint its result, and free every persistent RDD the
    * body created (including frames checkpointed inside callees) except
    * those backing the returned result — a storage-hygiene scope for
    * compositions of kernels whose internal checkpoints are not otherwise
    * reachable from the caller. */
  def scoped(spark: SparkSession)(body: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val res = body
    val mid = sc.getPersistentRDDs.keySet
    val out = res.localCheckpoint() // materialize free of the body's frames
    mid.diff(before).foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    out
  }
}

final class Checkpoints(spark: SparkSession) {
  private val sc = spark.sparkContext
  private val owned = new java.util.IdentityHashMap[DataFrame, Array[Int]]()

  /** localCheckpoint + record the backing RDD ids of the new frame. */
  def apply(df: DataFrame): DataFrame = {
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val added = sc.getPersistentRDDs.keysIterator.filterNot(before.contains).toArray
    owned.put(out, added)
    out
  }

  /** Free the backing RDDs of a tracked frame (no-op for untracked). */
  def free(df: DataFrame): Unit = {
    val ids = owned.remove(df)
    if (ids != null) unpersistIds(ids)
  }

  /** Free every tracked frame except the given ones (typically the
    * returned result). */
  def freeAllExcept(keep: DataFrame*): Unit = {
    val keepSet = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    keep.foreach(keepSet.add)
    val it = owned.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!keepSet.contains(e.getKey)) { unpersistIds(e.getValue); it.remove() }
    }
  }

  def freeAll(): Unit = freeAllExcept()

  private def unpersistIds(ids: Array[Int]): Unit =
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
}
