package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the incremental form of
  * [[graft.dedup.Dedup.exact]], the shape a continuously-ingesting crawl
  * pipeline needs (the reference engine has no streaming layer; this is a
  * forward-looking addition like [[EventStreams]]).
  *
  * Two variants, both keyed by the md5 content fingerprint:
  *  - [[firstSeen]]: the Spark-native stateful built-in —
  *    `withWatermark → dropDuplicates(fp)`. Emits each fingerprint's FIRST
  *    arrival and bounds state by the watermark; the at-scale path (state
  *    store per key, no custom code).
  *  - [[ledger]]: explicit `mapGroupsWithState` keeping (min doc_id,
  *    count) per fingerprint — the running dedup ledger. Min/count are
  *    arrival-order-free, so the final update per fingerprint converges to
  *    the batch `exact()` row no matter how the stream is micro-batched
  *    (spec-verified batch ≡ streaming under a shuffled 3-way split). */
object DedupStreams {

  /** First document to arrive per content fingerprint; state bounded by
    * the event-time watermark. (doc_id, ts, text) → rows + fp. */
  def firstSeen(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicates("fp")

  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class FpState(rep: Long, n: Long)
  case class FpUpdate(fp: String, rep_doc_id: Long, n_docs: Long)

  /** JVM-side md5 hex over UTF-8 bytes — identical to the `md5()` column
    * function, so ledger keys match [[graft.text.TextOps.fingerprint]]. */
  def md5Hex(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Running (fingerprint → representative = min doc_id, duplicate count)
    * ledger; emits the updated row for every fingerprint touched by a
    * micro-batch. */
  def ledger(docs: Dataset[Doc]): Dataset[FpUpdate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map(d => (md5Hex(d.text), d.doc_id))
      .groupByKey(_._1)
      .mapGroupsWithState[FpState, FpUpdate](GroupStateTimeout.NoTimeout()) {
        (fp: String, batch: Iterator[(String, Long)], state: GroupState[FpState]) =>
          var s = state.getOption.getOrElse(FpState(Long.MaxValue, 0L))
          batch.foreach { case (_, id) =>
            s = FpState(math.min(s.rep, id), s.n + 1)
          }
          state.update(s)
          FpUpdate(fp, s.rep, s.n)
      }
  }
}
