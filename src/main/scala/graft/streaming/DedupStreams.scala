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

  // ---------------------------------------------------------------------
  // Streaming MinHash/LSH dedup — the incremental twin of
  // [[graft.dedup.Dedup.lshCandidates]] for continuous-ingest pipelines.
  // ---------------------------------------------------------------------

  case class BucketState(members: Seq[Long], version: Long)
  case class BucketUpdate(band: Int, bucket: String, members: Seq[Long],
                          version: Long)

  /** Per-doc MinHash band buckets, JVM-side — mirrors the batch column
    * pipeline exactly ([[graft.dedup.Dedup.minhash]] → `lshBuckets`):
    * distinct char k-shingles, sig_j = min over shingles of
    * md5(j ‖ shingle) (hex-string min — ASCII, so the JVM's lexicographic
    * String order equals Spark's UTF8 binary order), band b =
    * md5(sig_{2b} ‖ sig_{2b+1}). Docs shorter than k shingle to nothing,
    * as in the batch `where(length ≥ k)`. Pure per-doc function — the
    * "incremental signature maintenance" is stateless by construction;
    * only bucket MEMBERSHIP below is stateful. */
  def sigBands(text: String, numHashes: Int = 8, k: Int = 5): Seq[(Int, String)] = {
    if (text.length < k) return Seq.empty
    val shingles = (0 to text.length - k).map(i => text.substring(i, i + k)).distinct
    val sigs = (0 until numHashes).map { j =>
      shingles.iterator.map(s => md5Hex(j.toString + s)).min
    }
    (0 until numHashes / 2).map(b => (b, md5Hex(sigs(2 * b) + sigs(2 * b + 1))))
  }

  /** Streaming LSH bucket-membership ledger: state per (band, bucket) is
    * the `bucketCap` SMALLEST doc_ids seen — a min-semilattice merge, so
    * the fixpoint is arrival-order- and micro-batching-free and equals the
    * batch cap (`row_number ≤ cap` ordered by doc_id) exactly, including
    * under eviction. Emits the updated membership per touched bucket with
    * a per-key version so readers can select the latest row. State is
    * O(cap) longs per live bucket — the same bound that keeps the batch
    * join sub-quadratic keeps streaming state flat. */
  def lshLedger(docs: Dataset[Doc], numHashes: Int = 8, k: Int = 5,
                bucketCap: Int = 1000): Dataset[BucketUpdate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap(d => sigBands(d.text, numHashes, k)
        .map { case (b, bk) => (b, bk, d.doc_id) })
      .groupByKey(t => (t._1, t._2))
      .mapGroupsWithState[BucketState, BucketUpdate](GroupStateTimeout.NoTimeout()) {
        (key: (Int, String), batch: Iterator[(Int, String, Long)],
         state: GroupState[BucketState]) =>
          val prev = state.getOption.getOrElse(BucketState(Seq.empty, 0L))
          val merged = (prev.members ++ batch.map(_._3))
            .distinct.sorted.take(bucketCap)
          val next = BucketState(merged, prev.version + 1)
          state.update(next)
          BucketUpdate(key._1, key._2, merged, next.version)
      }
  }

  /** Candidate pairs at the ledger fixpoint: latest membership per
    * (band, bucket) → within-bucket pairs a < b, distinct across buckets —
    * the exact batch `lshCandidates` shape. */
  def candidatesFromLedger(updates: DataFrame): DataFrame = {
    val last = updates.groupBy(col("band"), col("bucket"))
      .agg(max(struct(col("version"), col("members"))).as("m"))
      .select(col("m.members").as("ms"))
    last.select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }
}
