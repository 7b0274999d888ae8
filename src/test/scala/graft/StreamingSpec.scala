package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventOps, EventStreams}

/** Streaming ≡ batch: the incremental operators must converge to the batch
  * operators' results on the same data. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp = new Timestamp(1704067200000L + minute * 60000L)

  test("streaming hourly counts == batch hourly window") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val rows = Seq(
      (ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(61), "click", 3.0),
      (ts(70), "view", 4.0), (ts(125), "click", 5.0))
    input.addData(rows: _*)
    val streamDf = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyCounts(streamDf)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly")
      .select(col("hour"), col("event_type"), col("n"), col("total"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventOps.hourlyWindow(
        rows.toDF("ts", "event_type", "value").withColumn("event_id", lit(0L)))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("streaming sessionization == batch session counts") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val events = Seq(
      EventStreams.Event(1L, ts(0), 1.0), EventStreams.Event(1L, ts(10), 1.0),
      EventStreams.Event(1L, ts(50), 1.0), // >30min gap → new session
      EventStreams.Event(2L, ts(0), 1.0), EventStreams.Event(2L, ts(100), 1.0))
    input.addData(events: _*)
    val q = EventStreams.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == Set((1L, 2L, 3L), (2L, 2L, 2L)))
    val batch = EventOps.sessionCounts(
        events.toDF().withColumnRenamed("value", "value")
          .withColumn("event_id", monotonically_increasing_id()), 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == streamed)
  }

  test("streaming dedup ledger converges to batch exact() under any batching") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DedupStreams
    // 9 docs, 4 distinct texts, delivered in 3 shuffled micro-batches
    val docs = Seq(
      (7L, "alpha"), (2L, "beta"), (9L, "alpha"), (1L, "gamma"), (5L, "beta"),
      (3L, "alpha"), (8L, "delta"), (4L, "gamma"), (6L, "beta"))
      .map { case (id, t) => DedupStreams.Doc(id, ts(id.toInt), t) }
    val input = MemoryStream[DedupStreams.Doc]
    val q = DedupStreams.ledger(input.toDS())
      .writeStream.format("memory").queryName("ledger").outputMode("update").start()
    docs.grouped(3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // converged ledger row per fingerprint: rep is monotone non-increasing
    // and the count strictly increases per update, so min/max pick it
    val streamed = spark.table("ledger")
      .groupBy("fp").agg(min("rep_doc_id").as("rep_doc_id"),
        max("n_docs").as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.dedup.Dedup.exact(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, "ledger fixpoint differs from batch exact()")
  }

  test("streaming LSH ledger fixpoint == batch lshCandidates under shuffled batching") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DedupStreams
    // 24 docs: three near-dup families (shared long prefixes → shared
    // shingles/buckets), one 9-doc EXACT-dup family to exercise cap
    // eviction (cap=4 < 9), and unique fillers. Shuffled ids so arrival
    // order ≠ id order.
    val fam = "the quick brown fox jumps over the lazy dog again and again"
    val texts = Seq.tabulate(24) { i =>
      if (i % 3 == 0) fam // 8 exact dups + one more below
      else if (i % 3 == 1) fam + s" variant number $i tail"
      else s"unique document body number $i with its own words entirely"
    } :+ fam
    val ids = Seq(17L, 3L, 21L, 8L, 12L, 1L, 24L, 6L, 19L, 10L, 2L, 15L,
      23L, 5L, 11L, 20L, 7L, 14L, 25L, 4L, 18L, 9L, 13L, 22L, 16L)
    val docs = ids.zip(texts).map { case (id, t) =>
      DedupStreams.Doc(id, ts(id.toInt), t)
    }
    val cap = 4
    // signature-path guard: JVM-side sigBands must reproduce the batch
    // column pipeline's (doc_id, band, bucket) rows bit-for-bit
    val docsDf = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val batchBuckets = graft.dedup.Dedup.lshBuckets(
        graft.dedup.Dedup.minhash(docsDf, 8, 5), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val jvmBuckets = docs.flatMap(d =>
      DedupStreams.sigBands(d.text, 8, 5).map { case (b, bk) => (d.doc_id, b, bk) }).toSet
    assert(jvmBuckets == batchBuckets, "JVM sigBands != batch column pipeline")
    // streaming in shuffled micro-batches of 7
    val input = MemoryStream[DedupStreams.Doc]
    val q = DedupStreams.lshLedger(input.toDS(), 8, 5, cap)
      .writeStream.format("memory").queryName("lshledger").outputMode("update").start()
    docs.grouped(7).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = DedupStreams.candidatesFromLedger(spark.table("lshledger"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.dedup.Dedup.lshCandidates(docsDf, 8, 5, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, "LSH ledger fixpoint differs from batch lshCandidates")
    assert(batch.nonEmpty, "fixture produced no candidate pairs — test is vacuous")
  }

  test("streaming first-seen dedup keeps one row per fingerprint") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DedupStreams
    val input = MemoryStream[DedupStreams.Doc]
    // in-order arrival: first-seen == min doc_id == batch representative
    val docs = (1 to 8).map(i =>
      DedupStreams.Doc(i.toLong, ts(i), if (i % 3 == 0) "dup" else s"t$i"))
    val q = DedupStreams.firstSeen(input.toDF())
      .writeStream.format("memory").queryName("firstseen").outputMode("append").start()
    input.addData(docs: _*); q.processAllAvailable(); q.stop()
    val got = spark.table("firstseen").select("fp", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.map(_._1).distinct.length == got.length, "fingerprint emitted twice")
    val batch = graft.dedup.Dedup.exact(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.toMap == batch, "first-seen differs from batch min-id reps")
  }

  test("media: real PNG/WAV/BMP header decode + feature plumbing") {
    val items = graft.media.Media.payloads(spark, 200)
    val meta = graft.media.Media.decodeMeta(items)
    assert(meta.count() == 200)
    val m = meta.collect()
    // format sniffed from magic bytes must agree with the generator's kind
    val kinds = items.collect().map(x => x.media_id -> x.kind).toMap
    assert(m.forall(x => x.kind == kinds(x.media_id)), "magic-byte sniff mismatch")
    assert(m.forall(x => x.width >= 16 && x.channels >= 1 && x.n_bytes > 64))
    // decoded fields of a known PNG: 640x480 RGBA
    val png = graft.media.MediaItem(0L, "png", {
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
      bb.putInt(640); bb.putInt(480)
      bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putInt(0)
      java.util.Arrays.copyOf(bb.array(), 33 + 11) // pad past min length
    })
    val pm = graft.media.Media.decodeOne(png)
    assert(pm.kind == "png" && pm.width == 640 && pm.height == 480 && pm.channels == 4)
    val feats = graft.media.Media.features(items, 16).collect()
    assert(feats.length == 200)
    assert(feats.forall(_.getSeq[Float](1).length == 16))
    // deterministic across runs
    val again = graft.media.Media.features(graft.media.Media.payloads(spark, 200), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.forall(r => again(r.getLong(0)) == r.getSeq[Float](1)))
    // integer-exact strided projection: recompute per item by hand
    val gotF = feats.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    items.collect().foreach { it =>
      val sums = new Array[Long](16)
      it.payload.zipWithIndex.foreach { case (b, i) => sums(i % 16) += (b & 0xFF) }
      val want = sums.toSeq.map(x => (x / 255.0).toFloat)
      assert(gotF(it.media_id) == want, s"feature mismatch for media ${it.media_id}")
    }
  }
}
