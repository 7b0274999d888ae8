package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.sim.Ann

/** Degenerate-input guards for the similarity ops: one hot shingle / one
  * degenerate LSH bucket must stay bounded, never quadratic. */
class ScaleGuardSpec extends AnyFunSuite {
  import TestSpark._

  test("ngramJaccard df-pruning bounds a hot boilerplate shingle") {
    val s = spark
    import s.implicits._
    // 60 docs sharing a 6-token boilerplate prefix + a unique tail:
    // every pair shares the boilerplate grams -> quadratic pair blowup
    val docs = (0 until 60).map { i =>
      (i.toLong, s"the quick brown fox jumps over unique$i tail$i end$i")
    }.toDF("doc_id", "text")
    val unpruned = Dedup.ngramJaccard(docs, 3, 0.01).count()
    assert(unpruned >= 1000, s"expected quadratic pair count, got $unpruned")
    // df-prune drops the boilerplate grams (df=60 > 10); unique tails share
    // nothing, so the candidate set collapses to zero
    val pruned = Dedup.ngramJaccard(docs, 3, 0.01, maxDf = 10).count()
    assert(pruned == 0, s"expected df-pruned pair count 0, got $pruned")
  }

  /** All-positive vectors: every table hashes everything into one bucket —
    * the degenerate case the cap exists for. */
  private def onePosBucket(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => 0.1f + ((i * 31 + j * 7) % 11) * 0.13f))
    }.toDF("vec_id", "embedding")
  }

  test("multi-table ANN bucket cap bounds a degenerate bucket") {
    val emb = onePosBucket(80)
    val capped = Ann.multiTableTopK(emb, 20, 5, bits = 16, tables = 4, bucketCap = 5)
      .collect()
    // only the first 5 vec_ids participate in the single live bucket
    assert(capped.nonEmpty)
    assert(capped.forall(r => r.getLong(0) < 5 && r.getLong(1) < 5), "cap by vec_id order")
    assert(capped.length <= 5 * 4)
  }

  test("dedup-LSH bucket cap bounds a degenerate bucket") {
    val s = spark
    import s.implicits._
    // 50 identical docs: every band hashes them into ONE bucket ->
    // uncapped candidate join is quadratic (C(50,2) = 1225 pairs)
    val docs = (0L until 50L).map(i => (i, "identical boilerplate body text"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.lshCandidates(docs, bucketCap = 1000).count()
    assert(uncapped == 1225L, s"expected 1225 uncapped pairs, got $uncapped")
    // cap=4: only the 4 smallest doc_ids participate per bucket
    val capped = Dedup.lshCandidates(docs, bucketCap = 4).collect()
    assert(capped.length == 6, s"expected C(4,2)=6 capped pairs, got ${capped.length}")
    assert(capped.forall(r => r.getLong(0) < 4 && r.getLong(1) < 4),
      "cap keeps the id-ordered prefix of each bucket")
  }

  test("LSH cap above corpus size is a no-op") {
    val s = spark
    import s.implicits._
    val docs = (0L until 30L).map { i =>
      (i, if (i % 3 == 0) "shared near duplicate content body here" else s"unique document $i with its own words $i")
    }.toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.lshCandidates(docs, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(1000) == pairs(30))
  }

  /** Mixed-sign embeddings so vectors spread across IVF cells. */
  private def mixedEmb(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => (((i * 37 + j * 13) % 19) - 9) * 0.11f))
    }.toDF("vec_id", "embedding")
  }

  test("IVF ANN probing all cells equals exact top-k; deterministic under repartitioning") {
    val emb = mixedEmb(60)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nProbe = nCells: every cell probed -> candidates = whole corpus -> exact
    val all = rows(Ann.ivfTopK(emb, 10, 4, nCells = 8, nProbe = 8))
    val exact = rows(Ann.cosineTopK(emb, 10, 4))
    assert(all == exact, "full-probe IVF must equal brute-force top-k")
    val a = rows(Ann.ivfTopK(emb, 10, 4, nCells = 8, nProbe = 2))
    val b = rows(Ann.ivfTopK(emb.repartition(7), 10, 4, nCells = 8, nProbe = 2))
    assert(a == b, "IVF not deterministic under input repartitioning")
    assert(a.nonEmpty && a.forall { case (_, _, r) => r >= 1 && r <= 4 })
  }

  test("embedNearDup: a<b, threshold respected, equals brute force on a degenerate bucket") {
    val emb = onePosBucket(40) // all-positive: one shared bucket -> all pairs survive banding
    val got = Ann.embedNearDup(emb, 0.9, bits = 16, tables = 4, bucketCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall { case (a, b, c) => a < b && c >= 0.9 })
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(x: Array[Double], y: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val ids = vecs.keys.toSeq.sorted
    val brute = for {
      a <- ids; b <- ids if a < b
      c = dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
      if c >= 0.9
    } yield (a, b, c)
    assert(got.toSet == brute.toSet,
      s"near-dup pairs ${got.length} != brute-force ${brute.length}")
  }

  /** Correlated-dims fixture: dims 0..47 are near-constant POSITIVE (the
    * "every page embedding shares boilerplate direction" shape), so the
    * sign-of-dimension-i family's tables 0-2 collapse into one degenerate
    * bucket each; the discriminative signal lives only in dims 48..63,
    * arranged in clusters so exact top-k is dominated by cluster-mates. */
  private def correlatedEmb(n: Int, clusters: Int) = {
    val s = spark
    import s.implicits._
    def h(x: Long): Long = { // splitmix-style mix, deterministic
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(x: Long): Float = (((h(x) >>> 8) % 2001L) - 1000L) / 1000.0f
    (0 until n).map { i =>
      val c = i % clusters
      val v = Array.tabulate(64) { j =>
        if (j < 48) 0.5f + 0.01f * unit(i * 64L + j)
        else unit(7777L + c * 16L + j) + 0.3f * unit(i * 64L + j)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("random-hyperplane LSH beats sign-of-dimension LSH on correlated dims") {
    val emb = correlatedEmb(1200, 40).cache()
    val nQ = 60; val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosineTopK(emb, nQ, k))
    val sign = pairs(Ann.multiTableTopK(emb, nQ, k, bits = 16, tables = 4,
      bucketCap = 300))
    val rh = pairs(Ann.randomHyperplaneTopK(emb, nQ, k, bits = 16, tables = 4,
      bucketCap = 300, seed = "rh"))
    val rSign = sign.intersect(exact).size.toDouble / exact.size
    val rRh = rh.intersect(exact).size.toDouble / exact.size
    info(f"recall@10: sign-of-dim $rSign%.3f, random-hyperplane $rRh%.3f")
    // The margin is the point: 3 of 4 sign tables are degenerate here while
    // every random hyperplane mixes the informative dims.
    assert(rRh > rSign + 0.05,
      f"expected random hyperplanes to win: rh=$rRh%.3f sign=$rSign%.3f")
    // determinism: same seed, repartitioned input -> identical result
    val rh2 = pairs(Ann.randomHyperplaneTopK(emb.repartition(7), nQ, k,
      bits = 16, tables = 4, bucketCap = 300, seed = "rh"))
    assert(rh2 == rh, "random-hyperplane ANN not deterministic")
    emb.unpersist()
  }

  test("uncapped multi-table ANN on a single bucket equals exact top-k") {
    val emb = onePosBucket(40)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = rows(Ann.multiTableTopK(emb, 8, 3, bits = 16, tables = 4, bucketCap = 1000))
    val exact = rows(Ann.cosineTopK(emb, 8, 3))
    assert(lsh == exact) // single shared bucket => candidate set is all pairs
  }
}
