package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines.
  *
  * All hash material is md5 (identical in every engine — the oracles
  * recompute it in DuckDB), all tie-breaks pinned, so results are
  * deterministic and parallelism-independent.
  *
  * Scale shapes:
  *  - exact: one hash-groupBy on the fingerprint (map-side combined).
  *  - MinHash/LSH: shingle explode → per-(doc, hashIdx) min-aggregate →
  *    band hash → bucket self-join. The bucket join is the only quadratic
  *    risk and only within buckets — the standard LSH contract.
  *  - n-gram Jaccard: inverted-index join on shared shingles, then
  *    |A∩B| counted per pair and |A∪B| = |A|+|B|−|A∩B|.
  */
object Dedup {

  /** Exact dedup on md5(text): representative = min doc_id per group. */
  def exact(docs: DataFrame): DataFrame =
    TextOps.fingerprint(docs)
      .groupBy("fp")
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_docs"))

  /** Character k-shingles, distinct per doc: (doc_id, shingle). */
  def charShingles(docs: DataFrame, k: Int = 5): DataFrame =
    docs.where(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("text")) - (k - 1)),
          i => col("text").substr(i, lit(k)))).as("shingle"))
      .select(col("doc_id"), col("shingle"))
      .distinct()

  /** MinHash signatures: sig_j(doc) = min over shingles of md5(j‖shingle),
    * j = 0..numHashes-1. Hex-string min is a total order — engine-neutral. */
  def minhash(docs: DataFrame, numHashes: Int = 8, k: Int = 5): DataFrame = {
    val sh = charShingles(docs, k)
    val sigCols = (0 until numHashes).map(j => min(md5(concat(lit(j.toString), col("shingle")))).as(s"sig$j"))
    sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH band buckets: band b = md5(sig_{2b} ‖ sig_{2b+1}) → (doc_id, band, bucket). */
  def lshBuckets(signatures: DataFrame, numHashes: Int = 8): DataFrame = {
    val bands = (0 until numHashes / 2).map { b =>
      signatures.select(col("doc_id"), lit(b).as("band"),
        md5(concat(col(s"sig${2 * b}"), col(s"sig${2 * b + 1}"))).as("bucket"))
    }
    bands.reduce(_ union _)
  }

  /** Candidate near-duplicate pairs: docs sharing any LSH bucket.
    *
    * Scale guard: within each (band, bucket) only the first `bucketCap`
    * doc_ids (deterministic — ordered by id) participate in the self-join,
    * so one degenerate bucket (a boilerplate page shared by 10⁶ docs) is
    * bounded at cap² pairs instead of going quadratic in the corpus — the
    * same cap as [[graft.sim.Ann.multiTableTopK]]. Docs beyond the cap in a
    * degenerate bucket are near-identical to the capped ones by LSH
    * construction; exact dedup (or a second pass on the representatives)
    * catches them — the standard capped-LSH contract. */
  def lshCandidates(docs: DataFrame, numHashes: Int = 8, k: Int = 5,
                    bucketCap: Int = 1000): DataFrame = {
    val byBucket = Window.partitionBy("band", "bucket").orderBy("doc_id")
    val buckets = lshBuckets(minhash(docs, numHashes, k), numHashes)
      .withColumn("rn", row_number().over(byBucket))
      .where(col("rn") <= bucketCap)
      .select("doc_id", "band", "bucket")
    buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Word n-gram Jaccard similarity for all pairs above `minJaccard`,
    * via inverted-index join on shared n-grams (never all-pairs).
    *
    * Scale guard: grams with document frequency > `maxDf` are dropped
    * BEFORE the pair join — one boilerplate stop-phrase shared by 10⁶ docs
    * would otherwise contribute 10¹² join rows. Jaccard is then computed
    * consistently over the df-pruned gram universe (both |A∩B| and the
    * sizes), which is the standard inverted-index contract: ubiquitous
    * grams carry no similarity signal.
    *
    * The guard is ON by default (maxDf = 10000) — the unguarded quadratic
    * path must be requested explicitly with maxDf = Long.MaxValue. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.1,
                   maxDf: Long = 10000L): DataFrame = {
    val grams0 = docs.where(size(TextOps.tokens(col("text"))) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(TextOps.tokens(col("text"))) - n),
          i => concat_ws(" ", slice(TextOps.tokens(col("text")), i + 1, lit(n))))).as("gram"))
      .distinct()
    val grams = (if (maxDf == Long.MaxValue) grams0
      else grams0.join(
        grams0.groupBy("gram").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDf).select("gram"),
        Seq("gram"), "left_semi"))
      .localCheckpoint()
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("doc_id").as("a"), col("gram"))
      .join(grams.select(col("doc_id").as("b"), col("gram")), "gram")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
  }

  /** 32-bit SimHash over distinct tokens: bit j set iff
    * Σ_tokens (bit j of md5(token) ? +1 : −1) > 0. The md5 nibble is
    * decoded arithmetically (hex char → value via position in
    * '0123456789abcdef') so the oracle can reproduce it verbatim. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("h", md5(col("tok")))
    val nibbleOf = (pos: Int) =>
      (instr(lit("0123456789abcdef"), substring(col("h"), pos + 1, 1)) - 1).cast("int")
    val bitSums = (0 until 32).map { j =>
      val nib = nibbleOf(j / 4)
      val bit = shiftright(nib, 3 - (j % 4)).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hashExpr = (0 until 32).map { j =>
      when(col(s"s$j") > 0, lit(1L << (31 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("doc_id"), hashExpr.as("simhash"))
  }
}
