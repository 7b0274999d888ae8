package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
  * variant is the scale path (candidates only within sign-pattern buckets —
  * sub-quadratic for balanced buckets).
  *
  * Determinism: elements are cast float→double (exact) and the dot product
  * is a LEFT FOLD in list order (`aggregate`), which both Spark and the
  * DuckDB oracle (`list_dot_product`) evaluate sequentially — bit-identical
  * doubles, so ranking with the (cos desc, id asc) tiebreak is exact.
  */
object Ann {

  private def dvec(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** (vec_id, norm) — L2 norms. */
  def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), sqrt(dot(dvec(col("embedding")), dvec(col("embedding")))).as("norm"))

  /** Symmetric per-vector int8 scalar quantization — the vector-index prep
    * step of an embedding pipeline (scale = max|x|/127;
    * qᵢ = clamp(⌊xᵢ/scale + 0.5⌋, ±127)). Rounding is spelled as
    * floor(v + 0.5) — floor is IEEE-exact in every engine, unlike round(),
    * whose tie rule differs across engines — and / and abs/max are exact,
    * so the codes are engine-identical and the stats variant hash-gates.
    * @return (vec_id, scale, q: array<int>) */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = dvec(col("embedding"))
    val mx = array_max(transform(v, x => abs(x)))
    val scale = when(mx === 0.0, lit(0.0)).otherwise(mx / lit(127.0))
    emb.select(col("vec_id"), scale.as("scale"), v.as("v"))
      .select(col("vec_id"), col("scale"),
        transform(col("v"), x =>
          greatest(lit(-127), least(lit(127),
            floor(when(col("scale") === 0.0, lit(0.0))
              .otherwise(x / col("scale")) + lit(0.5)).cast("int")))).as("q"))
  }

  /** Oracle-friendly projection of [[quantizeInt8]]: integer code sums and
    * the saturated-element count per vector (exact in any engine). */
  def quantizeInt8Stats(emb: DataFrame): DataFrame =
    quantizeInt8(emb).select(
      col("vec_id"), col("scale"),
      aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
      aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_abs_sum"),
      size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"))

  /** Exact cosine top-k neighbors for query vectors (vec_id < nQueries).
    * @return (qid, nid, rank) — cosine kept internal (FP-free output). */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), dvec(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val queries = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn"))
    val cand = base
      .select(col("vec_id").as("nid"), col("e").as("ne"), col("norm").as("nn"))
    val scored = broadcast(queries).crossJoin(cand)
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
    val byQ = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(byQ).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** Sign-pattern LSH buckets: bucket = the sign bits of the first `bits`
    * dimensions (a fixed, deterministic hyperplane family). */
  def signBuckets(emb: DataFrame, bits: Int = 8): DataFrame = {
    val bucket = (0 until bits).map { i =>
      when(element_at(col("embedding"), i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.select(col("vec_id"), bucket.as("bucket"))
  }

  /** Multi-table sign-LSH: table t hashes the sign bits of dimensions
    * [t·bits, (t+1)·bits) — `tables` independent hyperplane families, so a
    * near neighbor missed by one table is caught by another (recall), while
    * MORE bits per table (16 → 65k buckets) keeps each bucket small
    * (sub-quadratic candidate joins). (vec_id, tbl, bucket) */
  def multiTableBuckets(emb: DataFrame, bits: Int, tables: Int): DataFrame =
    (0 until tables).map { t =>
      val bucket = (0 until bits).map { i =>
        when(element_at(col("embedding"), t * bits + i + 1) >= 0f, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      emb.select(col("vec_id"), lit(t).as("tbl"), bucket.as("bucket"))
    }.reduce(_ unionByName _)

  /** Deterministic Gaussian-ish hyperplane family: component (t, i, j) is a
    * sum of three md5-derived uniforms minus 1.5 (Irwin-Hall ≈ N(0, 0.25)) —
    * pure integer/FP arithmetic from the seed string, so the family is
    * reproducible on any engine that can MD5 (the MIS-priority trick).
    * Generated ON THE DRIVER (tables × bits × dim components, a few KB) and
    * embedded as literals — never a per-row md5 storm. */
  def gaussianHyperplanes(seed: String, tables: Int, bits: Int,
                          dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(t: Int, i: Int, j: Int, k: Int): Double = {
      val h = md.digest(s"$seed:$t:$i:$j:$k".getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xFFL); b += 1 }
      (v >>> 4).toDouble / (1L << 60).toDouble // [0, 1)
    }
    Array.tabulate(tables, bits, dim)((t, i, j) =>
      u(t, i, j, 0) + u(t, i, j, 1) + u(t, i, j, 2) - 1.5)
  }

  /** Multi-table random-hyperplane sign-LSH (the classic SimHash/random
    * projection family): bit i of table t is sign(⟨h_{t,i}, x⟩) for a seeded
    * Gaussian-ish hyperplane. Unlike [[multiTableBuckets]]' sign-of-dimension-i
    * family, every bit MIXES all dimensions, so correlated or low-variance
    * dimensions cannot collapse a table into one degenerate bucket (measured
    * on the correlated-dims fixture in ScaleGuardSpec: recall@10 0.46 → 0.84).
    * Cost: bits × tables left-fold dot products per row (codegen'd
    * higher-order functions, no UDF) vs the dim-family's free sign reads —
    * the recall/throughput trade both families document.
    * @return (vec_id, tbl, bucket) */
  def randomHyperplaneBuckets(emb: DataFrame, bits: Int = 16,
                              tables: Int = 4,
                              seed: String = "rh"): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val hp = gaussianHyperplanes(seed, tables, bits, dim)
    val e = dvec(col("embedding"))
    (0 until tables).map { t =>
      val bucket = (0 until bits).map { i =>
        val h = typedLit(hp(t)(i).toSeq)
        when(dot(e, h) >= 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      emb.select(col("vec_id"), lit(t).as("tbl"), bucket.as("bucket"))
    }.reduce(_ unionByName _)
  }

  /** Shared candidate-join + exact-cosine ranking over any (vec_id, tbl,
    * bucket) table — the engine behind both bucket families. */
  private def topKFromBuckets(emb: DataFrame, buckets: DataFrame,
                              nQueries: Int, k: Int,
                              bucketCap: Int): DataFrame = {
    val byBucket = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    val b = buckets
      .withColumn("rn", row_number().over(byBucket))
      .where(col("rn") <= bucketCap)
      .select("vec_id", "tbl", "bucket")
    val pairs = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
      .join(b.select(col("vec_id").as("nid"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val base = emb.select(col("vec_id"), dvec(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val scored = pairs
      .join(base.select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn")), "qid")
      .join(base.select(col("vec_id").as("nid"), col("e").as("ne"), col("norm").as("nn")), "nid")
      .withColumn("cos", dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
    val byQ = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(byQ).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** Multi-table bucketed ANN with a deterministic per-bucket cap: within
    * each (table, bucket) only the first `bucketCap` vec_ids participate,
    * so one degenerate bucket (near-duplicate embeddings, zero-heavy dims)
    * is bounded at cap² pairs instead of going quadratic in the corpus.
    * Candidates are the DISTINCT union over tables; ranking is exact
    * cosine with the (cos desc, nid asc) pinned tiebreak.
    * @return (qid, nid, rank) */
  def multiTableTopK(emb: DataFrame, nQueries: Int, k: Int, bits: Int = 16,
                     tables: Int = 4, bucketCap: Int = 1000): DataFrame =
    topKFromBuckets(emb, multiTableBuckets(emb, bits, tables), nQueries, k,
      bucketCap)

  /** [[multiTableTopK]] on the [[randomHyperplaneBuckets]] family — the
    * recall-hardened option for embeddings with correlated dimensions.
    * @return (qid, nid, rank) */
  def randomHyperplaneTopK(emb: DataFrame, nQueries: Int, k: Int,
                           bits: Int = 16, tables: Int = 4,
                           bucketCap: Int = 1000,
                           seed: String = "rh"): DataFrame =
    topKFromBuckets(emb, randomHyperplaneBuckets(emb, bits, tables, seed),
      nQueries, k, bucketCap)

  /** IVF-style ANN (the FAISS IVF-flat architecture on Spark): a tiny
    * deterministic centroid table (the `nCells` vectors with smallest
    * md5("seed:vec_id") — a seeded pseudo-random sample, same engine-neutral
    * trick as MIS priorities) is BROADCAST; every vector is assigned to its
    * nearest centroid by cosine in one pass (map-side-combined struct-max —
    * the shuffle moves one row per vector, never per (vector, centroid)
    * pair); each query probes its `nProbe` nearest cells and ranks exact
    * cosine only within them. Sub-quadratic: candidate volume is
    * ~nProbe/nCells of the corpus, and the candidate join is keyed by cell.
    *
    * Determinism: all FP is the same left-fold dot product as the rest of
    * this file (bit-identical to the DuckDB oracle); assignment/probe/rank
    * tiebreaks are pinned (cos desc, cid/nid asc).
    * @return (qid, nid, rank) */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int, nCells: Int = 16,
              nProbe: Int = 4, seed: String = "ivf"): DataFrame = {
    val base = emb.select(col("vec_id"), dvec(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val cents = base
      .withColumn("pri", md5(concat_ws(":", lit(seed), col("vec_id"))))
      .orderBy(col("pri"), col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("norm").as("cn"))
    val scoredC = base.crossJoin(broadcast(cents))
      .withColumn("cos", dot(col("e"), col("ce")) / (col("norm") * col("cn")))
    // nearest cell per vector: max of (cos, -cid) = (cos desc, cid asc)
    val assign = scoredC
      .groupBy("vec_id")
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), (-col("m.ncid")).cast("long").as("cell"))
    val byQ = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid").asc)
    val probes = scoredC.where(col("vec_id") < nQueries)
      .withColumn("rn", row_number().over(byQ)).where(col("rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("cid").cast("long").as("cell"))
    val cand = probes
      .join(assign.select(col("vec_id").as("nid"), col("cell")), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid")
    val scored = cand
      .join(base.select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn")), "qid")
      .join(base.select(col("vec_id").as("nid"), col("e").as("ne"), col("norm").as("nn")), "nid")
      .withColumn("cos", dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
    val byQid = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(byQid).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: multi-table sign-LSH candidate
    * generation (same capped banding as [[multiTableTopK]]) filtered to
    * exact cosine ≥ minCos — the embedding member of the dedup family.
    * The threshold compare is exact in both engines (bit-identical left-fold
    * dot products), so the boundary cannot flake.
    * @return (a, b, cos) with a < b */
  def embedNearDup(emb: DataFrame, minCos: Double, bits: Int = 16,
                   tables: Int = 4, bucketCap: Int = 1000): DataFrame = {
    val byBucket = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    val b = multiTableBuckets(emb, bits, tables)
      .withColumn("rn", row_number().over(byBucket))
      .where(col("rn") <= bucketCap)
      .select("vec_id", "tbl", "bucket")
    val pairs = b.select(col("vec_id").as("a"), col("tbl"), col("bucket"))
      .join(b.select(col("vec_id").as("b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val base = emb.select(col("vec_id"), dvec(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    pairs
      .join(base.select(col("vec_id").as("a"), col("e").as("ae"), col("norm").as("an")), "a")
      .join(base.select(col("vec_id").as("b"), col("e").as("be"), col("norm").as("bn")), "b")
      .withColumn("cos", dot(col("ae"), col("be")) / (col("an") * col("bn")))
      .where(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Bucketed ANN: exact cosine ranking restricted to same-bucket
    * candidates — the IVF/LSH scale path. (qid, nid, rank) */
  def bucketedTopK(emb: DataFrame, nQueries: Int, k: Int, bits: Int = 8): DataFrame = {
    val b = signBuckets(emb, bits)
    val base = emb.join(b, "vec_id")
      .select(col("vec_id"), col("bucket"), dvec(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val scored = base.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("bucket"), col("e").as("qe"), col("norm").as("qn"))
      .join(base.select(col("vec_id").as("nid"), col("bucket"), col("e").as("ne"), col("norm").as("nn")), "bucket")
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
    val byQ = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(byQ).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }
}
