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

  /** Multi-table bucketed ANN with a deterministic per-bucket cap: within
    * each (table, bucket) only the first `bucketCap` vec_ids participate,
    * so one degenerate bucket (near-duplicate embeddings, zero-heavy dims)
    * is bounded at cap² pairs instead of going quadratic in the corpus.
    * Candidates are the DISTINCT union over tables; ranking is exact
    * cosine with the (cos desc, nid asc) pinned tiebreak.
    * @return (qid, nid, rank) */
  def multiTableTopK(emb: DataFrame, nQueries: Int, k: Int, bits: Int = 16,
                     tables: Int = 4, bucketCap: Int = 1000): DataFrame = {
    val byBucket = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    val b = multiTableBuckets(emb, bits, tables)
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
