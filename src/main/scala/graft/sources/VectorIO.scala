package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FullyDist(Sp)Vec text IO — the reference's vector interchange format
  * (FullyDistSpVec::ParallelRead, FullyDistSpVec.cpp:1209-1307;
  * ParallelWrite, FullyDistSpVec.cpp:1310-1352; exercised by
  * ReleaseTests/VectorIO.cpp and VectorIOPermute.cpp):
  *
  *   <length> \t <nnz>          -- header, rank-0 only
  *   <ind> \t <value>           -- one entry per line, optionally 1-based
  *
  * Semantics matched: optional one-based indices (`onebased` ctor flag);
  * duplicate indices merge through a commutative combiner — the reference
  * VectorIO test warns and keeps the lexicographic max, the default here;
  * the header is parsed driver-side (one line) while the body is read
  * distributed by byte-range splits, exactly as ParallelRead's
  * FetchBatch loop assigns file chunks to ranks.
  *
  * The permute-on-load path (VectorIOPermute.cpp; FullyDistVec's
  * index-permutation semantics) renames entry indices through a
  * permutation vector DURING the load — one keyed join, no second pass —
  * the vector analog of PermEdges/RenameVertices.
  *
  * Values are kept as strings (the reference templates NT — doubles,
  * strings, short reads); callers cast. Parquet stays the at-scale native
  * format; this is the interchange path.
  */
object VectorIO {

  case class VHeader(len: Long, nnz: Long, headerBytes: Long)

  /** Parse the one-line header, tracking its exact byte length so the
    * distributed body read can filter by line offset. Goes through the
    * Hadoop FileSystem API, so `path` may live on any configured store
    * (HDFS, S3A, local) — the same resolution the body read gets from
    * `newAPIHadoopFile`. */
  def readHeader(path: String,
                 conf: org.apache.hadoop.conf.Configuration =
                   new org.apache.hadoop.conf.Configuration()): VHeader = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = new java.io.BufferedInputStream(p.getFileSystem(conf).open(p))
    try {
      val sb = new StringBuilder
      var bytes = 0L
      var c = in.read()
      while (c >= 0 && c != '\n') { sb.append(c.toChar); bytes += 1; c = in.read() }
      if (c == '\n') bytes += 1
      val d = sb.toString.trim.split("\\s+")
      require(d.length >= 2, s"vector header needs '<len> <nnz>': $path")
      VHeader(d(0).toLong, d(1).toLong, bytes)
    } finally in.close()
  }

  /** (ind: long, value: string) with 0-based indices; duplicates merged
    * via `dup` over the value column (default: max, the reference
    * VectorIO test's keep-lexicographically-larger BinOp). */
  def read(spark: SparkSession, path: String, oneBased: Boolean = false,
           dup: Column => Column = max): DataFrame = {
    import spark.implicits._
    val h = readHeader(path, spark.sparkContext.hadoopConfiguration)
    val headerBytes = h.headerBytes
    val base = if (oneBased) 1L else 0L
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val entries = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      // keys = byte offset of each line start (Hadoop reuses Writables —
      // extract primitives immediately)
      .map { case (off, line) => (off.get(), line.toString) }
      .filter(_._1 >= headerBytes)
      .flatMap { case (_, raw) =>
        val t = raw.trim
        if (t.isEmpty) None
        else {
          val p = t.split("\\s+", 2)
          Some((p(0).toLong - base, if (p.length > 1) p(1).trim else ""))
        }
      }.toDF("ind", "value")
    entries.groupBy("ind").agg(dup(col("value")).as("value"))
  }

  /** [[read]] + cast to double (the FullyDistVec<IT,double> instantiation). */
  def readDoubles(spark: SparkSession, path: String,
                  oneBased: Boolean = false): DataFrame =
    read(spark, path, oneBased)
      .select(col("ind"), col("value").cast("double").as("value"))

  /** Permute-on-load: entry indices are renamed through `perm`
    * (ind → pind) as part of the load — out[perm(i)] = in[i]. Entries
    * whose index the permutation does not cover are DROPPED (the
    * reference's induced-subvector semantics when loading against a
    * non-isolated-vertex permutation). */
  def readPermuted(spark: SparkSession, path: String, perm: DataFrame,
                   oneBased: Boolean = false): DataFrame =
    read(spark, path, oneBased)
      .join(perm.select(col("ind"), col("pind")), Seq("ind"))
      .select(col("pind").as("ind"), col("value"))

  /** Write (ind, value) in the reference format: header then TAB-separated
    * entries. Body written distributed (Spark text sink — any Hadoop FS);
    * the driver stitches header + part files through the same FileSystem
    * API (streaming copy, never materialized in memory), so the target may
    * be HDFS/S3A/local alike. */
  def write(vec: DataFrame, path: String, len: Long,
            oneBased: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val base = if (oneBased) 1L else 0L
    val nnz = vec.count()
    val bodyDir = path + ".body"
    vec.select(concat_ws("\t", col("ind") + base, col("value")).as("value"))
      .write.mode("overwrite").text(bodyDir)
    val conf = vec.sparkSession.sparkContext.hadoopConfiguration
    val out = new Path(path)
    val fs = out.getFileSystem(conf)
    val sink = fs.create(out, true)
    try {
      sink.write(s"$len\t$nnz\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      fs.listStatus(new Path(bodyDir)).toSeq
        .filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .foreach { st =>
          val in = fs.open(st.getPath)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, sink, conf, false)
          finally in.close()
        }
    } finally sink.close()
  }
}
