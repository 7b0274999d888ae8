package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MatrixMarket coordinate interchange IO — the reference's
  * ParallelReadMM/ParallelWriteMM (SpParMat.cpp:3980-4119), which lets a
  * user run the reference's own test matrices (sevenvertex.mtx,
  * bcsstk01.mtx, …) through this engine for cross-validation.
  *
  * Semantics matched: 1-based coordinates → 0-based ids; `pattern` fields
  * get weight 1; `symmetric` storage is expanded to both triangles
  * (off-diagonal only, as SpParMat's symmetry handling); duplicate entries
  * merge through a commutative combiner (the reference takes a BinaryOp —
  * plus by default here).
  *
  * The header/dims prefix is parsed DRIVER-side (an O(#comment-lines) read
  * of the file head); the body is read distributed — header lines live in
  * the first byte-range split, so only partition 0 drops them. Parquet
  * remains the at-scale native format; .mtx is the interchange path, as in
  * the reference.
  */
object MatrixMarket {

  case class Header(symmetric: Boolean, pattern: Boolean, headerBytes: Long,
                    rows: Long, cols: Long, nnz: Long)

  /** Parses the comment/dims prefix, tracking its EXACT byte length so the
    * distributed body read can filter by line offset (a positional
    * drop-in-partition-0 breaks when a tiny file's first split ends inside
    * the header). MatrixMarket headers are ASCII by spec. */
  def readHeader(path: String): Header = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try {
      var bytes = 0L
      def readLine(): Option[String] = {
        val sb = new StringBuilder
        var c = in.read()
        if (c < 0) return None
        while (c >= 0 && c != '\n') { sb.append(c.toChar); bytes += 1; c = in.read() }
        if (c == '\n') bytes += 1
        Some(sb.toString)
      }
      val first = readLine().getOrElse("")
      require(first.startsWith("%%MatrixMarket"), s"not a MatrixMarket file: $path")
      val toks = first.trim.split("\\s+").map(_.toLowerCase)
      require(toks.length >= 4 && toks(1) == "matrix" && toks(2) == "coordinate",
        s"only coordinate matrices supported: $path")
      val pattern = toks(3) == "pattern"
      val symmetric = toks.last == "symmetric"
      var line = readLine()
      while (line.exists(l => l.trim.startsWith("%") || l.trim.isEmpty))
        line = readLine()
      val dims = line.getOrElse(sys.error(s"missing dimensions line: $path"))
      val d = dims.trim.split("\\s+")
      Header(symmetric, pattern, bytes, d(0).toLong, d(1).toLong, d(2).toLong)
    } finally in.close()
  }

  /** (src, dst, w) with 0-based ids, symmetric expansion, duplicates
    * summed. src = matrix row, dst = column. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val h = readHeader(path)
    val headerBytes = h.headerBytes
    val pattern = h.pattern
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val entries = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      // TextInputFormat keys = exact byte offset of each line start;
      // extract primitives immediately (Hadoop reuses Writables)
      .map { case (off, line) => (off.get(), line.toString) }
      .filter(_._1 >= headerBytes)
      .flatMap { case (_, raw) =>
        val t = raw.trim
        if (t.isEmpty || t.startsWith("%")) None
        else {
          val p = t.split("\\s+")
          val w = if (pattern || p.length < 3) 1.0 else p(2).toDouble
          Some((p(0).toLong - 1, p(1).toLong - 1, w))
        }
      }.toDF("src", "dst", "w")
    val full =
      if (h.symmetric)
        entries.unionByName(entries.where(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst"), col("w")))
      else entries
    full.groupBy("src", "dst").agg(sum("w").as("w"))
  }

  /** Write (src, dst[, w]) as a general real coordinate .mtx. The body is
    * written distributed; the driver then stitches header + part files
    * into one file (interchange format for extracts — at-scale data stays
    * in Parquet). */
  def write(m: DataFrame, path: String, rows: Long, cols: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val w = if (m.columns.contains("w")) col("w") else lit(1.0)
    val nnz = m.count()
    val bodyDir = path + ".body"
    m.select(concat_ws(" ", col("src") + 1, col("dst") + 1, w).as("value"))
      .write.mode("overwrite").text(bodyDir)
    val out = Paths.get(path)
    Files.writeString(out,
      s"%%MatrixMarket matrix coordinate real general\n$rows $cols $nnz\n",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    import scala.jdk.CollectionConverters._
    val parts = Files.list(Paths.get(bodyDir))
    try {
      // streaming append — never materializes a part file in driver memory
      val sink = Files.newOutputStream(out, StandardOpenOption.APPEND)
      try
        parts.iterator().asScala.toSeq
          .filter(_.getFileName.toString.startsWith("part-"))
          .sortBy(_.getFileName.toString)
          .foreach { p => Files.copy(p, sink) }
      finally sink.close()
    } finally parts.close()
  }
}
