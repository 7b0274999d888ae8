package graft.kernels

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Adjacency-only CSR block (no values — BFS needs structure, not
  * weights): rows are DESTINATION vertices, columns sources, exactly the
  * [[graft.linalg.BlockMatrix]] layout minus the 8-bytes-per-edge value
  * array. */
case class AdjBlock(rowBlock: Int, colBlock: Int,
                    rowPtr: Array[Int], colIdx: Array[Int])

/** Block-level bitmap BFS — the reference's Graph500 kernel shape
  * (BFSFriends.h:458-565 bottom-up over BitMapFringe.h bitmaps;
  * BitMapCarousel.h for the rotating frontier slices).
  *
  * The round-2 measurement showed the relational BFS is floored by the
  * per-level Spark job count (3-4 jobs of row-level join machinery per
  * level ≈ 1 MTEPS at local[8] regardless of |E|). This kernel runs ONE
  * job per level: the frontier and visited sets live as bit arrays
  * (|V| bits — the FullyDistVec/BitMapFringe analog, where CombBLAS
  * allgathers exactly this bitmap down the processor column,
  * BFSFriends.h:267-330), broadcast to executors; each task scans its CSR
  * blocks with a bottom-up early-exit row kernel and the per-level
  * candidate bitmap comes back through a treeAggregate OR-reduce.
  *
  * Regime: |V| bits (plus a byte-per-vertex level array) must fit on the
  * driver — 2^27 vertices = 16 MB of bitmap, far under any real driver.
  * At 10^12 vertices (the 100 TB tier) this does NOT fit, exactly as one
  * MPI rank's share wouldn't; [[BFS.levels]] dispatches here only below
  * [[BFS.BitmapMax]] and keeps the fully-distributed relational path
  * beyond it. On a cluster the broadcast is a torrent to executors — the
  * same O(V/8)-byte allgather volume as the reference's bitmap exchange.
  *
  * Work per level is O(rows not yet visited in blocks that contain
  * frontier columns), with per-row early exit on the first frontier
  * neighbor — Beamer's bottom-up asymmetry; a whole-block quick-reject
  * skips blocks whose column range holds no frontier bit (the top-down
  * sparse-frontier case).
  */
object BlockBFS {

  /** Lean CSR block build (the triples→DCSC build of reference
    * SpParMat.cpp:2893-2973, sans values) — packed-long shuffle + sort-free
    * counting-sort assembly, see [[BlockBuild.csrBlocks]]. */
  def buildBlocks(edges: DataFrame, blockSize: Int): RDD[AdjBlock] =
    BlockBuild.csrBlocks(edges, blockSize, Seq(col("rb"), col("cb")))

  /** @param edges symmetric (src, dst) with dense non-negative vids
    * @return (vid, dist) — identical semantics to [[BFS.levels]] */
  def levels(edges: DataFrame, root: Long, maxDepth: Int = 10,
             blockSize: Int = 65536): DataFrame = {
    val spark = edges.sparkSession
    val maxId = math.max(root, edges
      .agg(greatest(max(col("src")), max(col("dst")))).first().getLong(0))
    val blocks = buildBlocks(edges, blockSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    val out = levelsOn(spark, blocks, maxId + 1, root, maxDepth, blockSize)
    blocks.unpersist(blocking = false)
    out
  }

  /** Traversal only, over pre-built persisted blocks — the Graph500
    * "kernel 2" timing boundary (construction is kernel 1). */
  def levelsOn(spark: org.apache.spark.sql.SparkSession, blocks: RDD[AdjBlock],
               n: Long, root: Long, maxDepth: Int,
               blockSize: Int): DataFrame = {
    require(maxDepth <= 127, "bitmap path stores levels as bytes")
    require(n <= Int.MaxValue.toLong, "bitmap path requires V < 2^31")
    require(blockSize % 64 == 0, "block rows must be bitmap-word aligned")
    val sc = spark.sparkContext
    import spark.implicits._
    val words = ((n + 63) >>> 6).toInt

    val visited = new Array[Long](words)
    val frontier = new Array[Long](words)
    @inline def set(a: Array[Long], i: Long): Unit =
      a((i >>> 6).toInt) |= 1L << (i & 63)
    set(visited, root); set(frontier, root)
    val dist = new Array[Byte](n.toInt)
    java.util.Arrays.fill(dist, -1: Byte)
    dist(root.toInt) = 0

    val bs = blockSize
    val nn = n
    val nWords = words
    var depth = 0
    var more = true
    while (more && depth < maxDepth) {
      depth += 1
      val bcF = sc.broadcast(frontier.clone())
      val bcV = sc.broadcast(visited.clone())
      val cand = blocks.treeAggregate(new Array[Long](nWords))(
        seqOp = (acc, blk) => {
          val f = bcF.value; val vis = bcV.value
          val cbase = blk.colBlock.toLong * bs
          // quick reject: no frontier bit in this block's column range
          var w = (cbase >>> 6).toInt
          val wEnd = math.min(nWords, ((cbase + bs + 63) >>> 6).toInt)
          var any = false
          while (!any && w < wEnd) { if (f(w) != 0L) any = true; w += 1 }
          if (any) {
            // row loop walks UNVISITED bits word-by-word: a fully-visited
            // 64-row word costs one test (late levels skip almost all rows
            // — the BitMapFringe payoff: work is O(unvisited rows + edges
            // scanned), not O(blockSize) per level)
            val rbase = blk.rowBlock.toLong * bs // word-aligned (bs % 64 == 0)
            val rMax = math.min(bs.toLong, nn - rbase).toInt
            val wBase = (rbase >>> 6).toInt
            val wCount = (rMax + 63) >>> 6
            var wi = 0
            while (wi < wCount) {
              var clear = ~vis(wBase + wi)
              if (wi == wCount - 1 && (rMax & 63) != 0)
                clear &= (1L << (rMax & 63)) - 1 // mask rows past rMax
              while (clear != 0L) {
                val b = java.lang.Long.numberOfTrailingZeros(clear)
                clear &= clear - 1
                val r = (wi << 6) + b
                var p = blk.rowPtr(r)
                val end = blk.rowPtr(r + 1)
                var hit = false
                while (!hit && p < end) {
                  val s = cbase + blk.colIdx(p)
                  if ((f((s >>> 6).toInt) & (1L << (s & 63))) != 0L) hit = true
                  p += 1
                }
                if (hit) acc(wBase + wi) |= 1L << b
              }
              wi += 1
            }
          }
          acc
        },
        combOp = (a, b) => {
          var i = 0; while (i < nWords) { a(i) |= b(i); i += 1 }; a
        })
      bcF.destroy(); bcV.destroy()
      more = false
      var i = 0
      while (i < nWords) {
        val nf = cand(i) & ~visited(i)
        frontier(i) = nf
        if (nf != 0L) {
          more = true
          visited(i) |= nf
          var bits = nf
          while (bits != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(bits)
            dist(i * 64 + b) = depth.toByte
            bits &= bits - 1
          }
        }
        i += 1
      }
    }

    val bcD = sc.broadcast(dist)
    val out = spark.range(n).as[Long].mapPartitions { it =>
      val d = bcD.value
      it.flatMap { v =>
        val dv = d(v.toInt)
        if (dv >= 0) Iterator((v, dv.toLong)) else Iterator.empty
      }
    }.toDF("vid", "dist").localCheckpoint()
    bcD.destroy()
    out
  }
}
