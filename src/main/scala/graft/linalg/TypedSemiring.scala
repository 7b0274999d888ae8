package graft.linalg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fully generic semiring for adds that are NOT Catalyst-native aggregates
  * — the typed extension point promised by the semiring abstraction
  * (reference Semirings.h:38-256 allows arbitrary user structs; SURVEY.md
  * §2.10). The flagship kernels never need this (their adds collapse to
  * sum/min/max, which stay in codegen); this path trades codegen for full
  * generality while KEEPING map-side partial aggregation via a typed
  * `Aggregator`.
  */
trait TypedSemiring[O] extends Serializable {
  def zero: O
  def add(a: O, b: O): O
  /** Combine an edge weight with the source-vertex value into O. */
  def mult(w: Double, x: Double): O
}

/** Aggregator bridge: partial-aggregates O on the map side like any
  * built-in agg (the analog of CombBLAS deriving an MPI_Op from the
  * functor, MPIOp.h). Input rows are (w, x) pairs. */
class SemiringAggregator[O](sr: TypedSemiring[O])(implicit enc: Encoder[O])
  extends Aggregator[(Double, Double), O, O] {
  def zero: O = sr.zero
  def reduce(b: O, a: (Double, Double)): O = sr.add(b, sr.mult(a._1, a._2))
  def merge(b1: O, b2: O): O = sr.add(b1, b2)
  def finish(r: O): O = r
  def bufferEncoder: Encoder[O] = enc
  def outputEncoder: Encoder[O] = enc
}

object TypedSpMV {

  /** y = Aᵀ ⊗ x over an arbitrary typed semiring. edges (src, dst[, w]);
    * x (v, xv). @return Dataset[(Long, O)] keyed by dst. */
  def apply[O](edges: DataFrame, x: DataFrame, sr: TypedSemiring[O],
               broadcastX: Boolean = false)
              (implicit enc: Encoder[O]): org.apache.spark.sql.Dataset[(Long, O)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val xx = if (broadcastX) broadcast(x) else x
    val w = if (edges.columns.contains("w")) col("w") else lit(1.0)
    val msgs = edges.join(xx, edges("src") === xx("v"))
      .select(edges("dst").as("dst"), w.cast("double").as("w"), col("xv").cast("double"))
      .as[(Long, Double, Double)]
    msgs.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new SemiringAggregator(sr).toColumn)
  }
}

/** The argmax-count semiring used by label propagation (reference
  * labelprop.cpp:155-230 `get_max_key`): accumulate per-label counts, pick
  * (maxCount, minLabel). Demonstrates a non-collapsible add. */
object ArgMaxCountSemiring extends TypedSemiring[Map[Long, Long]] {
  def zero: Map[Long, Long] = Map.empty
  def add(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
  def mult(w: Double, x: Double): Map[Long, Long] = Map(x.toLong -> 1L)

  /** Deterministic tiebreak: max count, then min label. */
  def best(counts: Map[Long, Long]): Long =
    counts.toSeq.minBy { case (label, c) => (-c, label) }._1
}
