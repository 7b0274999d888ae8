package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.linalg.{PlusTimes, Select2ndMin, Skew, SpMV}

/** Property: the skew-aware hub-broadcast SpMV is result-identical to the
  * plain SpMV at every hub threshold (north_rule: explicit skew handling,
  * results invariant). */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  // star hub + random tail: max degree far above mean
  val pairs = RefKernels.randomGraph(100, 300, seed = 5L) ++
    (1L to 80L).map(i => (0L, i))
  lazy val e = undirected(pairs.distinct).persist()
  lazy val v = verticesOf(pairs)

  def xOf = v.select(col("v"), (col("v") % 9 + 1).cast("double").as("xv"))

  test("hub detection finds the planted hub") {
    val h = Skew.hubs(e, 50).collect().map(_.getLong(0))
    assert(h.contains(0L))
    assert(h.length < 5)
  }

  test("skew-aware SpMV == plain SpMV (PlusTimes), all thresholds") {
    val plain = SpMV(e, xOf, PlusTimes).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (t <- Seq(0L, 10L, 50L, 1000000L)) {
      val skewed = Skew.spmv(e, xOf, PlusTimes, minDegree = t).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(skewed.keySet == plain.keySet, s"t=$t keys")
      for ((k, x) <- plain)
        assert(math.abs(x - skewed(k)) < 1e-9, s"t=$t $k: $x vs ${skewed(k)}")
    }
  }

  test("salted two-phase aggregation == direct aggregation (sum and min)") {
    val spark2 = spark
    import spark2.implicits._
    val contribs = (1 to 5000).map(i => ((i % 7).toLong, (i % 13) * 1.5)).toDF("v", "c")
    for (sr <- Seq[graft.linalg.ColumnSemiring](PlusTimes, Select2ndMin)) {
      val direct = contribs.groupBy("v").agg(sr.add(col("c")).as("yv"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val salted = Skew.saltedAggregate(contribs, sr, salts = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(direct.keySet == salted.keySet)
      for ((k, v) <- direct) assert(math.abs(salted(k) - v) < 1e-9, s"${sr.name} $k")
    }
  }

  test("skew-aware SpMV == plain SpMV (Select2ndMin)") {
    val plain = SpMV(e, xOf, Select2ndMin).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val skewed = Skew.spmv(e, xOf, Select2ndMin, minDegree = 30).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(skewed == plain)
  }
}
