package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.VectorIO

/** Vector text IO (reference FullyDistSpVec::ParallelRead/ParallelWrite,
  * ReleaseTests/VectorIO.cpp + VectorIOPermute.cpp): reference-format
  * fixture parse, duplicate-merge policy, roundtrip, permute-on-load. */
class VectorIOSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture(contents: String): String = {
    val f = java.nio.file.Files.createTempFile("vec", ".txt")
    java.nio.file.Files.writeString(f, contents)
    f.toString
  }

  // Hand-written reference-format fixture: header "<len> <nnz>", TAB or
  // space separated "<ind> <val>" lines — the exact shape
  // FullyDistSpVec::ParallelRead fscanf/istream-parses.
  private val refFixture = fixture(
    "8\t5\n" +
      "0\t3.5\n" +
      "2\t1.25\n" +
      "5\t-4.0\n" +
      "2\t0.75\n" + // duplicate index: reference warns, keeps max
      "7\t2.0\n")

  test("reads a reference-format fixture (0-based, dup keeps max)") {
    val h = VectorIO.readHeader(refFixture)
    assert(h.len == 8L && h.nnz == 5L)
    val v = VectorIO.readDoubles(spark, refFixture)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // "2" appears twice: 1.25 vs 0.75 → lexicographic max "1.25" wins
    assert(v == Map(0L -> 3.5, 2L -> 1.25, 5L -> -4.0, 7L -> 2.0))
  }

  test("one-based read shifts indices down") {
    val f = fixture("4\t2\n1\t10\n4\t40\n")
    val v = VectorIO.readDoubles(spark, f, oneBased = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(v == Map(0L -> 10.0, 3L -> 40.0))
  }

  test("write → read roundtrip preserves entries and header") {
    val s = spark
    import s.implicits._
    val vec = Seq((0L, "a"), (3L, "b"), (9L, "c")).toDF("ind", "value")
    val path = java.nio.file.Files.createTempDirectory("vio").toString + "/v.txt"
    VectorIO.write(vec, path, len = 10L)
    val h = VectorIO.readHeader(path)
    assert(h.len == 10L && h.nnz == 3L)
    val back = VectorIO.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((0L, "a"), (3L, "b"), (9L, "c")))
    // 1-based roundtrip: written +1, read back shifted down
    val path1 = path + ".1b"
    VectorIO.write(vec, path1, len = 10L, oneBased = true)
    val back1 = VectorIO.read(spark, path1, oneBased = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back1 == back)
  }

  test("permute-on-load renames indices through the permutation") {
    val s = spark
    import s.implicits._
    // perm: 0→7, 2→0, 5→1 (7 uncovered → dropped, induced semantics)
    val perm = Seq((0L, 7L), (2L, 0L), (5L, 1L)).toDF("ind", "pind")
    val v = VectorIO.readPermuted(spark, refFixture, perm)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(v == Map(7L -> "3.5", 0L -> "1.25", 1L -> "-4.0"))
  }
}
