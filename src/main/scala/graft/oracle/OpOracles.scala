package graft.oracle

/** DuckDB oracles for the matrix/vector operator family (SURVEY.md §2.2-2.6).
  * Shares the link-graph CTE prelude with [[GraphOracles]]; adds the
  * weighted matrix (w = co-occurrence multiplicity, integer-valued DOUBLE so
  * sums stay exact in floating point). */
object OpOracles {

  /** Weighted co-occurrence matrix CTE (requires nothing else). */
  val wedgesCte: String =
    """dli AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
      |wedges AS MATERIALIZED (
      |  SELECT src, dst, CAST(c AS DOUBLE) AS w FROM (
      |    SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS c
      |    FROM dli a JOIN dli b ON a.ok = b.ok AND a.l_partkey <> b.l_partkey
      |    GROUP BY a.l_partkey, b.l_partkey))""".stripMargin

  private def withBoth(body: String): String =
    s"WITH RECURSIVE ${GraphOracles.edgesCte},\n$wedgesCte\n$body"

  def reduceRowsSql: String = withBoth(
    """SELECT src AS v, CAST(count(*) AS BIGINT) AS nnz, sum(w) AS wsum
      |FROM wedges GROUP BY src ORDER BY v""".stripMargin)

  def maskedReduceSql(minOutdeg: Long): String = withBoth(
    s"""SELECT src AS v, CAST(count(*) AS BIGINT) AS nnz, sum(w) AS wsum
       |FROM wedges
       |WHERE src IN (SELECT src FROM edges GROUP BY src HAVING count(*) > $minOutdeg)
       |GROUP BY src ORDER BY v""".stripMargin)

  def kselectSql(k: Int): String = withBoth(
    s"""SELECT * FROM (
       |  SELECT dst AS v, src, w,
       |         CAST(row_number() OVER (PARTITION BY dst
       |                                 ORDER BY w DESC, src ASC) AS BIGINT) AS rn
       |  FROM wedges) WHERE rn <= $k ORDER BY v, rn""".stripMargin)

  def spmvPlusTimesSql: String = withBoth(
    """SELECT dst AS v, sum(w * CAST(src % 7 + 1 AS DOUBLE)) AS yv
      |FROM wedges GROUP BY dst ORDER BY v""".stripMargin)

  def spmvMinPlusSql: String = withBoth(
    """SELECT dst AS v, min(w + CAST(src AS DOUBLE)) AS yv
      |FROM wedges GROUP BY dst ORDER BY v""".stripMargin)

  def spgemmRowStatsSql: String = withBoth(
    """SELECT i AS v, CAST(count(*) AS BIGINT) AS nnz, CAST(sum(c) AS BIGINT) AS total
      |FROM (SELECT e1.src AS i, e2.dst AS j, count(*) AS c
      |      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      |      GROUP BY e1.src, e2.dst)
      |GROUP BY i ORDER BY v""".stripMargin)

  /** S·A·Sᵀ with indicator restriction rows collapses to a coarse-pair
    * group-sum — an independent derivation of the spgemm composition.
    * Sums of integral doubles < 2^53 are exact, so the BIGINT cast is
    * engine-neutral. */
  def galerkinSql: String = withBoth(
    """SELECT (src // 8) AS src, (dst // 8) AS dst,
      |       CAST(sum(w) AS BIGINT) AS w
      |FROM wedges GROUP BY 1, 2 ORDER BY src, dst""".stripMargin)

  /** Boolean (∨,∧) SpGEMM A⊗A = the distinct 2-step-reachable pair set. */
  def boolSpgemmSql: String =
    s"""WITH RECURSIVE ${GraphOracles.edgesCte}
       |SELECT DISTINCT e1.src AS src, e2.dst AS dst
       |FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
       |ORDER BY src, dst""".stripMargin

  def ewiseMaskSql: String = withBoth(
    """, a2 AS MATERIALIZED (SELECT DISTINCT e1.src AS i, e2.dst AS j
      |                      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM a2
      |   WHERE EXISTS (SELECT 1 FROM edges e WHERE e.src = a2.i AND e.dst = a2.j)) AS intersect_nnz,
      |  (SELECT CAST(count(*) AS BIGINT) FROM a2
      |   WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = a2.i AND e.dst = a2.j)) AS exclude_nnz""".stripMargin)

  def pruneSplitSql: String = withBoth(
    """SELECT src AS v,
      |       CAST(sum(CASE WHEN src > dst THEN 1 ELSE 0 END) AS BIGINT) AS lower_nnz,
      |       CAST(sum(CASE WHEN src < dst THEN 1 ELSE 0 END) AS BIGINT) AS upper_nnz
      |FROM edges GROUP BY src ORDER BY v""".stripMargin)

  def bandwidthSql: String = withBoth(
    """SELECT CAST(max(abs(src - dst)) AS BIGINT) AS bandwidth,
      |       CAST(count(*) AS BIGINT) AS nnz,
      |       CAST(count(DISTINCT src) AS BIGINT) AS nonempty_rows
      |FROM edges""".stripMargin)

  def dictPartsSql: String =
    """SELECT p_name, CAST(row_number() OVER (ORDER BY p_name) - 1 AS BIGINT) AS vid
      |FROM (SELECT DISTINCT p_name FROM part) ORDER BY p_name""".stripMargin

  def sortPermSql: String =
    """SELECT p_partkey,
      |       CAST(row_number() OVER (ORDER BY p_retailprice, p_partkey) - 1 AS BIGINT) AS rank
      |FROM part ORDER BY p_partkey""".stripMargin
}
