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

  /** Full-outer EWiseApply with per-side defaults (EWise.ewiseApply):
    * a = wedges(w≥2), b = wedges((src+dst)%3=0), f = wa + 2·wb. Sums of
    * integral doubles — exact in both engines. */
  def ewiseOuterSql: String = withBoth(
    """, a AS (SELECT * FROM wedges WHERE w >= 2),
      |b AS (SELECT * FROM wedges WHERE (src + dst) % 3 = 0)
      |SELECT COALESCE(a.src, b.src) AS src, COALESCE(a.dst, b.dst) AS dst,
      |       COALESCE(a.w, 0) + 2 * COALESCE(b.w, 0) AS w
      |FROM a FULL OUTER JOIN b ON a.src = b.src AND a.dst = b.dst
      |ORDER BY src, dst""".stripMargin)

  /** SubsRef A(ri, ci): the semi-joins against {v%5=0} × {v%3=0} collapse
    * to predicates because every wedge endpoint is in the vertex set. */
  def subsRefSql: String = withBoth(
    """SELECT src, dst, w FROM wedges
      |WHERE src % 5 = 0 AND dst % 3 = 0 ORDER BY src, dst""".stripMargin)

  /** SpAsgn A(ri, ci) = B with B = the hole's coordinates revalued to 999:
    * equivalent to a per-entry CASE on the hole predicate. */
  def spAsgnSql: String = withBoth(
    """SELECT src, dst,
      |       CASE WHEN src % 7 = 0 AND dst % 2 = 0
      |            THEN CAST(999 AS DOUBLE) ELSE w END AS w
      |FROM wedges ORDER BY src, dst, w""".stripMargin)

  /** Prune by value (w ≥ 3). */
  def pruneValSql: String = withBoth(
    """SELECT src, dst, w FROM wedges WHERE w >= 3 ORDER BY src, dst""".stripMargin)

  /** PruneColumn with the per-column mean as the threshold vector. The
    * mean is an exact-integral sum divided by a BIGINT count — the same
    * IEEE double in both engines, so the ≥ boundary is deterministic. */
  def pruneColsSql: String = withBoth(
    """, thr AS (SELECT dst, sum(w) / count(*) AS t FROM wedges GROUP BY dst)
      |SELECT wedges.src AS src, wedges.dst AS dst, wedges.w AS w
      |FROM wedges JOIN thr ON wedges.dst = thr.dst
      |WHERE wedges.w >= thr.t ORDER BY 1, 2""".stripMargin)

  /** Uniq over the out-degree vector: distinct values, min-index rep. */
  def vecUniqSql: String = withBoth(
    """, deg AS (SELECT src AS v, CAST(count(*) AS DOUBLE) AS xv
      |           FROM edges GROUP BY src)
      |SELECT CAST(min(v) AS BIGINT) AS v, xv FROM deg
      |GROUP BY xv ORDER BY xv""".stripMargin)

  /** Invert of the retailprice sort permutation: rank → partkey. */
  def vecInvertSql: String =
    """SELECT CAST(rank AS BIGINT) AS v, CAST(p_partkey AS DOUBLE) AS xv
      |FROM (SELECT p_partkey,
      |             row_number() OVER (ORDER BY p_retailprice, p_partkey) - 1 AS rank
      |      FROM part)
      |ORDER BY v""".stripMargin

  /** Concatenate(deg, deg[xv≥100], offset=1000000). */
  def vecConcatSql: String = withBoth(
    """, deg AS (SELECT src AS v, CAST(count(*) AS DOUBLE) AS xv
      |           FROM edges GROUP BY src)
      |SELECT v, xv FROM deg
      |UNION ALL
      |SELECT v + 1000000 AS v, xv FROM deg WHERE xv >= 100
      |ORDER BY v""".stripMargin)

  /** Gather out(v) = dense(deg(v)) with dense(v) = (v·37) mod 1001.
    * Inner-join semantics: indices absent from the dense table drop, in
    * both engines. */
  def vecGatherSql: String = withBoth(
    """, deg AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY src)
      |SELECT deg.v AS v, CAST((verts.v * 37) % 1001 AS DOUBLE) AS xv
      |FROM deg JOIN verts ON verts.v = deg.d
      |ORDER BY v""".stripMargin)

  /** ScatterMin: degree vector min-merged with per-target min of incoming
    * src%50 updates; vertices with no update keep their value. All values
    * integral doubles — exact. */
  def vecScatterMinSql: String = withBoth(
    """, deg AS (SELECT src AS v, CAST(count(*) AS DOUBLE) AS xv
      |           FROM edges GROUP BY src),
      |upd AS (SELECT dst AS v, min(CAST(src % 50 AS DOUBLE)) AS u
      |        FROM edges GROUP BY dst)
      |SELECT deg.v AS v, least(deg.xv, COALESCE(upd.u, deg.xv)) AS xv
      |FROM deg LEFT JOIN upd ON deg.v = upd.v
      |ORDER BY v""".stripMargin)

  /** Column reduce (transpose of reduceRows). */
  def reduceColsSql: String = withBoth(
    """SELECT dst AS v, CAST(count(*) AS BIGINT) AS nnz, sum(w) AS wsum
      |FROM wedges GROUP BY dst ORDER BY v""".stripMargin)

  /** MinElement (global argmin, index tiebreak) of the degree vector. */
  def vecMinEltSql: String = withBoth(
    """, deg AS (SELECT src AS v, CAST(count(*) AS DOUBLE) AS xv
      |           FROM edges GROUP BY src)
      |SELECT v, xv FROM deg ORDER BY xv ASC, v ASC LIMIT 1""".stripMargin)

  /** operator+= / MultiwayMerge: A ⊕ A(w≥2) under (+,*) — per-coordinate
    * union summed. ≤2 integral-double addends per cell: exact. */
  def matrixAddSql: String = withBoth(
    """SELECT src, dst, sum(w) AS w FROM (
      |  SELECT src, dst, w FROM wedges
      |  UNION ALL
      |  SELECT src, dst, w FROM wedges WHERE w >= 2)
      |GROUP BY src, dst ORDER BY src, dst""".stripMargin)

  def dictPartsSql: String =
    """SELECT p_name, CAST(row_number() OVER (ORDER BY p_name) - 1 AS BIGINT) AS vid
      |FROM (SELECT DISTINCT p_name FROM part) ORDER BY p_name""".stripMargin

  def sortPermSql: String =
    """SELECT p_partkey,
      |       CAST(row_number() OVER (ORDER BY p_retailprice, p_partkey) - 1 AS BIGINT) AS rank
      |FROM part ORDER BY p_partkey""".stripMargin
}
