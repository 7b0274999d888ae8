package graft.oracle

/** DuckDB-runnable ANSI SQL oracles for the graph kernels.
  *
  * Each oracle derives the SAME deterministic link graph as
  * [[graft.graph.LinkGraph]] (parts co-occurring in an order) and evaluates
  * the kernel by unrolled / recursive SQL. Numeric literals are CAST to
  * DOUBLE explicitly — DuckDB would otherwise type bare decimals as
  * DECIMAL and diverge from Spark's double arithmetic.
  */
object GraphOracles {

  /** Shared CTE prelude: li / edges / verts. Must be opened with
    * WITH RECURSIVE so the CC/BFS oracles can recurse. */
  val edgesCte: String =
    """li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
      |edges AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |          FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey <> b.l_partkey),
      |verts AS MATERIALIZED (SELECT DISTINCT l_partkey AS v FROM lineitem)""".stripMargin

  private def dbl(x: Double): String = s"CAST('${x}' AS DOUBLE)"

  def pagerankSql(iters: Int = 10, d: Double = 0.85): String = {
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |deg AS MATERIALIZED (SELECT src AS v, count(*) AS outdeg FROM edges GROUP BY src),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM verts),
         |pr0 AS MATERIALIZED (SELECT v, ${dbl(1.0)}/(SELECT n FROM nn) AS r FROM verts)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"pr${i - 1}"
      s"""pr$i AS MATERIALIZED (
         |  SELECT vv.v,
         |    ${dbl(1.0 - d)}/(SELECT n FROM nn) + ${dbl(d)}*(COALESCE(c.s, ${dbl(0.0)}) +
         |      (SELECT COALESCE(sum(p.r), ${dbl(0.0)}) FROM $p p
         |       WHERE p.v NOT IN (SELECT v FROM deg))/(SELECT n FROM nn)) AS r
         |  FROM verts vv
         |  LEFT JOIN (SELECT e.dst AS v, sum(p.r/dg.outdeg) AS s
         |             FROM edges e JOIN $p p ON e.src = p.v JOIN deg dg ON dg.v = e.src
         |             GROUP BY e.dst) c ON c.v = vv.v)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, round(r, 6) AS pr FROM pr$iters ORDER BY vid"
  }

  def ccSql: String =
    s"""WITH RECURSIVE $edgesCte,
       |comp(v, l) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT e.dst, c.l FROM comp c JOIN edges e ON e.src = c.v
       |)
       |SELECT v AS vid, CAST(min(l) AS BIGINT) AS component
       |FROM comp GROUP BY v ORDER BY vid""".stripMargin

  def labelPropSql(rounds: Int = 5): String = {
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |lbl0 AS MATERIALIZED (SELECT v, v AS label FROM verts)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val p = s"lbl${i - 1}"
      s"""lbl$i AS MATERIALIZED (
         |  SELECT l.v, COALESCE(b.newlabel, l.label) AS label
         |  FROM $p l LEFT JOIN (
         |    SELECT v, label AS newlabel FROM (
         |      SELECT cnt.v, cnt.label,
         |             row_number() OVER (PARTITION BY cnt.v
         |                                ORDER BY cnt.c DESC, cnt.label ASC) AS rn
         |      FROM (SELECT e.dst AS v, l2.label, count(*) AS c
         |            FROM edges e JOIN $p l2 ON e.src = l2.v
         |            GROUP BY e.dst, l2.label) cnt) rk
         |    WHERE rn = 1) b ON b.v = l.v)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, CAST(label AS BIGINT) AS label FROM lbl$rounds ORDER BY vid"
  }

  def trianglesSql: String =
    s"""WITH RECURSIVE $edgesCte,
       |l AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst)
       |SELECT CAST(count(*) AS BIGINT) AS triangles
       |FROM (SELECT e1.src AS a, e2.dst AS c
       |      FROM l e1 JOIN l e2 ON e1.dst = e2.src) w
       |JOIN l e3 ON e3.src = w.a AND e3.dst = w.c""".stripMargin

  /** Unrolled Bellman-Ford: d_k = min over ≤k-edge paths. The Spark kernel
    * relaxes only improved vertices per round, which provably yields the
    * SAME d_k, and path sums accumulate one edge per round in both engines
    * (identical FP). Weights are integral doubles → sums exact, so the
    * compare needs no rounding. Extra rounds past the fixpoint are no-ops,
    * so any iters ≥ the kernel's cap compares equal. */
  def ssspSql(iters: Int = 30): String = {
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |${OpOracles.wedgesCte},
         |d0 AS MATERIALIZED (
         |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT) AS v,
         |         CAST('0' AS DOUBLE) AS d)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"d${i - 1}"
      s"""d$i AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM $p
         |    UNION ALL
         |    SELECT e.dst AS v, p.d + e.w AS d
         |    FROM $p p JOIN wedges e ON e.src = p.v)
         |  GROUP BY v)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, d AS dist FROM d$iters ORDER BY vid"
  }

  /** Unrolled time-dependent Bellman-Ford ([[graft.kernels.TDSP]]): the
    * ssspSql recurrence with the arrival relaxation
    * `d + (2 − 4·u·u)·w, u = fmod(d, P)/P − 0.5` in the kernel's exact
    * left-associative operation order. DuckDB's `fmod` is C fmod, which is
    * Java's `%` on doubles, and /,*,− are IEEE-exact in both engines, so
    * every relaxed label is bit-identical by induction and min() over
    * identical value sets is order-free — hash-exact with no rounding.
    * The same frontier-vs-full-relaxation argument as ssspSql applies
    * verbatim (monotone relax): d_k agrees per round, not just at the
    * fixpoint. */
  def tdspSql(startT: Double = 30000.0, iters: Int = 30): String = {
    val P = dbl(graft.kernels.TDSP.Period)
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |${OpOracles.wedgesCte},
         |d0 AS MATERIALIZED (
         |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT) AS v,
         |         ${dbl(startT)} AS d)""".stripMargin
    val u = s"(fmod(p.d, $P)/$P - ${dbl(0.5)})"
    val steps = (1 to iters).map { i =>
      val p = s"d${i - 1}"
      s"""d$i AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM $p
         |    UNION ALL
         |    SELECT e.dst AS v,
         |           p.d + (${dbl(2.0)} - ${dbl(4.0)} * $u * $u) * e.w AS d
         |    FROM $p p JOIN wedges e ON e.src = p.v)
         |  GROUP BY v)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, d AS dist FROM d$iters ORDER BY vid"
  }

  /** Unrolled Luby rounds with the kernel's md5(seed:v) priorities —
    * idempotent once the active set drains, so rounds ≥ the kernel's
    * actual round count compare equal. */
  def misSql(seed: Long = 42L, rounds: Int = 24): String = {
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |pri AS MATERIALIZED (
         |  SELECT v, md5('$seed:' || CAST(v AS VARCHAR)) AS p FROM verts),
         |act0 AS (SELECT v FROM verts),
         |mis0 AS (SELECT CAST(0 AS BIGINT) AS v WHERE 1=0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val a = s"act${i - 1}"
      s"""nm$i AS MATERIALIZED (
         |  SELECT e.dst AS v, min(pr.p) AS np
         |  FROM edges e
         |  JOIN $a sa ON sa.v = e.src
         |  JOIN $a sb ON sb.v = e.dst
         |  JOIN pri pr ON pr.v = e.src
         |  GROUP BY e.dst),
         |win$i AS MATERIALIZED (
         |  SELECT a.v FROM $a a JOIN pri p ON p.v = a.v
         |  LEFT JOIN nm$i n ON n.v = a.v
         |  WHERE n.np IS NULL OR p.p < n.np),
         |rem$i AS MATERIALIZED (
         |  SELECT v FROM win$i
         |  UNION
         |  SELECT e.dst AS v FROM edges e JOIN win$i w ON w.v = e.src),
         |act$i AS MATERIALIZED (
         |  SELECT v FROM $a WHERE v NOT IN (SELECT v FROM rem$i)),
         |mis$i AS (SELECT v FROM mis${i - 1} UNION ALL SELECT v FROM win$i)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT CAST(v AS BIGINT) AS v FROM mis$rounds ORDER BY v"
  }

  /** Batched Brandes: unrolled level-synchronous forward BFS with path
    * counts, then backward dependency accumulation, mirroring the Spark
    * kernel's join shapes term-for-term (σ sums are integral-exact; δ
    * sums round to 6 decimals on both sides). */
  def bcSql(nSources: Int = 16, levels: Int = 10): String = {
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |srcs AS MATERIALIZED (SELECT v AS s FROM verts ORDER BY v LIMIT $nSources),
         |f0 AS MATERIALIZED (SELECT s, s AS v, CAST('1' AS DOUBLE) AS sigma FROM srcs),
         |vis0 AS (SELECT s, v FROM f0)""".stripMargin
    val forward = (1 to levels).map { l =>
      s"""f$l AS MATERIALIZED (
         |  SELECT f.s, e.dst AS v, sum(f.sigma) AS sigma
         |  FROM f${l - 1} f JOIN edges e ON e.src = f.v
         |  LEFT JOIN vis${l - 1} x ON x.s = f.s AND x.v = e.dst
         |  WHERE x.v IS NULL
         |  GROUP BY f.s, e.dst),
         |vis$l AS MATERIALIZED (
         |  SELECT s, v FROM vis${l - 1} UNION ALL SELECT s, v FROM f$l)""".stripMargin
    }
    val back = List(
      s"dl$levels AS MATERIALIZED (SELECT s, v, sigma, CAST('0' AS DOUBLE) AS delta FROM f$levels)") ++
      (levels - 1 to 0 by -1).map { l =>
        s"""c$l AS MATERIALIZED (
           |  SELECT u.s, u.v,
           |         sum(u.sigma / w.sigma * (w.delta + CAST('1' AS DOUBLE))) AS contrib
           |  FROM f$l u
           |  JOIN edges e ON e.src = u.v
           |  JOIN dl${l + 1} w ON w.s = u.s AND w.v = e.dst
           |  GROUP BY u.s, u.v),
           |dl$l AS MATERIALIZED (
           |  SELECT u.s, u.v, u.sigma, COALESCE(c.contrib, CAST('0' AS DOUBLE)) AS delta
           |  FROM f$l u LEFT JOIN c$l c ON c.s = u.s AND c.v = u.v)""".stripMargin
      }
    val unionAll = (0 to levels).map(l => s"SELECT s, v, delta FROM dl$l")
      .mkString("\n  UNION ALL ")
    (head +: (forward ++ back)).mkString(",\n") +
      s"""
         |SELECT v AS vid, round(sum(delta), 6) AS bc FROM (
         |  $unionAll)
         |WHERE v <> s GROUP BY v ORDER BY vid""".stripMargin
  }

  /** Unrolled mutual-min handshake rounds — deterministic, and idempotent
    * once the active edge set drains, so any rounds ≥ the kernel's cap
    * compares equal. */
  def matchingSql(rounds: Int = 20): String = {
    val head =
      s"""WITH be AS MATERIALIZED (
         |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS r,
         |         CAST(l_partkey AS BIGINT) AS c FROM lineitem),
         |m0 AS (SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS c WHERE 1=0),
         |a0 AS (SELECT * FROM be)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val (ap, mp) = (s"a${i - 1}", s"m${i - 1}")
      s"""acc$i AS MATERIALIZED (
         |  SELECT min(r) AS r, c FROM (
         |    SELECT r, min(c) AS c FROM $ap GROUP BY r) GROUP BY c),
         |m$i AS MATERIALIZED (SELECT * FROM $mp UNION ALL SELECT r, c FROM acc$i),
         |a$i AS MATERIALIZED (
         |  SELECT * FROM $ap
         |  WHERE r NOT IN (SELECT r FROM acc$i)
         |    AND c NOT IN (SELECT c FROM acc$i))""".stripMargin
    }
    (head +: steps).mkString(",\n") + s"\nSELECT r, c FROM m$rounds ORDER BY r"
  }

  /** Unrolled Azad-Buluç maximum matching ([[graft.kernels.MaximumMatching]]):
    * greedy-maximal init (the matchingSql recurrence over the derived
    * contested bipartite graph), then `phases` rounds of {multi-source
    * alternating BFS (layers unrolled), level-synchronous augment (steps
    * unrolled)} with every tiebreak the kernel's pinned min. All values are
    * integers, so the compare is exact. Padding is a no-op at every level:
    * a drained fringe/augment frontier propagates empties, and a padded
    * PHASE re-searches from the residual unmatched columns and finds no
    * leaf (no augmenting path exists at the fixpoint), leaving the matching
    * unchanged — so any unroll ≥ the measured depth (3 phases, 4 layers,
    * 2 augment steps at the gate SFs) compares equal. */
  def maxMatchSql(phases: Int = 5, layers: Int = 8, augSteps: Int = 5,
                  greedyRounds: Int = 20): String = {
    val head =
      s"""WITH be AS MATERIALIZED (
         |  SELECT DISTINCT CAST(l_orderkey % 157 AS BIGINT) AS r,
         |         CAST(l_partkey % 211 AS BIGINT) AS c
         |  FROM lineitem
         |  WHERE (CAST(l_orderkey AS BIGINT)*7 + CAST(l_partkey AS BIGINT)*13) % 97 < 2),
         |allc AS MATERIALIZED (SELECT DISTINCT c FROM be),
         |gm0 AS (SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS c WHERE 1=0),
         |ga0 AS (SELECT * FROM be)""".stripMargin
    val greedy = (1 to greedyRounds).map { i =>
      val (ap, mp) = (s"ga${i - 1}", s"gm${i - 1}")
      s"""gacc$i AS MATERIALIZED (
         |  SELECT min(r) AS r, c FROM (
         |    SELECT r, min(c) AS c FROM $ap GROUP BY r) GROUP BY c),
         |gm$i AS MATERIALIZED (SELECT * FROM $mp UNION ALL SELECT r, c FROM gacc$i),
         |ga$i AS MATERIALIZED (
         |  SELECT * FROM $ap
         |  WHERE r NOT IN (SELECT r FROM gacc$i)
         |    AND c NOT IN (SELECT c FROM gacc$i))""".stripMargin
    }
    val phaseCtes = (1 to phases).flatMap { p =>
      val m0 = if (p == 1) s"gm$greedyRounds" else s"mm${p - 1}_$augSteps"
      val search =
        s"""f${p}_0 AS MATERIALIZED (
           |  SELECT c, c AS root FROM allc WHERE c NOT IN (SELECT c FROM $m0)),
           |pa${p}_0 AS (SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS pc,
           |             CAST(0 AS BIGINT) AS root WHERE 1=0),
           |lv${p}_0 AS (SELECT CAST(0 AS BIGINT) AS root, CAST(0 AS BIGINT) AS leaf WHERE 1=0)""".stripMargin +:
          (1 to layers).map { l =>
            s"""nr${p}_$l AS MATERIALIZED (
               |  SELECT r, pc, root FROM (
               |    SELECT e.r, f.c AS pc, f.root,
               |           row_number() OVER (PARTITION BY e.r ORDER BY f.c, f.root) AS rn
               |    FROM be e JOIN f${p}_${l - 1} f ON e.c = f.c
               |    WHERE e.r NOT IN (SELECT r FROM pa${p}_${l - 1})) WHERE rn = 1),
               |pa${p}_$l AS MATERIALIZED (
               |  SELECT * FROM pa${p}_${l - 1} UNION ALL SELECT * FROM nr${p}_$l),
               |nl${p}_$l AS MATERIALIZED (
               |  SELECT root, min(r) AS leaf FROM nr${p}_$l
               |  WHERE r NOT IN (SELECT r FROM $m0)
               |    AND root NOT IN (SELECT root FROM lv${p}_${l - 1})
               |  GROUP BY root),
               |lv${p}_$l AS MATERIALIZED (
               |  SELECT * FROM lv${p}_${l - 1} UNION ALL SELECT * FROM nl${p}_$l),
               |f${p}_$l AS MATERIALIZED (
               |  SELECT m.c AS c, min(nr.root) AS root
               |  FROM nr${p}_$l nr JOIN $m0 m ON m.r = nr.r
               |  WHERE nr.root NOT IN (SELECT root FROM lv${p}_$l)
               |  GROUP BY m.c)""".stripMargin
          }
      val augment =
        s"""ag${p}_0 AS MATERIALIZED (SELECT leaf AS r FROM lv${p}_$layers),
           |mm${p}_0 AS MATERIALIZED (SELECT * FROM $m0)""".stripMargin +:
          (1 to augSteps).map { a =>
            s"""pr${p}_$a AS MATERIALIZED (
               |  SELECT ag.r, pa.pc FROM ag${p}_${a - 1} ag
               |  JOIN pa${p}_$layers pa ON pa.r = ag.r),
               |ag${p}_$a AS MATERIALIZED (
               |  SELECT m.r FROM pr${p}_$a pr JOIN mm${p}_${a - 1} m ON m.c = pr.pc),
               |mm${p}_$a AS MATERIALIZED (
               |  SELECT r, c FROM mm${p}_${a - 1}
               |  WHERE r NOT IN (SELECT r FROM pr${p}_$a)
               |    AND c NOT IN (SELECT pc FROM pr${p}_$a)
               |  UNION ALL SELECT r, pc AS c FROM pr${p}_$a)""".stripMargin
          }
      search ++ augment
    }
    ((head +: greedy) ++ phaseCtes).mkString(",\n") +
      s"\nSELECT r, c FROM mm${phases}_$augSteps ORDER BY r, c"
  }

  /** Unrolled weight-increasing 4-cycle exchange
    * ([[graft.kernels.WeightedCycleMatching]], the AWPM family): greedy
    * init over a dense-enough contested graph, then `rounds` rounds of
    * {candidate cycles (closing-edge join) → per-column arg-max over both
    * roles → win-both handshake → apply}. Weights are integral doubles
    * derived from ids, so gains and comparisons are exact; rounds past the
    * fixpoint find no positive-gain cycle and are no-ops, so any unroll ≥
    * the measured depth (6 at sf0.1, 2 at sf0.01) compares equal — 10
    * mirrors the reference's own iteration cap. */
  def cycleMatchSql(rounds: Int = 10, greedyRounds: Int = 20): String = {
    val head =
      s"""WITH be AS MATERIALIZED (
         |  SELECT r, c, CAST((r*31 + c*17) % 100 + 1 AS DOUBLE) AS w FROM (
         |    SELECT DISTINCT CAST(l_orderkey % 61 AS BIGINT) AS r,
         |           CAST(l_partkey % 67 AS BIGINT) AS c
         |    FROM lineitem
         |    WHERE (CAST(l_orderkey AS BIGINT)*7 + CAST(l_partkey AS BIGINT)*13) % 97 < 2)),
         |m0g AS (SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS c WHERE 1=0),
         |a0g AS (SELECT r, c FROM be)""".stripMargin
    val greedy = (1 to greedyRounds).map { i =>
      val (ap, mp) = (s"a${i - 1}g", s"m${i - 1}g")
      s"""acc${i}g AS MATERIALIZED (
         |  SELECT min(r) AS r, c FROM (
         |    SELECT r, min(c) AS c FROM $ap GROUP BY r) GROUP BY c),
         |m${i}g AS MATERIALIZED (SELECT * FROM $mp UNION ALL SELECT r, c FROM acc${i}g),
         |a${i}g AS MATERIALIZED (
         |  SELECT * FROM $ap
         |  WHERE r NOT IN (SELECT r FROM acc${i}g)
         |    AND c NOT IN (SELECT c FROM acc${i}g))""".stripMargin
    }
    val cycles = (0 until rounds).map { k =>
      val m = if (k == 0) s"m${greedyRounds}g" else s"cm$k"
      s"""mw$k AS MATERIALIZED (
         |  SELECT m.r, m.c, e.w FROM $m m JOIN be e ON e.r = m.r AND e.c = m.c),
         |cand$k AS MATERIALIZED (
         |  SELECT e.r AS i, e.c AS j, mr.c AS ji, mc.r AS mj,
         |         e.w + e2.w - mr.w - mc.w AS gain
         |  FROM be e
         |  JOIN mw$k mr ON mr.r = e.r
         |  JOIN mw$k mc ON mc.c = e.c
         |  JOIN be e2 ON e2.r = mc.r AND e2.c = mr.c
         |  WHERE e.c <> mr.c AND e.w + e2.w - mr.w - mc.w > 0),
         |best$k AS MATERIALIZED (
         |  SELECT i, j, ji, mj FROM (
         |    SELECT i, j, ji, mj,
         |           row_number() OVER (PARTITION BY colKey
         |                              ORDER BY gain DESC, i, j) AS rn
         |    FROM (SELECT j AS colKey, i, j, ji, mj, gain FROM cand$k
         |          UNION ALL
         |          SELECT ji AS colKey, i, j, ji, mj, gain FROM cand$k))
         |  WHERE rn = 1),
         |win$k AS MATERIALIZED (
         |  SELECT i, j, ji, mj FROM best$k GROUP BY i, j, ji, mj
         |  HAVING count(*) = 2),
         |cm${k + 1} AS MATERIALIZED (
         |  SELECT r, c FROM $m mm
         |  WHERE NOT EXISTS (SELECT 1 FROM win$k w
         |                    WHERE (w.i = mm.r AND w.ji = mm.c)
         |                       OR (w.mj = mm.r AND w.j = mm.c))
         |  UNION ALL SELECT i AS r, j AS c FROM win$k
         |  UNION ALL SELECT mj AS r, ji AS c FROM win$k)""".stripMargin
    }
    ((head +: greedy) ++ cycles).mkString(",\n") +
      s"\nSELECT r, c FROM cm$rounds ORDER BY r, c"
  }

  /** Cuthill-McKee level-set ordering, reversed: BFS levels from the
    * George-Liu pseudo-peripheral root (double sweep — BFS from the
    * (degree, id)-min vertex, then restart from the farthest vertex with
    * (dist desc, deg asc, id asc) pinned tiebreaks), ranked by
    * (level, degree, id). Mirrors [[graft.kernels.RCM]] exactly. */
  def rcmSql(maxDepth: Int = 50): String =
    s"""WITH RECURSIVE $edgesCte,
       |deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
       |rt0 AS MATERIALIZED (SELECT v FROM deg ORDER BY deg ASC, v ASC LIMIT 1),
       |bfs0(v, d) AS (
       |  SELECT CAST((SELECT v FROM rt0) AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs0 b JOIN edges e ON e.src = b.v
       |  WHERE b.d < $maxDepth),
       |lvl0 AS MATERIALIZED (SELECT v, min(d) AS dist FROM bfs0 GROUP BY v),
       |rt AS MATERIALIZED (
       |  SELECT l.v FROM lvl0 l JOIN deg dg ON dg.v = l.v
       |  ORDER BY l.dist DESC, dg.deg ASC, l.v ASC LIMIT 1),
       |bfs(v, d) AS (
       |  SELECT CAST((SELECT v FROM rt) AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN edges e ON e.src = b.v
       |  WHERE b.d < $maxDepth),
       |lvl AS MATERIALIZED (SELECT v, min(d) AS dist FROM bfs GROUP BY v),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM lvl)
       |SELECT l.v AS vid,
       |       CAST((SELECT n FROM nn)
       |            - row_number() OVER (ORDER BY l.dist ASC, dg.deg ASC, l.v ASC)
       |         AS BIGINT) AS rcm
       |FROM lvl l JOIN deg dg ON dg.v = l.v
       |ORDER BY vid""".stripMargin

  /** Unrolled synchronous auction rounds mirroring
    * [[graft.kernels.AuctionMatching]] term-for-term: integral prices,
    * ε = 1, (value desc, c asc) bid tiebreak, (bid desc, r asc) accept
    * tiebreak, second-best fallback best − big. */
  def auctionSql(rounds: Int = 20, big: Long = 1000000L): String = {
    val head =
      s"""WITH be AS MATERIALIZED (
         |  SELECT r, c, max(w) AS w FROM (
         |    SELECT CAST(l_orderkey AS BIGINT) AS r, CAST(l_partkey AS BIGINT) AS c,
         |           CAST(l_quantity AS BIGINT) AS w FROM lineitem) t
         |  GROUP BY r, c),
         |p0 AS MATERIALIZED (SELECT DISTINCT c, CAST(0 AS BIGINT) AS p FROM be),
         |a0 AS (SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS c WHERE 1=0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val (ap, pp) = (s"a${i - 1}", s"p${i - 1}")
      s"""rk$i AS MATERIALIZED (
         |  SELECT u.r, u.c, p.p, u.w - p.p AS v,
         |         row_number() OVER (PARTITION BY u.r
         |                            ORDER BY u.w - p.p DESC, u.c ASC) AS rn
         |  FROM be u JOIN $pp p ON p.c = u.c
         |  WHERE u.r NOT IN (SELECT r FROM $ap)),
         |bid$i AS MATERIALIZED (
         |  SELECT b.r, b.c, b.p + (b.v - COALESCE(s.v, b.v - $big)) + 1 AS bid
         |  FROM (SELECT * FROM rk$i WHERE rn = 1) b
         |  LEFT JOIN (SELECT r, v FROM rk$i WHERE rn = 2) s ON s.r = b.r),
         |win$i AS MATERIALIZED (
         |  SELECT r, c, bid FROM (
         |    SELECT r, c, bid,
         |           row_number() OVER (PARTITION BY c ORDER BY bid DESC, r ASC) AS wrn
         |    FROM bid$i) t WHERE wrn = 1),
         |a$i AS MATERIALIZED (
         |  SELECT r, c FROM $ap WHERE c NOT IN (SELECT c FROM win$i)
         |  UNION ALL SELECT r, c FROM win$i),
         |p$i AS MATERIALIZED (
         |  SELECT c, p FROM $pp WHERE c NOT IN (SELECT c FROM win$i)
         |  UNION ALL SELECT c, bid AS p FROM win$i)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT a.r, a.c, be.w FROM a$rounds a JOIN be ON be.r = a.r AND be.c = a.c ORDER BY a.r"
  }

  /** Independent re-derivation of the pages→extract→dictionary→edges
    * ingest pipeline ([[graft.graph.WebGraph.build]]): DuckDB re-extracts
    * the anchors with regexp_extract_all over the html dumped by Verify
    * (same regex as graft.pages.Extract:28), rebuilds the rank-based url
    * dictionary (same rule as [[graft.graph.Dictionary.encode]] /
    * OpOracles.dictPartsSql), and re-derives the deduped loop-free edge
    * set. @param pagesDir directory of the pages parquet dump (url,
    * html-as-string) written by graft.Verify. */
  def ingestLinkGraphSql(pagesDir: String): String =
    s"""WITH pages AS MATERIALIZED (
       |  SELECT url, html FROM read_parquet('$pagesDir/*.parquet')),
       |links AS MATERIALIZED (
       |  SELECT url AS srcUrl,
       |         unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS dstUrl
       |  FROM pages),
       |allurls AS MATERIALIZED (
       |  SELECT DISTINCT url FROM (
       |    SELECT url FROM pages UNION ALL SELECT dstUrl AS url FROM links) u),
       |dict AS MATERIALIZED (
       |  SELECT url, CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
       |  FROM allurls)
       |SELECT DISTINCT s.vid AS src, d.vid AS dst
       |FROM links l
       |JOIN dict s ON s.url = l.srcUrl
       |JOIN dict d ON d.url = l.dstUrl
       |WHERE s.vid <> d.vid
       |ORDER BY src, dst""".stripMargin

  /** The input_hint per-row invariant, independently re-derived: DuckDB
    * re-runs the text extraction ([[graft.pages.Extract.extractText]] —
    * concatenated lazy `<p>…</p>` group matches, newline-joined) over the
    * html dumped by Verify. Compared byte-identically against the Spark
    * extractor's output. */
  def ingestTextSql(pagesDir: String): String =
    s"""SELECT url,
       |       coalesce(list_aggr(regexp_extract_all(html, '<p>(.*?)</p>', 1),
       |                          'string_agg', chr(10)), '') AS extracted
       |FROM read_parquet('$pagesDir/*.parquet')
       |ORDER BY url""".stripMargin

  /** Unrolled level-synchronous BFS carrying min-parent per level —
    * mirrors [[graft.kernels.BFS.parents]] exactly (parent(v) = min
    * neighbor in the previous fringe; parent(root) = root). Levels ≥ the
    * graph's eccentricity from the root are no-ops, so any `levels` ≥ the
    * kernel's maxDepth compares equal. */
  def bfsParentsSql(levels: Int = 10): String = {
    val head =
      s"""WITH $edgesCte,
         |f0 AS MATERIALIZED (
         |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT) AS v,
         |         CAST((SELECT min(v) FROM verts) AS BIGINT) AS parent,
         |         CAST(0 AS BIGINT) AS dist),
         |vis0 AS (SELECT v FROM f0)""".stripMargin
    val steps = (1 to levels).map { l =>
      s"""f$l AS MATERIALIZED (
         |  SELECT e.dst AS v, CAST(min(e.src) AS BIGINT) AS parent,
         |         CAST($l AS BIGINT) AS dist
         |  FROM f${l - 1} f JOIN edges e ON e.src = f.v
         |  LEFT JOIN vis${l - 1} x ON x.v = e.dst
         |  WHERE x.v IS NULL
         |  GROUP BY e.dst),
         |vis$l AS MATERIALIZED (
         |  SELECT v FROM vis${l - 1} UNION ALL SELECT v FROM f$l)""".stripMargin
    }
    val unionAll = (0 to levels).map(l => s"SELECT v, parent, dist FROM f$l")
      .mkString("\n  UNION ALL ")
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, parent, dist FROM (\n  $unionAll) t ORDER BY vid"
  }

  /** Seeded random-parent BFS ([[graft.kernels.BFS.parents]] with a seed —
    * the RandomParentBFS analog): per level each newly reached vertex
    * takes the discoverer with minimal md5(seed:src), exactly the kernel's
    * struct-min; md5 hex is engine-identical so the pick is hash-exact. */
  def bfsParentsRandSql(seed: Long, levels: Int = 10): String = {
    val head =
      s"""WITH $edgesCte,
         |f0 AS MATERIALIZED (
         |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT) AS v,
         |         CAST((SELECT min(v) FROM verts) AS BIGINT) AS parent,
         |         CAST(0 AS BIGINT) AS dist),
         |vis0 AS (SELECT v FROM f0)""".stripMargin
    val steps = (1 to levels).map { l =>
      s"""f$l AS MATERIALIZED (
         |  SELECT v, parent, dist FROM (
         |    SELECT e.dst AS v, CAST(e.src AS BIGINT) AS parent,
         |           CAST($l AS BIGINT) AS dist,
         |           row_number() OVER (PARTITION BY e.dst
         |             ORDER BY md5('$seed:' || CAST(e.src AS VARCHAR)), e.src) AS rn
         |    FROM f${l - 1} f JOIN edges e ON e.src = f.v
         |    LEFT JOIN vis${l - 1} x ON x.v = e.dst
         |    WHERE x.v IS NULL)
         |  WHERE rn = 1),
         |vis$l AS MATERIALIZED (
         |  SELECT v FROM vis${l - 1} UNION ALL SELECT v FROM f$l)""".stripMargin
    }
    val unionAll = (0 to levels).map(l => s"SELECT v, parent, dist FROM f$l")
      .mkString("\n  UNION ALL ")
    (head +: steps).mkString(",\n") +
      s"\nSELECT v AS vid, parent, dist FROM (\n  $unionAll) t ORDER BY vid"
  }

  /** BFS over the predicate-filtered edge set (reference FilteredBFS.cpp:
    * the traversal applies the edge filter on the fly; in Spark the same
    * composition pushes the predicate beneath the SpMSpV join — no
    * filtered matrix is materialized in either engine). */
  def filteredBfsSql(minW: Double = 2.0, maxDepth: Int = 10): String =
    s"""WITH RECURSIVE $edgesCte,
       |${OpOracles.wedgesCte},
       |fedges AS MATERIALIZED (
       |  SELECT src, dst FROM wedges WHERE w >= ${dbl(minW)}),
       |bfs(v, d) AS (
       |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN fedges e ON e.src = b.v
       |  WHERE b.d < $maxDepth
       |)
       |SELECT v AS vid, CAST(min(d) AS BIGINT) AS dist
       |FROM bfs GROUP BY v ORDER BY vid""".stripMargin

  def bfsSql(maxDepth: Int = 10): String =
    s"""WITH RECURSIVE $edgesCte,
       |bfs(v, d) AS (
       |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN edges e ON e.src = b.v
       |  WHERE b.d < $maxDepth
       |)
       |SELECT v AS vid, CAST(min(d) AS BIGINT) AS dist
       |FROM bfs GROUP BY v ORDER BY vid""".stripMargin

  /** Per-component induced-subgraph stats
    * ([[graft.operators.MatrixOps.inducedSubgraphStats]]): CC labels by
    * recursive min-label, then per component its vertex count, induced
    * edge count, and distinct-source count. */
  def inducedStatsSql(minW: Double = 2.0): String =
    s"""WITH RECURSIVE $edgesCte,
       |${OpOracles.wedgesCte},
       |fedges AS MATERIALIZED (
       |  SELECT src, dst FROM wedges WHERE w >= ${dbl(minW)}),
       |comp(v, l) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT e.dst, c.l FROM comp c JOIN fedges e ON e.src = c.v
       |),
       |cc AS MATERIALIZED (
       |  SELECT v, CAST(min(l) AS BIGINT) AS component FROM comp GROUP BY v),
       |ie AS (SELECT c1.component, e.src FROM fedges e
       |       JOIN cc c1 ON c1.v = e.src JOIN cc c2 ON c2.v = e.dst
       |       WHERE c1.component = c2.component)
       |SELECT s.component, s.nrows,
       |       COALESCE(t.nnz, CAST(0 AS BIGINT)) AS nnz,
       |       COALESCE(t.nsrc, CAST(0 AS BIGINT)) AS nsrc
       |FROM (SELECT component, CAST(count(*) AS BIGINT) AS nrows
       |      FROM cc GROUP BY component) s
       |LEFT JOIN (SELECT component, CAST(count(*) AS BIGINT) AS nnz,
       |                  CAST(count(DISTINCT src) AS BIGINT) AS nsrc
       |           FROM ie GROUP BY component) t USING (component)
       |ORDER BY component""".stripMargin

  /** Dictionary-decoded component output (reference
    * Applications/WriteMCLClusters.h: clusters written under their string
    * labels): re-derive the ingest dictionary + edges from the pages dump,
    * symmetrize, CC, then decode BOTH directions — each url and its
    * component representative's url. */
  def ccLabeledSql(pagesDir: String): String =
    s"""WITH RECURSIVE pages AS MATERIALIZED (
       |  SELECT url, html FROM read_parquet('$pagesDir/*.parquet')),
       |links AS MATERIALIZED (
       |  SELECT url AS srcUrl,
       |         unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS dstUrl
       |  FROM pages),
       |allurls AS MATERIALIZED (
       |  SELECT DISTINCT url FROM (
       |    SELECT url FROM pages UNION ALL SELECT dstUrl AS url FROM links) u),
       |dict AS MATERIALIZED (
       |  SELECT url, CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
       |  FROM allurls),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT s.vid AS src, d.vid AS dst
       |  FROM links l JOIN dict s ON s.url = l.srcUrl
       |               JOIN dict d ON d.url = l.dstUrl
       |  WHERE s.vid <> d.vid),
       |sedges AS MATERIALIZED (
       |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |comp(v, l) AS (
       |  SELECT vid, vid FROM dict
       |  UNION
       |  SELECT e.dst, c.l FROM comp c JOIN sedges e ON e.src = c.v
       |),
       |cm AS (SELECT v, CAST(min(l) AS BIGINT) AS component FROM comp GROUP BY v)
       |SELECT dv.url AS url, dc.url AS cluster_url
       |FROM cm JOIN dict dv ON dv.vid = cm.v
       |        JOIN dict dc ON dc.vid = cm.component
       |ORDER BY url""".stripMargin

  /** Single-child BFS (reference Applications/SingleChildBFS.cpp:273-285):
    * per level, after the SelectMax SpMV assigns each newly discovered
    * vertex its MAX discoverer as parent, `fringe.Uniq(RandReduce)` keeps
    * ONE child per parent — the "single child frontier". The kernel pins
    * the reference's random pick to argmin md5(seed:child) (the same
    * engine-replayable trick as RandomParentBFS), so the oracle replays
    * it exactly: unrolled max-parent BFS, then per (parent, dist) the
    * md5-minimal child. */
  def bfsSingleSql(seed: Long, levels: Int = 10): String = {
    val head =
      s"""WITH $edgesCte,
         |f0 AS MATERIALIZED (
         |  SELECT CAST((SELECT min(v) FROM verts) AS BIGINT) AS v,
         |         CAST((SELECT min(v) FROM verts) AS BIGINT) AS parent,
         |         CAST(0 AS BIGINT) AS dist),
         |vis0 AS (SELECT v FROM f0)""".stripMargin
    val steps = (1 to levels).map { l =>
      s"""f$l AS MATERIALIZED (
         |  SELECT e.dst AS v, CAST(max(e.src) AS BIGINT) AS parent,
         |         CAST($l AS BIGINT) AS dist
         |  FROM f${l - 1} f JOIN edges e ON e.src = f.v
         |  LEFT JOIN vis${l - 1} x ON x.v = e.dst
         |  WHERE x.v IS NULL
         |  GROUP BY e.dst),
         |vis$l AS MATERIALIZED (
         |  SELECT v FROM vis${l - 1} UNION ALL SELECT v FROM f$l)""".stripMargin
    }
    val unionAll = (1 to levels).map(l => s"SELECT v, parent, dist FROM f$l")
      .mkString("\n  UNION ALL ")
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT parent, dist, child FROM (
         |  SELECT parent, dist, v AS child,
         |         row_number() OVER (PARTITION BY parent, dist
         |           ORDER BY md5('$seed:' || CAST(v AS VARCHAR)), v) AS rn
         |  FROM (
         |  $unionAll) t) r
         |WHERE rn = 1 ORDER BY parent, dist""".stripMargin
  }

  /** FP-pinned MCL replay ([[graft.kernels.MarkovClustering.gateRun]]).
    * Every order-sensitive double reduction is `list_sum(list_sort(
    * list(...)))` — a sequential left fold over value-sorted operands,
    * bit-identical to Spark's `aggregate(array_sort(collect_list(...)))`;
    * inflation is w*w; divisions and comparisons are IEEE-exact given
    * identical operands, so prune/recover/select decisions and the final
    * attractor pattern match the kernel hash-exactly. */
  def mclSql(iters: Int = 3, thr: Double = 1e-4, selectTop: Int = 50,
             recoverNum: Int = 10, recoverPct: Double = 0.5): String = {
    val T = dbl(thr)
    val head =
      s"""WITH RECURSIVE $edgesCte,
         |${OpOracles.wedgesCte},
         |init AS (
         |  SELECT src, dst, w FROM wedges
         |  UNION ALL SELECT v, v, ${dbl(1.0)} FROM verts),
         |ics AS (SELECT dst, list_sum(list_sort(list(w))) AS csum
         |        FROM init GROUP BY dst),
         |a0 AS MATERIALIZED (
         |  SELECT m.src, m.dst, m.w / c.csum AS w
         |  FROM init m JOIN ics c ON m.dst = c.dst)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"a${i - 1}"
      s"""infl$i AS MATERIALIZED (
         |  SELECT src, dst, w*w AS w FROM (
         |    SELECT l.src AS src, r.dst AS dst,
         |           list_sum(list_sort(list(l.w * r.w))) AS w
         |    FROM $p l JOIN $p r ON l.dst = r.src
         |    GROUP BY l.src, r.dst)),
         |ncs$i AS (SELECT dst, list_sum(list_sort(list(w))) AS csum
         |          FROM infl$i GROUP BY dst),
         |rank$i AS MATERIALIZED (
         |  SELECT src, dst, w,
         |         row_number() OVER (PARTITION BY dst
         |                            ORDER BY w DESC, src ASC) AS rn
         |  FROM (SELECT m.src, m.dst, m.w / c.csum AS w
         |        FROM infl$i m JOIN ncs$i c ON m.dst = c.dst)),
         |stat$i AS (
         |  SELECT dst, count(*) AS allnnz,
         |         count(*) FILTER (WHERE w > $T) AS keptnnz,
         |         COALESCE(list_sum(list_sort(list(w) FILTER (WHERE w > $T))),
         |                  ${dbl(0.0)}) AS keptsum
         |  FROM rank$i GROUP BY dst),
         |mode$i AS (
         |  SELECT dst,
         |    (keptnnz < $recoverNum AND allnnz > keptnnz
         |     AND keptsum < ${dbl(recoverPct)}) AS dorecover,
         |    (NOT (keptnnz < $recoverNum AND allnnz > keptnnz
         |          AND keptsum < ${dbl(recoverPct)})
         |     AND keptnnz > $selectTop) AS doselect
         |  FROM stat$i),
         |trec$i AS (SELECT dst, w AS thrrec FROM rank$i WHERE rn = $recoverNum),
         |tsel$i AS (SELECT dst, w AS thrsel FROM rank$i WHERE rn = $selectTop),
         |pr$i AS MATERIALIZED (
         |  SELECT k.src, k.dst, k.w
         |  FROM rank$i k JOIN mode$i m ON k.dst = m.dst
         |  LEFT JOIN trec$i tr ON k.dst = tr.dst
         |  LEFT JOIN tsel$i ts ON k.dst = ts.dst
         |  WHERE CASE
         |    WHEN m.dorecover THEN k.w >= COALESCE(tr.thrrec, CAST('-inf' AS DOUBLE))
         |    WHEN m.doselect THEN k.w >= ts.thrsel
         |    ELSE k.w > $T END),
         |pcs$i AS (SELECT dst, list_sum(list_sort(list(w))) AS csum
         |          FROM pr$i GROUP BY dst),
         |a$i AS MATERIALIZED (
         |  SELECT m.src, m.dst, m.w / c.csum AS w
         |  FROM pr$i m JOIN pcs$i c ON m.dst = c.dst)""".stripMargin
    }
    val tailCtes =
      s"""pat AS (SELECT src, dst FROM a$iters WHERE w > ${dbl(1e-9)}),
         |spat AS MATERIALIZED (
         |  SELECT src, dst FROM pat UNION SELECT dst, src FROM pat),
         |comp(v, l) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT e.dst, c.l FROM comp c JOIN spat e ON e.src = c.v
         |)""".stripMargin
    ((head +: steps) :+ tailCtes).mkString(",\n") +
      "\nSELECT v AS vid, CAST(min(l) AS BIGINT) AS cluster" +
      "\nFROM comp GROUP BY v ORDER BY vid"
  }
}
