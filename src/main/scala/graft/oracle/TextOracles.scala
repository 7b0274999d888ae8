package graft.oracle

/** DuckDB oracles for the text / dedup / similarity / events operators.
  * Tokenization matches graft.text.TextOps (split on a single literal
  * space, empty tokens kept). All hashes are md5 hex — engine-neutral. */
object TextOracles {

  def textTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE)
      |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  def textQualitySql: String =
    """SELECT doc_id, n_tokens, n_stop,
      |  CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CASE WHEN n_tokens < 20 THEN 'short'
      |       WHEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) < CAST('0.01' AS DOUBLE) THEN 'low_stop'
      |       ELSE 'ok' END AS quality
      |FROM (SELECT doc_id,
      |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |        CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS BIGINT) AS n_stop
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  def textLangIdSql: String =
    """SELECT doc_id, lang AS declared_lang,
      |  CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CASE WHEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= CAST('0.02' AS DOUBLE)
      |       THEN 'en' ELSE 'other' END AS predicted_lang
      |FROM (SELECT doc_id, lang,
      |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |        CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS BIGINT) AS n_stop
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  def bpeTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  def fingerprintSql: String =
    "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"

  /** The corpus-cleaning composition: predicted-en + quality-ok filters,
    * exact dedup among survivors, per-declared-lang stats. Mirrors
    * `quality`/`langId` thresholds term for term (ok ⟺ ¬short ∧
    * ¬low_stop; en ⟺ stop_ratio ≥ 0.02); counts/sums of BIGINTs are
    * exact. */
  def corpusCleanSql: String =
    """WITH flt AS MATERIALIZED (
      |  SELECT doc_id, text, lang AS declared_lang,
      |         CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS BIGINT) AS n_stop,
      |         CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents),
      |kept AS MATERIALIZED (
      |  SELECT * FROM flt
      |  WHERE NOT (n_tokens < 20)
      |    AND NOT (CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) < CAST('0.01' AS DOUBLE))
      |    AND CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= CAST('0.02' AS DOUBLE)),
      |reps AS MATERIALIZED (
      |  SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM kept GROUP BY md5(text))
      |SELECT declared_lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM kept JOIN reps USING (doc_id)
      |GROUP BY declared_lang ORDER BY declared_lang""".stripMargin

  def dedupExactSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin

  /** Char-5-shingle CTE + 8 minhash signatures (shared prelude). */
  private val sigCte: String = {
    val mins = (0 until 8).map(j => s"min(md5('$j'||s)) AS sig$j").mkString(", ")
    s"""sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest([substr(text, i, 5) for i in range(1, length(text)-3)]) AS s
       |  FROM documents WHERE length(text) >= 5),
       |sig AS MATERIALIZED (SELECT doc_id, $mins FROM sh GROUP BY doc_id)""".stripMargin
  }

  def minhashSql: String =
    s"WITH $sigCte\nSELECT * FROM sig ORDER BY doc_id"

  def lshPairsSql(bucketCap: Int = 1000): String = {
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(sig${2 * b}||sig${2 * b + 1}) AS bucket FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH $sigCte,
       |b0 AS MATERIALIZED (
       |  $bands),
       |b AS MATERIALIZED (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT doc_id, band, bucket,
       |           row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
       |    FROM b0) WHERE rn <= $bucketCap)
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |ORDER BY a, b""".stripMargin
  }

  def ngramJaccardSql(n: Int = 3, minJaccard: String = "0.05",
                      maxDf: Long = Long.MaxValue): String = {
    val dfPrune =
      if (maxDf == Long.MaxValue) ""
      else s"""g AS MATERIALIZED (
              |  SELECT g0.* FROM g0
              |  JOIN (SELECT g FROM g0 GROUP BY g HAVING count(*) <= $maxDf) keep
              |  USING (g)),
              |""".stripMargin
    val firstName = if (maxDf == Long.MaxValue) "g" else "g0"
    s"""WITH $firstName AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, g FROM (
       |    SELECT doc_id,
       |           unnest([list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')
       |                   for i in range(1, len(toks)-${n - 2})]) AS g
       |    FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)) t
       |  WHERE g IS NOT NULL),
       |${dfPrune}sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
       |inter AS MATERIALIZED (
       |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
       |  FROM g x JOIN g y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT a, b, inter,
       |       CAST(inter AS DOUBLE)/CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
       |WHERE CAST(inter AS DOUBLE)/CAST(sa.sz + sb.sz - inter AS DOUBLE) >= CAST('$minJaccard' AS DOUBLE)
       |ORDER BY a, b""".stripMargin
  }

  def annMultiTableSql(nQueries: Int = 20, k: Int = 5, bits: Int = 16,
                       tables: Int = 4, bucketCap: Int = 1000): String = {
    val tableSelects = (0 until tables).map { t =>
      val bucket = (0 until bits)
        .map(i => s"(CASE WHEN embedding[${t * bits + i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, $t AS tbl, CAST($bucket AS BIGINT) AS bucket FROM embeddings"
    }.mkString("\n  UNION ALL ")
    s"""WITH allb AS MATERIALIZED (
       |  $tableSelects),
       |capped AS MATERIALIZED (
       |  SELECT vec_id, tbl, bucket FROM (
       |    SELECT vec_id, tbl, bucket,
       |           row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS rn
       |    FROM allb) WHERE rn <= $bucketCap),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM capped q JOIN capped c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |   AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       |$annBase,
       |scored AS MATERIALIZED (
       |  SELECT p.qid, p.nid,
       |         list_dot_product(q.e, c.e)/(q.norm*c.norm) AS cos
       |  FROM pairs p JOIN base q ON q.vec_id = p.qid
       |               JOIN base c ON c.vec_id = p.nid)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
       |  FROM scored) WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** Mirrors [[graft.sim.Ann.randomHyperplaneTopK]]: the SAME
    * driver-generated Gaussian-ish hyperplanes ([[graft.sim.Ann
    * .gaussianHyperplanes]] — single source of truth) are rendered as SQL
    * list literals (Double.toString is shortest-round-trip, and DuckDB's
    * decimal→double parse is correctly rounded, so the literals are
    * bit-identical), and each bucket bit is the sign of list_dot_product —
    * the same left-fold the Spark side computes, so the sign boundary is
    * exact. */
  def annRandomHyperplaneSql(nQueries: Int, k: Int, bits: Int, tables: Int,
                             bucketCap: Int, dim: Int,
                             seed: String): String = {
    val hp = graft.sim.Ann.gaussianHyperplanes(seed, tables, bits, dim)
    val tableSelects = (0 until tables).map { t =>
      val bucket = (0 until bits).map { i =>
        val lits = hp(t)(i).map(v => s"CAST('$v' AS DOUBLE)").mkString(", ")
        s"(CASE WHEN list_dot_product(embedding::DOUBLE[], [$lits]) >= 0 " +
          s"THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, CAST($bucket AS BIGINT) AS bucket FROM embeddings"
    }.mkString("\n  UNION ALL ")
    s"""WITH allb AS MATERIALIZED (
       |  $tableSelects),
       |capped AS MATERIALIZED (
       |  SELECT vec_id, tbl, bucket FROM (
       |    SELECT vec_id, tbl, bucket,
       |           row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS rn
       |    FROM allb) WHERE rn <= $bucketCap),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM capped q JOIN capped c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |   AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       |$annBase,
       |scored AS MATERIALIZED (
       |  SELECT p.qid, p.nid,
       |         list_dot_product(q.e, c.e)/(q.norm*c.norm) AS cos
       |  FROM pairs p JOIN base q ON q.vec_id = p.qid
       |               JOIN base c ON c.vec_id = p.nid)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
       |  FROM scored) WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** Mirrors [[graft.sim.Ann.ivfTopK]] step for step: seeded md5 centroid
    * sample → nearest-cell assignment (cos desc, cid asc) → nProbe probed
    * cells per query → exact cosine rank within candidates. All FP is the
    * same left-fold dot product, so every boundary is exact. */
  def annIvfSql(nQueries: Int = 20, k: Int = 5, nCells: Int = 16,
                nProbe: Int = 4, seed: String = "ivf"): String =
    s"""WITH $annBase,
       |cents AS MATERIALIZED (
       |  SELECT vec_id AS cid, e AS ce, norm AS cn FROM (
       |    SELECT vec_id, e, norm,
       |           md5('$seed:' || CAST(vec_id AS VARCHAR)) AS pri FROM base)
       |  ORDER BY pri, vec_id LIMIT $nCells),
       |scoredc AS MATERIALIZED (
       |  SELECT b.vec_id, c.cid,
       |         list_dot_product(b.e, c.ce)/(b.norm*c.cn) AS cos
       |  FROM base b CROSS JOIN cents c),
       |assign AS MATERIALIZED (
       |  SELECT vec_id AS nid, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
       |    FROM scoredc) WHERE rn = 1),
       |probes AS MATERIALIZED (
       |  SELECT vec_id AS qid, CAST(cid AS BIGINT) AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
       |    FROM scoredc WHERE vec_id < $nQueries) WHERE rn <= $nProbe),
       |cand AS MATERIALIZED (
       |  SELECT p.qid, a.nid FROM probes p
       |  JOIN assign a ON p.cell = a.cell AND p.qid <> a.nid),
       |scored AS MATERIALIZED (
       |  SELECT p.qid, p.nid,
       |         list_dot_product(q.e, c.e)/(q.norm*c.norm) AS cos
       |  FROM cand p JOIN base q ON q.vec_id = p.qid
       |              JOIN base c ON c.vec_id = p.nid)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
       |  FROM scored) WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** Mirrors [[graft.sim.Ann.embedNearDup]]: the multi-table capped LSH
    * banding of [[annMultiTableSql]] with a < b, exact-cosine threshold. */
  def embedNearDupSql(minCos: Double, bits: Int = 16, tables: Int = 4,
                      bucketCap: Int = 1000): String = {
    val tableSelects = (0 until tables).map { t =>
      val bucket = (0 until bits)
        .map(i => s"(CASE WHEN embedding[${t * bits + i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, $t AS tbl, CAST($bucket AS BIGINT) AS bucket FROM embeddings"
    }.mkString("\n  UNION ALL ")
    s"""WITH allb AS MATERIALIZED (
       |  $tableSelects),
       |capped AS MATERIALIZED (
       |  SELECT vec_id, tbl, bucket FROM (
       |    SELECT vec_id, tbl, bucket,
       |           row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS rn
       |    FROM allb) WHERE rn <= $bucketCap),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT q.vec_id AS a, c.vec_id AS b
       |  FROM capped q JOIN capped c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |   AND q.vec_id < c.vec_id),
       |$annBase,
       |scored AS MATERIALIZED (
       |  SELECT p.a, p.b,
       |         list_dot_product(x.e, y.e)/(x.norm*y.norm) AS cos
       |  FROM pairs p JOIN base x ON x.vec_id = p.a
       |               JOIN base y ON y.vec_id = p.b)
       |SELECT a, b, cos FROM scored
       |WHERE cos >= CAST('$minCos' AS DOUBLE) ORDER BY a, b""".stripMargin
  }

  def simhashSql: String = {
    val sums = (0 until 32).map { j =>
      val nib = s"(strpos('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"sum(CASE WHEN ((($nib >> ${3 - j % 4}) & 1) = 1) THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n         ")
    val assemble = (0 until 32)
      .map(j => s"(CASE WHEN s$j > 0 THEN CAST(${1L << (31 - j)} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) t),
       |h AS MATERIALIZED (SELECT doc_id, md5(tok) AS h FROM toks),
       |sums AS MATERIALIZED (
       |  SELECT doc_id,
       |         $sums
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  private val annBase: String =
    """base AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS e,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings)""".stripMargin

  def annTopKSql(nQueries: Int = 20, k: Int = 5): String =
    s"""WITH $annBase,
       |scored AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         list_dot_product(q.e, c.e)/(q.norm*c.norm) AS cos
       |  FROM base q JOIN base c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
       |  FROM scored) WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  def embedNormsSql: String =
    s"WITH $annBase\nSELECT vec_id, norm FROM base ORDER BY vec_id"

  /** Int8 scalar quantization (graft.sim.Ann.quantizeInt8Stats): rounding
    * is floor(v + 0.5) — IEEE-exact in both engines, unlike round()'s
    * engine-varying tie rule — so codes, scale, and the integer stats are
    * hash-exact. */
  def embedQuantizeSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |m AS MATERIALIZED (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM ev),
      |s AS MATERIALIZED (
      |  SELECT vec_id, v,
      |         CASE WHEN mx = 0 THEN CAST('0' AS DOUBLE)
      |              ELSE mx/CAST('127' AS DOUBLE) END AS scale
      |  FROM m),
      |q AS MATERIALIZED (
      |  SELECT vec_id, scale,
      |         list_transform(v, x -> GREATEST(-127, LEAST(127,
      |           CAST(floor((CASE WHEN scale = 0 THEN CAST('0' AS DOUBLE)
      |                            ELSE x/scale END) + CAST('0.5' AS DOUBLE)) AS BIGINT)))) AS qs
      |  FROM s)
      |SELECT vec_id, scale,
      |       CAST(list_sum(qs) AS BIGINT) AS q_sum,
      |       CAST(list_sum(list_transform(qs, x -> abs(x))) AS BIGINT) AS q_abs_sum,
      |       CAST(len(list_filter(qs, x -> abs(x) = 127)) AS BIGINT) AS n_sat
      |FROM q ORDER BY vec_id""".stripMargin

  def annBucketsSql(bits: Int = 8): String = {
    val bucket = (0 until bits)
      .map(i => s"(CASE WHEN embedding[${i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM embeddings) t
       |GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  def annLshTopKSql(nQueries: Int = 20, k: Int = 5, bits: Int = 8): String = {
    val bucket = (0 until bits)
      .map(i => s"(CASE WHEN embedding[${i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS e,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
       |         CAST($bucket AS BIGINT) AS bucket
       |  FROM embeddings),
       |scored AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         list_dot_product(q.e, c.e)/(q.norm*c.norm) AS cos
       |  FROM base q JOIN base c ON q.bucket = c.bucket
       |   AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
       |  FROM scored) WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  def eventsWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def eventsSessionsSql(gapSec: Long = 1800): String =
    s"""SELECT user_id, CAST(sum(newSess) AS BIGINT) AS n_sessions,
       |       CAST(count(*) AS BIGINT) AS n_events
       |FROM (SELECT user_id,
       |        CASE WHEN prev IS NULL OR epoch_us(ts) - prev > ${gapSec}000000 THEN 1 ELSE 0 END AS newSess
       |      FROM (SELECT user_id, ts, event_id,
       |              lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |            FROM events) t1) t2
       |GROUP BY user_id ORDER BY user_id""".stripMargin
}
