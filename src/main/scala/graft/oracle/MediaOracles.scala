package graft.oracle

/** DuckDB oracle for the media pipeline: re-derives the header decode of
  * [[graft.media.Media.decodeOne]] from the RAW payload bytes (dumped by
  * Verify to `<outDir>/aux/media`), entirely in SQL — hex-encode the blob,
  * extract bytes positionally, sniff the container from magic bytes, and
  * re-compute width/height/channels per format. Nothing is trusted from
  * the Spark side except the payload bytes themselves, so this is an
  * independent check of the parser, not an echo of its output.
  */
object MediaOracles {

  /** Per-kind stats over the decoded metadata, mirroring
    * [[graft.media.Media.kindStats]]. Byte extraction: DuckDB list
    * comprehension over the hex string — `by[o+1]` is the unsigned byte at
    * 0-based offset `o` (1-based list indexing). All multi-byte fields are
    * rebuilt with explicit endianness exactly as the kernel reads them:
    * PNG big-endian at 16/20, WAV little-endian at 22/24/34, BMP
    * little-endian at 18/22/28. avg_pixels stays exact in FP because every
    * partial sum of integer-valued doubles is < 2^53. */
  def mediaStatsSql(mediaDir: String): String =
    s"""WITH m AS MATERIALIZED (
       |  SELECT media_id, upper(hex(payload)) AS h,
       |         CAST(octet_length(payload) AS BIGINT) AS n_bytes
       |  FROM read_parquet('$mediaDir/*.parquet')),
       |b AS MATERIALIZED (
       |  SELECT media_id, n_bytes,
       |         [(strpos('0123456789ABCDEF', substr(h, CAST(2*o+1 AS INT), 1)) - 1) * 16
       |          + strpos('0123456789ABCDEF', substr(h, CAST(2*o+2 AS INT), 1)) - 1
       |          for o in range(0, 55)] AS by
       |  FROM m),
       |meta AS MATERIALIZED (
       |  SELECT media_id, n_bytes,
       |    CASE
       |      WHEN n_bytes >= 33 AND by[1]=137 AND by[2]=80 AND by[3]=78 AND by[4]=71
       |        THEN 'png'
       |      WHEN n_bytes >= 44 AND by[1]=82 AND by[2]=73 AND by[3]=70 AND by[4]=70
       |       AND by[9]=87 AND by[10]=65 AND by[11]=86 AND by[12]=69
       |        THEN 'wav'
       |      WHEN n_bytes >= 54 AND by[1]=66 AND by[2]=77 THEN 'bmp'
       |      ELSE 'unknown' END AS kind,
       |    by FROM b),
       |decoded AS MATERIALIZED (
       |  SELECT media_id, kind, n_bytes,
       |    CASE kind
       |      WHEN 'png' THEN by[17]*16777216 + by[18]*65536 + by[19]*256 + by[20]
       |      WHEN 'wav' THEN by[25] + by[26]*256 + by[27]*65536 + by[28]*16777216
       |      WHEN 'bmp' THEN by[19] + by[20]*256 + by[21]*65536 + by[22]*16777216
       |      ELSE 0 END AS width,
       |    CASE kind
       |      WHEN 'png' THEN by[21]*16777216 + by[22]*65536 + by[23]*256 + by[24]
       |      WHEN 'wav' THEN by[35] + by[36]*256
       |      WHEN 'bmp' THEN by[23] + by[24]*256 + by[25]*65536 + by[26]*16777216
       |      ELSE 0 END AS height
       |  FROM meta)
       |SELECT kind, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(n_bytes) AS BIGINT) AS bytes,
       |       avg(CAST(width AS DOUBLE) * CAST(height AS DOUBLE)) AS avg_pixels
       |FROM decoded GROUP BY kind ORDER BY kind""".stripMargin

  /** Re-derives [[graft.media.Media.features]] (gate query `media_features`)
    * from the raw payload bytes: per-dimension INTEGER byte sums (exact) →
    * one double divide → float32 round → double widen, the same operation
    * chain the kernel runs, so the values are bit-identical. */
  def mediaFeaturesSql(mediaDir: String, dim: Int = 16): String =
    s"""WITH m AS MATERIALIZED (
       |  SELECT media_id, upper(hex(payload)) AS h,
       |         CAST(octet_length(payload) AS BIGINT) AS n
       |  FROM read_parquet('$mediaDir/*.parquet')),
       |off AS MATERIALIZED (
       |  SELECT media_id, h, unnest(range(0, n)) AS o FROM m),
       |byt AS MATERIALIZED (
       |  SELECT media_id, CAST(o % $dim AS BIGINT) AS d,
       |         (strpos('0123456789ABCDEF', substr(h, CAST(2*o+1 AS INT), 1)) - 1) * 16
       |         + strpos('0123456789ABCDEF', substr(h, CAST(2*o+2 AS INT), 1)) - 1 AS b
       |  FROM off),
       |s AS MATERIALIZED (
       |  SELECT media_id, d, sum(b) AS sb FROM byt GROUP BY media_id, d)
       |SELECT media_id, d,
       |       CAST(CAST(CAST(sb AS DOUBLE)/255.0 AS FLOAT) AS DOUBLE) AS feature
       |FROM s ORDER BY media_id, d""".stripMargin
}
