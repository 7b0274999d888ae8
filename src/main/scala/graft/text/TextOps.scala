package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the documents
  * table. All are single-pass, codegen-friendly column expressions — no
  * UDFs — so they stay inside WholeStageCodegen and scale linearly with
  * input splits (no shuffle except the final per-doc aggregates, which are
  * map-side combined).
  *
  * Tokenization is pinned: split on a single literal space, empty tokens
  * kept — the same rule the DuckDB oracles use (string_split), so the two
  * engines agree byte-for-byte.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq("the", "a")

  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(c, " ", -1)

  /** (doc_id, n_tokens, n_chars, avg_token_len) */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      (aggregate(transform(tokens(col("text")), t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") /
        size(tokens(col("text"))).cast("double")).as("avg_token_len"))

  /** Quality scoring: stopword ratio + a deterministic quality bucket —
    * the length/stopword-ratio heuristics of web-corpus filtering. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
    docs.select(
      col("doc_id"), nTok.as("n_tokens"), nStop.as("n_stop"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      when(nTok < 20, "short")
        .when(nStop.cast("double") / nTok.cast("double") < lit(0.01), "low_stop")
        .otherwise("ok").as("quality"))
  }

  /** n-gram-heuristic language id: stopword-density test (the classic
    * cheap langid signal); emits the evidence columns alongside. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
    docs.select(
      col("doc_id"), col("lang").as("declared_lang"),
      (nStop.cast("double") / nTok.cast("double")).as("stop_ratio"),
      when(nStop.cast("double") / nTok.cast("double") >= 0.02, "en")
        .otherwise("other").as("predicted_lang"))
  }

  /** BPE-ish subword-proxy token count: alphabetic runs, single digits,
    * and individual punctuation marks — the cheap pre-tokenizer shape used
    * for token-budget estimation before a real BPE pass. The character
    * classes are spelled with explicit ranges (no \s/\w shorthands) so the
    * Java and RE2 regex engines agree exactly, making the count
    * oracle-checkable. Emitted next to the whitespace count for the
    * tokens-per-word diagnostic. */
  def bpeTokens(docs: DataFrame): DataFrame = {
    val pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe_tokens"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"))
  }

  /** Content fingerprint: md5 of the raw text (identical hex in any
    * engine); the document-identity key for exact dedup. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))
}
