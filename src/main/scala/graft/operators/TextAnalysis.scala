package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID heuristics, document fingerprinting — all pure
  * Column expressions (no UDFs), so they run inside whole-stage codegen and
  * scale linearly with the scan; none of them shuffles.
  */
object TextAnalysis {

  /** Stopword list shared with the DuckDB oracles (keep in sync with
    * [[stopSql]]).
    */
  val EnglishStop: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
  private val stopSql = EnglishStop.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Count of tokens that are stopwords, via the `filter` higher-order
    * function (codegen-friendly; no explode, no shuffle).
    */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(EnglishStop: _*))).cast("long")

  /** Per-document stats: token count, char counts, average token length,
    * stopword ratio, and a bounded quality score
    * `least(1, n_tokens/20) * (1 - stop_ratio)`.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = size(toks).cast("long")
    val nonWs = length(regexp_replace(trim(col("text")), " ", "")).cast("long")
    val stopRatio = stopwordCount(toks) / nToks
    docs.select(
        col("doc_id"),
        nToks.as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        nonWs.as("len_nonws"),
        r6(nonWs / nToks).as("avg_token_len"),
        r6(stopRatio).as("stop_ratio"),
        r6(least(lit(1.0), nToks / 20.0) * (lit(1.0) - stopRatio)).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** N-gram language-ID heuristic: the fraction of tokens that are English
    * stopwords decides en vs und. (A multi-language scorer would broadcast
    * per-language stop sets and argmax — same shape, still no shuffle.)
    */
  def langId(docs: DataFrame, threshold: Double = 0.15): DataFrame = {
    val toks = tokens(col("text"))
    val ratio = stopwordCount(toks) / size(toks).cast("long")
    docs.select(
        col("doc_id"),
        r6(ratio).as("en_stop_ratio"),
        when(ratio >= threshold, "en").otherwise("und").as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Order-insensitive document fingerprint: md5 of the sorted, lowercased
    * token multiset. Two docs with the same bag of words collide — the
    * cheap exact-near-dup key (see [[Dedup]] for the graded variants).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(split(trim(lower(text)), " "))))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "td1_text_stats" -> ((s: SparkSession, d: String) => textStats(Tables.documents(s, d))),
    "td2_lang_id" -> ((s: SparkSession, d: String) => langId(Tables.documents(s, d))),
    "td3_fingerprint" -> ((s: SparkSession, d: String) => fingerprints(Tables.documents(s, d))))

  val oracles: Map[String, String] = Map(
    "td1_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
         |s AS (SELECT doc_id, text, len(toks) AS n_tokens,
         |        len(list_filter(toks, x -> x IN $stopSql)) AS n_stop,
         |        length(replace(trim(text), ' ', '')) AS len_nonws FROM t)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  CAST(len_nonws AS BIGINT) AS len_nonws,
         |  round(len_nonws / n_tokens, 6) AS avg_token_len,
         |  round(n_stop / n_tokens, 6) AS stop_ratio,
         |  round(least(1.0, n_tokens / 20.0) * (1.0 - n_stop / n_tokens), 6) AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,
    "td2_lang_id" ->
      s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
         |s AS (SELECT doc_id,
         |        len(list_filter(toks, x -> x IN $stopSql)) / len(toks) AS ratio FROM t)
         |SELECT doc_id, round(ratio, 6) AS en_stop_ratio,
         |  CASE WHEN ratio >= 0.15 THEN 'en' ELSE 'und' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,
    "td3_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(string_split(trim(lower(text)), ' ')), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)
}
