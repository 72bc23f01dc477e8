package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID heuristics, document fingerprinting — all pure
  * Column expressions (no UDFs), so they run inside whole-stage codegen and
  * scale linearly with the scan; none of them shuffles.
  */
object TextAnalysis {

  /** Stopword lexicons — data lives in [[graft.functions.StopLexicons]]
    * (one source of truth for the native expression, these operators and
    * the generated DuckDB oracles).
    */
  val LangStops: Seq[(String, Seq[String])] = graft.functions.StopLexicons.langs
  val EnglishStop: Seq[String] = LangStops.head._2
  private def stopSqlFor(stops: Seq[String]): String =
    stops.map(s => s"'$s'").mkString("(", ", ", ")")
  private val stopSql = stopSqlFor(EnglishStop)

  /** DuckDB twin pieces of [[qualityScore]], shared by td1's stats oracle
    * and sa13's budget-fill oracle (single Scala source feeds both texts,
    * the sa9OracleSql pattern): the English stop-count over a toks list
    * expression, and the bounded score over (n_tokens, n_stop) columns.
    */
  private[graft] def stopCountSql(toks: String): String =
    s"len(list_filter($toks, x -> x IN $stopSql))"
  private[graft] def qualityScoreSql(n: String, nStop: String): String =
    s"round(least(1.0, $n / 20.0) * (1.0 - $nStop / nullif($n, 0)), 6)"

  /** Word-or-whitespace character class for the symbol-ratio rule —
    * everything NOT matched counts as a symbol. Embeds the tokenizer's
    * [[graft.functions.WsClass]] so tabs/newlines are never symbols;
    * engine-portable for the same reason that class is.
    */
  val SymClass: String = "[A-Za-z0-9" + WsClass.stripPrefix("[")
  /** DuckDB token-array expression over the `text` column (the `t` CTE of
    * every text/dedup oracle) — generated from the same tokenizer spec as
    * the engine's [[graft.functions.tokens]].
    */
  private val toksSql = tokensSql("text")

  /** td9 thresholds — single source for the operator defaults AND the
    * generated oracle SQL (a drifted constant would hash-mismatch).
    */
  val ScriptMin = 0.5
  val KanaMin = 0.05

  /** Head-vocabulary size shared by td19 and st18 — the SINGLE source
    * for the engine defaults AND the generated oracle SQL, so changing
    * it cannot desynchronize the two (the sa9OracleSql pattern).
    */
  val HeadVocabSize: Int = 200

  /** DuckDB twins of [[wordRatios]]/[[wordArgmax]] over a `toks` column —
    * the td2 scoring pieces, shared with td9's Latin fallback.
    */
  private def wordRatioDefsSql: String =
    LangStops.map { case (lang, stops) =>
      s"len(list_filter(toks, x -> x IN ${stopSqlFor(stops)})) / nullif(len(toks), 0) AS r_$lang"
    }.mkString(",\n")

  private def wordPredSql(threshold: Double): String = {
    val langs = LangStops.map(_._1)
    // the same argmax CASE chain as the engine: a language wins iff its
    // ratio >= every later one (earlier languages take ties)
    val argmax = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1)
      s"WHEN ${later.map(o => s"r_$l >= r_$o").mkString(" AND ")} THEN '$l'"
    }.mkString(" ")
    s"""CASE WHEN greatest(${langs.map("r_" + _).mkString(", ")}) >= $threshold THEN
       |    CASE $argmax ELSE '${langs.last}' END
       |  ELSE 'und' END""".stripMargin
  }

  /** Per-language stop counts in one pass — the native codegen'd
    * [[graft.functions.StopCounts]] expression (a `filter` HOF lambda runs
    * interpreted per token per language; this is one hash lookup per
    * token).
    */
  def stopCounts(toks: Column): Column = call_function("stop_counts", toks)

  /** Count of tokens that are English stopwords (lexicon 1). */
  def stopwordCount(toks: Column): Column = element_at(stopCounts(toks), 1)

  /** The bounded quality score, defined ONCE for td1 (per-doc stats) and
    * td7 (corpus rollup): `r6(least(1, n_tokens/20) * (1 - stop_ratio))`.
    */
  def qualityScore(toks: Column): Column = {
    val nToks = size(toks).cast("long")
    r6(least(lit(1.0), nToks / 20.0) *
      (lit(1.0) - stopwordCount(toks) / nullif(nToks, lit(0L))))
  }

  /** Per-document stats: token count, char counts, average token length,
    * stopword ratio, and the [[qualityScore]].
    */
  def textStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    // nullif: a whitespace-only document has ZERO tokens under the regex
    // tokenizer; null ratios beat a div-by-zero (Spark would produce IEEE
    // NaN where DuckDB produces NULL — nullif makes both engines NULL)
    val nToks = nullif(size(toks).cast("long"), lit(0L))
    val nonWs = length(regexp_replace(col("text"), WsClass, "")).cast("long")
    docs.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        nonWs.as("len_nonws"),
        r6(nonWs / nToks).as("avg_token_len"),
        r6(stopwordCount(toks) / nToks).as("stop_ratio"),
        qualityScore(toks).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Multi-language n-gram language ID: one stop-ratio per language (the
    * fraction of tokens in that language's lexicon, all L counted in the
    * single [[stopCounts]] pass), argmax with a fixed deterministic tie
    * order (lexicon order), `und` when even the best ratio is under
    * `threshold`. Pure per-row expression work — one codegen'd pass, no
    * shuffle, no UDF. zh is deliberately absent from the lexicons:
    * whitespace tokenization carries no signal for unsegmented scripts —
    * that path needs char-n-gram features, a different operator.
    */
  /** Per-language word-path stop ratios over a materialized `sc` counts
    * column (shared by td2 and td9's Latin-script fallback).
    */
  private def wordRatios(sc: Column, nToks: Column): Seq[(String, Column)] =
    LangStops.zipWithIndex.map { case ((lang, _), i) =>
      lang -> (element_at(sc, i + 1) / nToks)
    }

  /** Word-path argmax by CASE chain: a language wins iff its ratio >=
    * every later one (earlier languages take ties) — deterministic, and
    * expressible verbatim in the DuckDB oracle ([[wordPredSql]]); `und`
    * when even the best ratio is under `threshold` (or null — a
    * zero-token document).
    */
  private def wordArgmax(ratios: Seq[(String, Column)], threshold: Double): Column = {
    val best = ratios.map(_._2).reduce((a, b) => greatest(a, b))
    def chain(rs: List[(String, Column)]): Column = rs match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, r) :: rest =>
        when(rest.map(r >= _._2).reduce(_ && _), lang).otherwise(chain(rest))
      case Nil => lit("und")
    }
    when(best >= threshold, chain(ratios.toList)).otherwise("und")
  }

  def langId(docs: DataFrame, threshold: Double = 0.15): DataFrame = {
    val nToks = nullif(size(col("toks")).cast("long"), lit(0L))
    val ratios = wordRatios(col("sc"), nToks)
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // materialize the counts array ONCE per row (expression lambdas get
      // no CSE, and even plain subexpression sharing is per-projection)
      .select(col("doc_id"), col("toks"), stopCounts(col("toks")).as("sc"))
      .select(
        col("doc_id") +:
          ratios.map { case (lang, r) => r6(r).as(s"${lang}_ratio") } :+
          wordArgmax(ratios, threshold).as("lang_pred"): _*)
      .orderBy(col("doc_id"))
  }

  /** td9 — language ID with UNSEGMENTED-SCRIPT support, closing td2's
    * documented gap: whitespace tokenization carries no signal for
    * zh/ja/ko/th, so those are classified by their character inventory —
    * per-script code-point-range counts ([[graft.functions.ScriptCounts]],
    * the char-unigram profile stage of the published textcat/CLD family)
    * — and Latin-script documents fall back to the td2 word path. Kana
    * presence separates Japanese from Chinese inside the shared Han
    * block (the standard CLD discriminator).
    *
    * Decision chain (deterministic, null ratios fall through — a
    * zero-character document ends as `latn` → word path → `und`):
    * hangul ≥ `minScript` ⇒ ko; han+kana ≥ `minScript` with kana ≥
    * `kanaMin` ⇒ ja; han ≥ `minScript` ⇒ zh; thai ≥ `minScript` ⇒ th;
    * else Latin-script word argmax.
    *
    * Scale: two native codegen'd counting passes (script_counts over
    * chars, stop_counts over tokens) + scalar arithmetic — map-only, no
    * shuffle, no UDF; the profile table rides inside the expression.
    */
  def langIdScript(
      docs: DataFrame, minScript: Double = ScriptMin,
      kanaMin: Double = KanaMin, threshold: Double = 0.15): DataFrame = {
    val nChars = nullif(element_at(col("scc"), ScriptProfiles.nScripts + 1), lit(0L))
    def scr(name: String): Column =
      element_at(col("scc"), ScriptProfiles.index(name) + 1) / nChars
    val (hanR, kanaR, hangulR, thaiR, latinR) =
      (scr("han"), scr("kana"), scr("hangul"), scr("thai"), scr("latin"))
    val nToks = nullif(size(col("toks")).cast("long"), lit(0L))
    val scriptPred =
      when(hangulR >= minScript, "ko")
        .when((hanR + kanaR >= minScript) && (kanaR >= kanaMin), "ja")
        .when(hanR >= minScript, "zh")
        .when(thaiR >= minScript, "th")
        .otherwise("latn")
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        call_function("script_counts", col("text")).as("scc"),
        stopCounts(col("toks")).as("sc"),
        col("toks"))
      .select(col("doc_id"),
        r6(hanR).as("han_ratio"), r6(kanaR).as("kana_ratio"),
        r6(hangulR).as("hangul_ratio"), r6(thaiR).as("thai_ratio"),
        r6(latinR).as("latin_ratio"),
        scriptPred.as("script_pred"),
        wordArgmax(wordRatios(col("sc"), nToks), threshold).as("word_pred"))
      .select(col("doc_id"),
        col("han_ratio"), col("kana_ratio"), col("hangul_ratio"),
        col("thai_ratio"), col("latin_ratio"), col("script_pred"),
        when(col("script_pred") =!= "latn", col("script_pred"))
          .otherwise(col("word_pred")).as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Order-insensitive document fingerprint: md5 of the sorted, lowercased
    * token multiset. Two docs with the same bag of words collide — the
    * cheap exact-near-dup key (see [[Dedup]] for the graded variants).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(tokens(asciiLower(text)))))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** td4 — token counting three ways: whitespace tokens, word tokens, and a
    * BPE-ish segmentation (alphanumeric runs + individual punctuation
    * marks — the shape a byte-pair pre-tokenizer produces). Counting runs
    * through the native [[graft.functions.MatchCount]] expression:
    * Spark's `regexp_count` lowers to `size(regexp_extract_all(...))`,
    * which materializes one string per token per pattern just to take the
    * length — match_count keeps only the counter (same java.util.regex
    * find() loop, count-identical by ExpressionProps). The pattern is
    * shared verbatim with the DuckDB oracle (plain ASCII classes, no
    * dialect-sensitive escapes).
    */
  val WordPattern = "[A-Za-z0-9]+"
  val BpeishPattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        call_function("match_count", col("text"), lit(WordPattern)).as("word_tokens"),
        call_function("match_count", col("text"), lit(BpeishPattern)).as("bpeish_tokens"))
      .orderBy(col("doc_id"))

  /** td5 — winnowing document fingerprints (the MOSS scheme): hash every
    * positional k-gram, slide a w-window over the hash sequence, keep each
    * window's minimum, de-dup. Near-identical docs share most selected
    * hashes even under edits — the rolling-hash fingerprint family. The
    * hash is md5-hex and the window minimum is LEXICOGRAPHIC, so the DuckDB
    * oracle reproduces it bit-for-bit (no engine-specific numeric hash).
    * Pure expression work: no UDF, no shuffle before the final explode.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val toks = col("toks")
    val grams = transform(
      sequence(lit(0), size(toks) - k),
      i => md5(concat_ws(" ", slice(toks, i + 1, lit(k)))))
    val g = col("grams")
    // max(|grams| - w + 1, 1) windows; slice truncates at the end, so a
    // short doc yields one window spanning all grams
    val wins = array_distinct(transform(
      sequence(lit(0), greatest(size(g) - w, lit(0))),
      j => array_min(slice(g, j + 1, lit(w)))))
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), when(size(toks) >= k, grams).otherwise(array().cast("array<string>")).as("grams"))
      .select(col("doc_id"), explode(when(size(g) > 0, wins).otherwise(array().cast("array<string>"))).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** td6 — Gopher/C4-style document quality filter (Rae et al. 2021 §A1.1,
    * Raffel et al. 2020 §2.2 — published heuristics, re-expressed over the
    * corpus): per-rule boolean flags plus the conjunctive keep decision, so
    * a pipeline can both filter AND report per-rule removal rates (the
    * training-data twin of the reference's cleaning accounting, V9).
    *
    * Rules (thresholds tuned so each can bind on the synthetic corpus):
    *  - token count in [minTokens, maxTokens]
    *  - mean non-whitespace token length in [3, 10]
    *  - at least `minStopHits` stopword occurrences (Gopher's "contains at
    *    least 2 of a stop list" rule)
    *  - symbol ratio (non-alphanumeric, non-space chars / chars) ≤ 0.1
    *  - distinct-token ratio ≥ 0.3 (repetition proxy for Gopher's
    *    duplicate-n-gram caps)
    *
    * Pure expression work — flags and ratios are codegen'd, no shuffle; at
    * 100 TB this is a map-only pass over the scan. Output is integers and
    * booleans only (no float hashing concerns in the oracle compare).
    */
  /** The named rule predicates over a materialized token column + the raw
    * text (shared by [[qualityFilter]] and [[corpusRollup]] so the keep
    * decision is defined exactly once).
    */
  def qualityRules(
      toks: Column, text: Column,
      minTokens: Int = 20, maxTokens: Int = 1000,
      minAvgTokLen: Double = 3.0, maxAvgTokLen: Double = 10.0,
      minStopHits: Int = 2, maxSymbolRatio: Double = 0.1,
      minDistinctRatio: Double = 0.3): Seq[(String, Column)] = {
    val nToks = nullif(size(toks).cast("long"), lit(0L))
    val avgTokLen =
      length(regexp_replace(text, WsClass, "")).cast("double") / nToks
    val symbolRatio =
      length(regexp_replace(text, SymClass, "")).cast("double") /
        greatest(length(text), lit(1))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nToks
    Seq(
      // the COUNT rule compares the plain size (0 tokens ⇒ false, and
      // the reject attribution names r_n_tokens) — only the RATIO rules
      // go through the nullif guard. The oracle's `len(toks) BETWEEN`
      // is false at 0; a nullif'd NULL here diverged on zero-token docs
      // (found by the adversarial-corpus differential run).
      "r_n_tokens" -> size(toks).cast("long").between(minTokens, maxTokens),
      "r_token_len" -> avgTokLen.between(minAvgTokLen, maxAvgTokLen),
      "r_stopwords" -> (stopwordCount(toks) >= minStopHits),
      "r_symbols" -> (symbolRatio <= maxSymbolRatio),
      "r_distinct" -> (distinctRatio >= minDistinctRatio))
  }

  def qualityFilter(docs: DataFrame): DataFrame = {
    val rules = qualityRules(col("toks"), col("text"))
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("n_tokens") +:
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", rules.map(r => col(r._1)).reduce(_ && _))
      .orderBy(col("doc_id"))
  }

  /** td7 — corpus rollup by language: document/keep counts, token volume,
    * DISTINCT source count and mean quality score per `lang` — the
    * one-page corpus health report a pipeline run ends with, composing the
    * td6 keep decision and the td1 quality score into one grouped pass.
    *
    * Scale: one hash aggregation on a low-cardinality key; the exact
    * `count(DISTINCT source)` plans as Spark's two-phase distinct
    * aggregate (partial dedup map-side). At 100 TB with a high-cardinality
    * distinct column, swap in `approx_count_distinct` (HLL) — the exact
    * form is kept here because the oracle can hash-match it.
    */
  def corpusRollup(docs: DataFrame): DataFrame = {
    val keep = qualityRules(col("toks"), col("text")).map(_._2).reduce(_ && _)
    docs
      .select(col("lang"), col("source"), col("text"), tokens(col("text")).as("toks"))
      .select(col("lang"), col("source"), size(col("toks")).cast("long").as("n"),
        keep.as("keep"), qualityScore(col("toks")).as("q"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum(col("n")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"),
        davg(col("q")).as("avg_quality"))
      .orderBy(col("lang"))
  }

  /** td8 — corpus n-gram document frequencies, top-k: the "what phrases
    * dominate this corpus" report (boilerplate detection, the input to
    * dd3's DF cap choice, contamination screening). `word_shingles` emits
    * DISTINCT shingles per document, so the count IS document frequency.
    *
    * Scale: explode → hash aggregate → top-k. The aggregation is map-side
    * partial (each mapper emits one row per distinct shingle it saw), so a
    * hot boilerplate shingle never funnels its occurrences through one
    * reducer — the same skew-immunity argument as dd3's DF cap — and the
    * top-k plans as TakeOrderedAndProject (per-partition heaps of k, no
    * global sort).
    */
  def ngramFreq(docs: DataFrame, n: Int = 3, k: Int = 100): DataFrame =
    Dedup.explodedShingles(docs, n)
      .select(col("s").as("ngram")) // doc_id pruned by Catalyst
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(k)

  /** td10 — repetition metrics (the Gopher §A1.1 duplicate-line family,
    * published heuristics): per document, the fraction of LINES whose
    * value occurs more than once — counted by occurrence and by character
    * mass — plus the line count. Boilerplate-heavy documents (headers,
    * navigation, chat logs with repeated stamps) light up here when
    * td6's distinct-TOKEN ratio stays quiet. Lines are raw `\n` splits,
    * empties kept (a run of blank lines IS repetition).
    *
    * Scale: explode lines → (doc, line) hash aggregate (map-side partial,
    * a hot boilerplate line never funnels through one reducer) → per-doc
    * rollup. A document of unique lines scores 0; a blank-only document
    * has zero line characters ⇒ null char fraction (nullif-guarded in
    * both engines).
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val dup = col("c") > 1
    docs
      .select(col("doc_id"), explode(split(col("text"), "\n", -1)).as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_lines"),
        sum(when(dup, col("c")).otherwise(lit(0L))).as("dup_lines"),
        sum(length(col("line")).cast("long") * col("c")).as("chars"),
        sum(when(dup, length(col("line")).cast("long") * col("c"))
          .otherwise(lit(0L))).as("dup_chars"))
      .select(col("doc_id"), col("n_lines"),
        r6(col("dup_lines") / nullif(col("n_lines"), lit(0L))).as("dup_line_frac"),
        r6(col("dup_chars") / nullif(col("chars"), lit(0L))).as("dup_char_frac"))
      .orderBy(col("doc_id"))
  }

  /** td11 — document novelty vs the corpus: each doc scored by the
    * document frequencies of its own n-gram shingles — `mean_df` high ⇒
    * the doc is assembled from corpus boilerplate, `novelty` (mean 1/df)
    * high ⇒ its phrasing is rare. The per-document companion to td8's
    * corpus-level frequency report and the standard input to
    * quality-weighted sampling (prefer novel docs, downweight templates).
    * Deliberately 1/df rather than the textbook −log(df/N): `log` is not
    * IEEE-correctly-rounded and differs in the last ulp across libm
    * implementations, which would poison the cross-engine hash — division
    * is exact, and the ordering it induces is the same.
    *
    * Scale: shingle DF is the skew-immune partial-agg count (td8's
    * shape); the ex ⋈ df join's only hot keys are boilerplate shingles —
    * a plain inner join, which AQE's skew-join splitting handles (unlike
    * an aggregation, nothing funnels through one reducer by NECESSITY);
    * the per-doc rollup is partial-aggregated on doc_id.
    */
  def docNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val ex = Dedup.explodedShingles(docs, n)
    val dfc = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    ex.join(dfc, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        davg(col("df")).as("mean_df"),
        davg(lit(1.0) / col("df")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** td12 — PII scan/redaction patterns, defined ONCE for the engine (Java
    * regex) and the generated oracle (RE2). Deliberately alternation-free
    * and plain-greedy: Java's leftmost-FIRST backtracking and RE2's
    * leftmost-LONGEST matching agree on such patterns, so match counts and
    * replacement spans are engine-identical (asserted in
    * TextAnalysisSpec on crafted PII docs — the synthetic corpus itself is
    * digit-free, so the spec is where the behavior is exercised).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** td12 — PII detection and redaction: per document, match counts for
    * email / IPv4 / phone-shaped spans, the conjunctive `pii_free` flag,
    * and an md5 fingerprint of the REDACTED text (emails first, then IPs,
    * then phones — order matters: a phone-shaped run inside an already-
    * redacted span must not double-fire). The fingerprint lets the gate
    * verify the redaction itself without shipping the (possibly
    * sensitive) text through the comparison — the same posture a real
    * pipeline takes: redact in place, log only counts and hashes.
    *
    * Scale: three codegen'd regex passes, map-only, no shuffle — composes
    * with the quality filter in one stage. Patterns are shared verbatim
    * with the DuckDB oracle (see [[EmailPattern]] note on regex-engine
    * agreement).
    */
  def piiScan(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>")
    docs.select(
        col("doc_id"),
        call_function("match_count", col("text"), lit(EmailPattern)).as("n_emails"),
        call_function("match_count", col("text"), lit(Ipv4Pattern)).as("n_ipv4"),
        call_function("match_count", col("text"), lit(PhonePattern)).as("n_phones"),
        md5(redacted).as("redacted_fp"))
      .withColumn("pii_free",
        col("n_emails") === 0 && col("n_ipv4") === 0 && col("n_phones") === 0)
      .orderBy(col("doc_id"))
  }

  /** td13 — BM25-style keyword relevance (Robertson & Walker's Okapi
    * formula) for a fixed query, top-k: per document, per-term tf over
    * the shared tokenizer, document length dl, corpus stats (N, avgdl,
    * per-term df) from ONE auxiliary aggregate broadcast back, then
    *
    *   score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the RATIONAL idf `(N − df + 0.5)/(df + 0.5)` instead of the
    * textbook log of it: `log` is not IEEE-correctly-rounded and differs
    * in the last ulp across libm implementations (the td11 rule), while
    * this form is division-exact in both engines and induces the same
    * per-term ordering. The per-term scores are summed in FIXED query
    * order (explicit column addition, never an agg over an unordered
    * set), so the total is bit-reproducible.
    *
    * Scale: one linear pass computes tf/dl; the stats side is a 1-row
    * aggregate cross-joined back (Spark plans a broadcast nested loop of
    * one row); top-k is TakeOrderedAndProject. The corpus never
    * shuffles. A multi-query batch is the same plan with the query set
    * exploded and the stats keyed by query_id.
    */
  /** All four constants are spelled as LITERALS (never derived — `1.2 +
    * 1.0` in double arithmetic lands on a round-to-even knife edge vs the
    * parsed literal `2.2`), so the Scala plan and the oracle SQL parse the
    * exact same doubles.
    */
  val Bm25K1 = 1.2
  val Bm25K1Plus1 = 2.2
  val Bm25B = 0.75
  val Bm25OneMinusB = 0.25

  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 50): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            // tf as |toks| − |toks without t|: array_remove is a codegen'd
            // collection op — a `filter` HOF lambda runs interpreted per row
            (size(col("toks")) - size(array_remove(col("toks"), t)))
              .cast("long").as(s"tf_$i")
          }: _*)
    val statAggs = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i => sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val perTerm = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      idf * tf * lit(Bm25K1Plus1) /
        (tf + lit(Bm25K1) * (lit(Bm25OneMinusB) + lit(Bm25B) * col("dl") / avgdl))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        r6(perTerm.reduce(_ + _)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The registry's fixed demo query — mid-frequency corpus terms. */
  val Bm25Terms: Seq[String] = Seq("spark", "vector", "customer")

  /** td15 — TF-IDF keyword extraction: each document's top-k most
    * characteristic terms, score = tf · N/df. The idf is the RATIONAL
    * N/df, not its textbook log — the td11/td13 portability rule: `log`
    * drifts in the last ulp across libm implementations and would poison
    * the cross-engine hash, while (tf·N)/df is one exact long product and
    * one correctly-rounded IEEE division, bit-identical everywhere; the
    * monotone log leaves the per-document ranking unchanged. Ties rank by
    * term ascending, so the k-set is fully deterministic.
    *
    * Scale shape: tf is a (doc, term) partial-agg count (skew-immune —
    * map-side combine absorbs hot terms); df reduces tf by term; the
    * tf ⋈ df join's hot keys are exactly the stopword-grade terms, a
    * plain inner join AQE skew-splits (td11's argument). The top-k filter
    * is `row_number() <= k`, which Spark rewrites to WindowGroupLimit —
    * no document ever materializes more than k + heap rows per partition
    * (PlanSpec audit). N is a 1-row broadcast.
    */
  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dft, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n")) / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        r6(col("score")).as("score"))
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  // ------------------------------------------------------------ registry

  /** td14 — heavy hitters over the corpus vocabulary via the Misra–Gries
    * sketch aggregate ([[graft.functions.MisraGries]]): the bounded-memory
    * candidate-generation twin of td8's exact top-k. One pass, k counters
    * per partial aggregate at ANY vocabulary size; the emitted estimates
    * are merge-order dependent (like every sketch ⇒ rows-only gate), but
    * the GUARANTEES — no term above the N/(k+1) threshold missed,
    * estimates never above truth, undershoot ≤ N/(k+1) — hold under any
    * order and are asserted against exact counts in TextAnalysisSpec.
    */
  def heavyHitters(docs: DataFrame, k: Int = 32): DataFrame = {
    val sketch = udaf(new MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    docs
      .select(explode(tokens(col("text"))).as("term"))
      .agg(sketch(col("term")).as("mg"))
      .select(explode(col("mg")).as(Seq("term", "est_count")))
      .orderBy(col("est_count").desc, col("term"))
  }

  /** td16 — sliding-window document CHUNKING: each doc split into
    * overlapping token windows of `chunkTokens` tokens with `overlap`
    * tokens shared between consecutive chunks — the preprocessing step
    * every embedding/RAG/long-context pipeline runs before vectorizing
    * (a chunk is the retrieval unit; the overlap keeps boundary context
    * retrievable from both sides). Output one row per chunk:
    * (doc_id, chunk_id, chunk_tokens, chunk_text).
    *
    * Starts advance by `chunkTokens − overlap`; the final window
    * truncates at the document end (no padding); zero-token docs emit no
    * chunks. Pure expression work — tokenize once, generate the bounded
    * start sequence, slice per start — map-only until the explode, no
    * shuffle but the output sort; at 100 TB this composes with the
    * quality filter in one stage and the chunk stream feeds the
    * embedding UDF batch (mm2's seam) directly.
    */
  def chunkDocs(
      docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"chunking needs 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val step = chunkTokens - overlap
    val toks = col("toks")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(toks) > 0)
      .select(col("doc_id"), toks,
        posexplode(sequence(lit(0), size(toks) - 1, lit(step)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(toks, col("start") + 1, lit(chunkTokens)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** td17 — duplicate n-GRAM coverage (the repeated-PHRASE half of the
    * Gopher §A1.1 repetition family, Rae et al. 2021; td10 is the
    * repeated-LINE half): per document, (a) `top2_frac` — the token mass
    * covered by occurrences of the single most frequent REPEATED 2-gram
    * (cnt ≥ 2 — a gram seen once is not repetition and would flag every
    * short doc; ties to the lexicographically smallest gram), and (b)
    * `dup5_frac` — the
    * token mass covered by ANY 5-gram occurring at least twice within the
    * document; overlapping occurrences count each token position ONCE
    * (the published "fraction of characters in duplicate n-grams"
    * semantics, on token mass since the tokenizer is the engine-portable
    * shared spec). `repetitive` applies the published thresholds
    * (top-2-gram > 0.20, dup-5-gram > 0.15) — the machine-text detector
    * that catches looping generation and template spam td6's
    * distinct-token ratio and td10's line hashes both miss.
    *
    * Coverage is a linear interval-merge fold over the sorted start
    * list: equal-length spans mean span i adds least(n, sᵢ − sᵢ₋₁) new
    * token positions, so union mass is one aggregate() pass per doc
    * (O(|starts|), never quadratic on repetitive docs) — exact integers
    * end-to-end, and the two fractions are single
    * correctly-rounded IEEE divisions (q40's lcc argument), so the whole
    * row hash-matches across engines. Zero-token docs give nullif-guarded
    * null fractions (td10's convention).
    *
    * Scale: n-grams explode linearly; the (doc, gram) and (doc) hash
    * aggregates are map-side-partial and skew-immune (a hot gram is still
    * keyed by doc); no window, no join against anything data-scaled —
    * two shuffles on doc-sized keys, the output sort aside.
    */
  def dupNgrams(
      docs: DataFrame, topN: Int = 2, dupN: Int = 5,
      topThresh: Double = 0.20, dupThresh: Double = 0.15): DataFrame = {
    val t = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
    // (doc_id, start, gram) for every n-gram, 0-based starts; docs
    // shorter than n emit nothing (a descending `sequence` guard, the
    // td16/dd17 edge)
    def gramsWithPos(df: DataFrame, n: Int): DataFrame =
      df.select(col("doc_id"), col("n_tokens"),
          explode(when(size(col("toks")) >= n,
              sequence(lit(0L), size(col("toks")).cast("long") - n))
            .otherwise(array().cast("array<bigint>"))).as("start"),
          col("toks"))
        .select(col("doc_id"), col("start"),
          concat_ws(" ",
            slice(col("toks"), (col("start") + 1).cast("int"), lit(n))).as("gram"))
    // token positions covered by [s, s+n) over the sorted start list —
    // ONE linear interval-merge fold: with starts ascending and all
    // spans the same length n, the covered prefix after element i−1
    // ends exactly at starts[i−1] + n, so span i's NEW mass is
    // least(n, s_i − s_{i−1}) (first span contributes n via the −n
    // seed). O(|starts|) per doc — the old per-position membership
    // scan (size(filter(sequence(0..n−1), exists(starts, …)))) was
    // O(n_tokens × |starts|), which goes quadratic exactly on the
    // highly repetitive spam docs td17 exists to flag (dup starts →
    // n_tokens ⇒ one multi-megatoken doc could stall its executor).
    // Still exact integer arithmetic: gram starts satisfy
    // s + n ≤ n_tokens, so no end-truncation term exists.
    def coverage(starts: Column, n: Int): Column =
      aggregate(starts,
        struct(lit(-n.toLong).as("p"), lit(0L).as("m")),
        (acc, s) => struct(s.as("p"),
          (acc.getField("m") +
            least(lit(n.toLong), s - acc.getField("p"))).as("m")),
        acc => acc.getField("m"))
    val top = gramsWithPos(t, topN)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"),
        sort_array(collect_list(col("start"))).as("starts"))
      .filter(col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("cnt")).as("nc"), col("gram").as("g"),
        col("starts").as("st"))).as("m"))
      .select(col("doc_id"), col("m.g").as("top_gram"),
        col("m.st").as("top_starts"))
    val dup = gramsWithPos(t, dupN)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"), collect_list(col("start")).as("starts"))
      .filter(col("cnt") >= 2)
      .groupBy(col("doc_id"))
      .agg(sort_array(flatten(collect_list(col("starts")))).as("dup_starts"))
    val topFrac = when(col("top_starts").isNotNull,
        coverage(col("top_starts"), topN))
      .otherwise(lit(0L)) / nullif(col("n_tokens"), lit(0L))
    val dupFrac = when(col("dup_starts").isNotNull,
        coverage(col("dup_starts"), dupN))
      .otherwise(lit(0L)) / nullif(col("n_tokens"), lit(0L))
    t.join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("top_gram"),
        topFrac.as("top2_frac"), dupFrac.as("dup5_frac"))
      .withColumn("repetitive",
        col("top2_frac") > topThresh || col("dup5_frac") > dupThresh)
      .orderBy(col("doc_id"))
  }

  /** td18 — DATA SELECTION via hashed-n-gram importance (the DSIR shape,
    * Xie et al. 2023 "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how much its hashed
    * unigram profile looks like a TARGET domain (here `lang = targetLang`
    * — in production, a curated high-quality reference corpus) relative
    * to the raw corpus. Per bucket b of `nBuckets` hashed token buckets,
    * the target and raw bag-of-tokens models give add-one-smoothed
    * probabilities p_b = (tc_b+1)/(Nt+D) and q_b = (qc_b+1)/(Nq+D); a
    * doc's importance is Σ_b c_b · w_b over its own bucket counts, where
    * w_b is the p_b/q_b ratio. DSIR's published estimator sums LOG ratios
    * — a log is libm territory and never oracle-hashable (the td11/td13
    * rational-idf rule), so w_b here is the RATIO ITSELF on the 1e-6
    * integer grid, computed by ONE exact integer floor-division
    * (`(10⁶·(tc_b+1)·(Nq+D)) div ((qc_b+1)·(Nt+D))`, DECIMAL(38,0)
    * operands so nothing overflows at any corpus size): per-doc scores
    * are order-independent INTEGER sums, bit-identical across engines —
    * the q36/sim9 scaled-integer discipline. Emitted per doc: raw
    * `importance`, and the length-debiased `imp_per_token`
    * (floor-div by the doc's token count — selection without it favors
    * long docs). The selection step composes downstream: top-k by
    * (imp_per_token, doc_id) is a TakeOrderedAndProject, or a threshold
    * filter; both stay hash-gated over this table.
    *
    * Scale: tokenize + bucket-hash once, (doc, bucket) partial agg —
    * skew-immune (a hot bucket is still keyed by doc); both corpus
    * models REDUCE from that substrate (≤ D rows out), the D-row ratio
    * table broadcasts back, and the per-doc sum is one doc-keyed
    * aggregation. Two data-scaled shuffles, no window, no join against
    * anything data-scaled. Zero-token docs emit nothing (the td10/td17
    * convention).
    */
  def dsirImportance(
      docs: DataFrame, targetLang: String = "en", nBuckets: Int = 1024,
      salt: String = "dsir-v1"): DataFrame = {
    // (doc_id, lang, b, c): each doc's hashed-unigram bucket counts —
    // the one data-scaled explode, shared by both models and the scorer
    val tb = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .withColumn("b",
        conv(substring(md5(concat(lit(s"$salt:"), col("tok"))), 1, 13), 16, 10)
          .cast("long") % nBuckets)
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
    val rawStats = tb.groupBy(col("b")).agg(sum(col("c")).as("qc"))
    val tgtStats = tb.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(sum(col("c")).as("tc"))
    val totals = tb.agg(
      sum(col("c")).as("nq"),
      sum(when(col("lang") === targetLang, col("c")).otherwise(lit(0L))).as("nt"))
    // w_b on the 1e-6 grid: exact integer floor-division over
    // DECIMAL(38,0) operands. Each FACTOR is cast to DECIMAL before the
    // multiply — wrapping the whole product in one CAST still evaluates
    // the product in Long and overflows once 10⁶·(tc+1)·(Nq+D) passes
    // 2⁶³ (hit at the 100× rehearsal: Nq ≈ 5·10⁷ tokens, tc ≈ 2·10⁴
    // per hot bucket ⇒ ~10¹⁸·k). The decimal product peaks ~10²⁸,
    // inside DECIMAL(38,0); the quotient ≤ 10⁶·max-ratio fits the long
    // IntegralDivide returns
    val ratios = rawStats
      .join(tgtStats, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"""CAST(1000000 AS DECIMAL(38,0))
                 |* CAST(coalesce(tc, 0L) + 1 AS DECIMAL(38,0))
                 |* CAST(nq + $nBuckets AS DECIMAL(38,0))
                 |div (CAST(qc + 1 AS DECIMAL(38,0))
                 |  * CAST(nt + $nBuckets AS DECIMAL(38,0)))
                 |""".stripMargin.replace('\n', ' ')).as("w"))
    tb.join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("w")).as("importance"))
      .select(col("doc_id"), col("n_tokens"), col("importance"),
        expr("importance div n_tokens").as("imp_per_token"))
      .orderBy(col("doc_id"))
  }

  /** td19 — out-of-vocabulary rate against a corpus-derived top-V
    * vocabulary: the classic cheap quality/fluency signal (a doc whose
    * tokens mostly fall outside the corpus head vocabulary is noise,
    * boilerplate, or the wrong language). Vocabulary = the `vocabSize`
    * most frequent tokens, totally ordered by (count DESC, token ASC) so
    * the boundary cut is deterministic in both engines; per doc, the
    * token count, OOV count, and the exact-rational rate (r6-rounded for
    * the gate).
    *
    * Scale: the vocab aggregate is map-side-combined token counts (the
    * td8 shape) topped by TakeOrderedAndProject; the scoring pass joins
    * the exploded corpus against the BROADCAST vocab (V rows) and
    * re-aggregates per doc — partial aggregation collapses each doc's
    * tokens within its partition, so the shuffle carries one row per
    * (partition, doc). No corpus-sized sort, no skew sensitivity (the
    * vocab side is uniform-broadcast).
    */
  def oovRate(docs: DataFrame, vocabSize: Int = HeadVocabSize): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        r6(col("n_oov").cast("double") / col("n_tokens").cast("double")))
      .orderBy(col("doc_id"))
  }

  /** td20 — cross-source vocabulary overlap matrix: pairwise Jaccard of
    * the DISTINCT token sets of every source pair — the corpus
    * diagnostic that flags near-identical ingest feeds (two mirrors of
    * the same crawl, a vendor re-selling another's dump) before any
    * document-level dedup runs. Exact rational Jaccard from three
    * BIGINT counts: |A∩B| via the self-join of the distinct
    * (source, token) postings on token, |A∪B| = |A|+|B|−|A∩B|.
    *
    * Scale: the postings table is one map-side-combined distinct; the
    * intersection join fans each token to S² pair rows ONLY across the
    * sources that share it — bounded by the SOURCE count, not the
    * corpus (S sources ⇒ ≤ S(S−1)/2 output rows). When S grows to the
    * thousands (per-domain web feeds), the same matrix runs over dd4's
    * MinHash signatures instead of exact postings — this operator is
    * the exact-semantics member, the sketch is the documented escape
    * hatch.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val posts = docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = posts.groupBy(col("source")).agg(count(lit(1)).as("n_vocab"))
    val inter = posts.select(col("source").as("source_a"), col("tok"))
      .join(posts.select(col("source").as("source_b"), col("tok")), Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_vocab", "va")), Seq("source_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_vocab", "vb")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        (col("va") + col("vb") - col("n_common")).as("n_union"),
        r6(col("n_common").cast("double") /
          (col("va") + col("vb") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** td21 reference-slice modulus — the SINGLE source for the engine
    * default AND the generated oracle SQL (the HeadVocabSize pattern).
    */
  val LmRefMod: Int = 10

  /** td21 — unigram-LM surprisal scoring against a held-out reference
    * slice: the CCNet shape (Wenzek et al. 2020 "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data" scores every web
    * document by the perplexity of a KenLM model trained on a curated
    * reference corpus; the head/middle/tail quality buckets are then
    * just percentile cuts over that score). Here the reference corpus is
    * the deterministic holdout `doc_id % refMod = 0` — in production, a
    * curated slice (their Wikipedia) mounted as its own table.
    *
    * The LM is add-one-smoothed unigram counts over the slice:
    * p(tok) = (c+1)/(N+D+1), D = |reference vocab|, all unseen tokens
    * pooled into one +1 OOV mass. True surprisal −log₂p is libm and
    * never oracle-hashable (the td11/td18 rational rule); the graded
    * analog shipped here is the EXACT INTEGER bit count
    * `floorlog2((N+D+1) div (c+1))` where floorlog2(x) =
    * `length(bin(x)) − 1` — a string-length over the minimal binary
    * rendering, one integral divide, no libm, bit-identical in both
    * engines. It is the true per-token surprisal quantized down to whole
    * bits (monotone in 1/p), so the downstream percentile cut selects
    * the same head/tail up to one-bit ties. Per doc: `n_tokens`, the
    * order-free integer `bits` sum, and `bits_per_token` (floor-div —
    * the length-debiased score the CCNet cut runs on; HIGH = surprising
    * = tail/noise, LOW = reference-like = head).
    *
    * Scale: the LM aggregate is map-side-combined token counts over the
    * ~N/refMod reference slice (vocab-scale output, broadcast back with
    * its one-row total); the scoring pass is the td19 shape — exploded
    * corpus LEFT-joined against the broadcast LM, bits computed inline
    * in codegen, one doc-keyed aggregation whose partial agg collapses
    * each doc's tokens before the shuffle. Zero-token docs emit nothing
    * (the td10/td17 convention).
    */
  def lmSurprisal(docs: DataFrame, refMod: Int = LmRefMod): DataFrame = {
    require(refMod >= 1, s"refMod must be >= 1, got $refMod")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val lm = toks.filter(col("doc_id") % refMod === 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // N + D + 1 in one broadcast row: token mass + vocab size + OOV pool
    val tot = lm.agg((sum(col("c")) + count(lit(1)) + lit(1L)).as("denom"))
    val bits =
      (length(bin(expr("denom div (coalesce(c, 0L) + 1L)"))) - 1).cast("long")
    toks.join(broadcast(lm), Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), bits.as("tok_bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("tok_bits")).as("bits"))
      .select(col("doc_id"), col("n_tokens"), col("bits"),
        expr("bits div n_tokens").as("bits_per_token"))
      .orderBy(col("doc_id"))
  }

  /** td22 parameters — single source for the engine defaults AND the
    * generated oracle SQL (the HeadVocabSize pattern): the word-frequency
    * dictionary cut and the number of greedy merges learned.
    */
  val BpeDictSize: Int = 512
  val BpeMerges: Int = 8
  /** Dictionary admission pattern: plain lowercase words only, so merge
    * symbols can never contain the `|` delimiter the oracle's
    * string-rendering of a symbol sequence relies on. End-anchored with
    * `\z` (absolute end of input), not `$`: Java's `$` also matches
    * BEFORE a final line terminator while RE2's does not, so a
    * `$`-anchored admission would accept "abc\n" in the engine and
    * reject it in the oracle — unreachable through the tokenizer (tokens
    * cannot contain whitespace) but divergence-proof against any future
    * caller (the dd20 lesson, applied preemptively; both engines support
    * `\z` with identical semantics).
    */
  val BpeWordPattern: String = "^[a-z]+\\z"

  /** td22 — BPE merge-table training (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units"): learn the
    * first `nMerges` byte-pair-encoding merges over the corpus — the
    * tokenizer-training step every LLM data pipeline runs before anything
    * downstream can count a "token". The published algorithm operates on
    * the WORD-FREQUENCY DICTIONARY, not the corpus: each word becomes a
    * symbol sequence (initially its characters), and each step merges the
    * adjacent symbol pair with the highest corpus-weighted count, ties
    * broken lexicographically on (left, right) so the learned table is a
    * deterministic property of the corpus.
    *
    * Scale: the ONE data-scaled stage is the word-count aggregate
    * (map-side-combined, the td8 shape) topped by TakeOrderedAndProject
    * for the (count DESC, word ASC) dictionary cut; the merge loop runs
    * over that BOUNDED dict (≤ `dictSize` rows — dict-scale is the
    * published algorithm's working set; Sennrich's reference
    * implementation trains on exactly this dict). The collect here is a
    * bounded-cardinality site (≤ 512 rows) like the sim5 centroid
    * collects; when the dict must outgrow the driver (million-type
    * multilingual vocabularies) the documented escape hatch is running
    * each step's pair count as a distributed aggregate over the dict
    * table — same recurrence, one tiny job per merge.
    *
    * Fully oracle-HASHABLE despite the sequential recurrence: counts are
    * exact BIGINTs, the argmax is a total order, and merge application is
    * greedy leftmost non-overlapping — which the DuckDB twin reproduces
    * with one `replace('|l||r|' → '|lr|')` per step over a
    * delimiter-enclosed symbol rendering (the sa9 recursive-oracle
    * discipline: same recurrence, independent formulation).
    */
  def bpeMerges(spark: SparkSession, docs: DataFrame,
      dictSize: Int = BpeDictSize, nMerges: Int = BpeMerges): DataFrame = {
    import spark.implicits._
    trainBpeMerges(docs, dictSize, nMerges)
      .toDF("step", "left_sym", "right_sym", "merged_sym", "pair_count")
      .orderBy(col("step"))
  }

  /** The td22 training recurrence as a local value — the merge table
    * itself, for callers that APPLY it rather than report it: td26's
    * corpus encode and st25's streaming gate inline these ≤ `nMerges`
    * (left, right) pairs as replace-literals (the st18 frozen-artifact
    * handoff). Shared so the applied table is BY CONSTRUCTION the one
    * td22 reports — a drifted re-derivation would hash-mismatch both.
    */
  private[graft] def trainBpeMerges(docs: DataFrame,
      dictSize: Int = BpeDictSize, nMerges: Int = BpeMerges)
      : Seq[(Long, String, String, String, Long)] = {
    // bounded-cardinality collect: <= dictSize (512) (word, count) rows
    val dictRows = docs.select(explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").rlike(BpeWordPattern))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(dictSize)
      .collect()
    var dict: Array[(Array[String], Long)] =
      dictRows.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    while (step <= nMerges) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        // argmax with the oracle's total order: count DESC, left, right
        val ((l, r), cnt) =
          counts.minBy { case ((pl, pr), c) => (-c, pl, pr) }
        merges += ((step.toLong, l, r, l + r, cnt))
        dict = dict.map { case (syms, c) =>
          // greedy leftmost non-overlapping merge — the replace() twin
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
      step += 1
    }
    merges.result()
  }

  /** td26 — BPE tokenizer APPLICATION: the missing sequel to td22 — a
    * pipeline trains a tokenizer once, then tokenizes every document
    * with it (token accounting is what sequence packing, billing and
    * context-length curricula all consume). The ≤ `nMerges` trained
    * merges inline as literal (search, replace) pairs over the same
    * delimiter-enclosed symbol rendering the td22 oracle uses
    * (`|c||h||a||t|`), so applying a merge is one `replace` whose
    * matches are exactly the greedy leftmost non-overlapping
    * occurrences — the engine and the SQL twin share one formulation.
    * Per doc: dictionary-admissible word count, total BPE symbol count
    * after all merges, and their r6 ratio (tokens per word — the
    * compression the tokenizer achieves; NULL for word-free docs).
    *
    * Scale: encode is MAP-ONLY — per word one char-render regexp, a
    * constant chain of codegen'd `replace` calls and a length
    * difference, summed per doc by one `aggregate` HOF. No explode, no
    * join, no shuffle (the verify `orderBy` aside): the ideal 100 TB
    * shape, source throughput on every executor. The trained table is
    * a bounded artifact (≤ `nMerges` tiny strings) via the shared
    * [[trainBpeMerges]] recurrence — the sim7/st18 batch-artifact
    * handoff, never a vocab-scale collect.
    */
  def bpeEncode(spark: SparkSession, docs: DataFrame,
      dictSize: Int = BpeDictSize, nMerges: Int = BpeMerges): DataFrame = {
    val pairs = trainBpeMerges(docs, dictSize, nMerges)
      .map { case (_, l, r, _, _) => (l, r) }
    val words = filter(tokens(col("text")), w => w.rlike(BpeWordPattern))
    docs
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        aggregate(col("ws"), lit(0L),
          (acc, w) => acc + bpeSymCount(w, pairs)).as("n_bpe_tokens"))
      .withColumn("bpe_ratio", r6(col("n_bpe_tokens").cast("double") /
        nullif(col("n_words").cast("double"), lit(0.0))))
      .orderBy(col("doc_id"))
  }

  /** Symbol count of one word after applying `pairs` in training order —
    * the native [[graft.functions.BpeSymCount]] expression (greedy
    * leftmost non-overlapping merges over code-point spans; one fused
    * JVM pass, codegen'd). Replaces the rendered-string chain (per-char
    * regexp + one allocating `replace` per merge, per word OCCURRENCE)
    * that was the registry's largest 100×-scale constant; the DuckDB
    * oracles keep the replace-chain formulation, so the two stay
    * hash-proven equal. Shared by td26 and st25.
    */
  private[graft] def bpeSymCount(
      w: Column, pairs: Seq[(String, String)]): Column =
    call_function("bpe_sym_count", w,
      lit(pairs.map { case (l, r) => s"$l:$r" }.mkString(",")))

  /** The td22 oracle, generated from the SAME (dictSize, nMerges)
    * defaults: one (pairs, argmax, replace) CTE triple per merge step —
    * the sim5 unrolled-iteration pattern. Symbol sequences render as
    * `|a||b||c|` (every symbol delimiter-enclosed), so the merge is one
    * literal `replace` whose matches are exactly the greedy leftmost
    * non-overlapping occurrences; an empty argmax (no pairs left)
    * coalesces to a never-occurring chr(1) pattern = identity.
    *
    * Every chained CTE is MATERIALIZED: d_m is referenced by both
    * p_{m+1} and d_{m+1} (and a_m twice), so the default inlining
    * re-evaluates the chain EXPONENTIALLY in the step count — 8 steps
    * inlined is ~2⁸ corpus scans and ran for minutes; materialized,
    * each step is one pass over the bounded dict.
    */
  private def bpeOracleSql(dictSize: Int, nMerges: Int): String = {
    val unions = (1 to nMerges).map(m =>
      s"SELECT step, l AS left_sym, r AS right_sym, mg AS merged_sym, " +
        s"cnt AS pair_count FROM a$m").mkString("\nUNION ALL\n")
    "WITH " + bpeCtePrefix(dictSize, nMerges) + "\n" + unions +
      "\nORDER BY step"
  }

  /** The td22 training chain as a reusable CTE body (no leading WITH):
    * word dictionary → d0 symbol rendering → one (pairs, argmax,
    * replace) MATERIALIZED triple per step, leaving a1..a{nMerges} as
    * the learned merge table. Shared by the td22 oracle, td26's encode
    * oracle and st25's gate oracle (with `docWhere` restricting the
    * training corpus to the frozen history split) — the oracle-side
    * mirror of [[trainBpeMerges]] being shared on the engine side.
    */
  private[graft] def bpeCtePrefix(dictSize: Int, nMerges: Int,
      docWhere: String = ""): String = {
    val base =
      s"""t AS (SELECT unnest($toksSql) AS tok FROM documents $docWhere),
         |w AS (SELECT tok, count(*) AS c FROM t
         |  WHERE regexp_matches(tok, '$BpeWordPattern') GROUP BY tok),
         |d0 AS MATERIALIZED (SELECT tok, c, '|' || array_to_string(
         |    [substring(tok, i, 1) FOR i IN generate_series(1, length(tok))],
         |    '||') || '|' AS s
         |  FROM (SELECT tok, c,
         |      row_number() OVER (ORDER BY c DESC, tok) AS rn FROM w) rw
         |  WHERE rn <= $dictSize)""".stripMargin
    val steps = (1 to nMerges).map { m =>
      val prev = s"d${m - 1}"
      s"""p$m AS MATERIALIZED (SELECT l, r, CAST(sum(c) AS BIGINT) AS cnt FROM (
         |    SELECT c, syms[i] AS l, syms[i + 1] AS r
         |    FROM (SELECT c, string_split(substring(s, 2, length(s) - 2),
         |        '||') AS syms FROM $prev) sy,
         |      LATERAL unnest(CASE WHEN len(syms) >= 2
         |        THEN generate_series(1, len(syms) - 1)
         |        ELSE CAST([] AS BIGINT[]) END) u(i)) pp
         |  GROUP BY l, r),
         |a$m AS MATERIALIZED (SELECT CAST($m AS BIGINT) AS step, l, r, l || r AS mg, cnt
         |  FROM p$m ORDER BY cnt DESC, l, r LIMIT 1),
         |d$m AS MATERIALIZED (SELECT tok, c, replace(s,
         |    coalesce((SELECT '|' || l || '||' || r || '|' FROM a$m), chr(1)),
         |    coalesce((SELECT '|' || l || r || '|' FROM a$m), chr(1))) AS s
         |  FROM $prev)""".stripMargin
    }
    base + ",\n" + steps.mkString(",\n")
  }

  /** The td26 oracle: the SAME training chain as td22 (shared
    * [[bpeCtePrefix]] — encode can never drift from training), then the
    * corpus re-rendered per (doc, word) with the a1..aN merges applied
    * as the identical nested replace chain, symbol counts as half the
    * delimiter count, LEFT-joined back so word-free docs emit (0, 0,
    * NULL).
    */
  private[graft] def bpeEncodeOracleSql(dictSize: Int, nMerges: Int,
      docWhere: String = "", arrivalWhere: String = ""): String = {
    val chain = (1 to nMerges).foldLeft(
      "regexp_replace(w, '(.)', '|\\1|', 'g')") { (s, m) =>
      s"""replace($s,
         |    coalesce((SELECT '|' || l || '||' || r || '|' FROM a$m), chr(1)),
         |    coalesce((SELECT '|' || l || r || '|' FROM a$m), chr(1)))""".stripMargin
    }
    s"""${bpeCtePrefix(dictSize, nMerges, docWhere)},
       |enc AS (SELECT doc_id, $chain AS s
       |  FROM (SELECT doc_id, unnest(${tokensSql("text")}) AS w
       |        FROM documents $arrivalWhere) q
       |  WHERE regexp_matches(w, '$BpeWordPattern')),
       |ag AS (SELECT doc_id, count(*) AS nw,
       |    CAST(sum((length(s) - length(replace(s, '|', ''))) // 2)
       |      AS BIGINT) AS nb
       |  FROM enc GROUP BY doc_id)""".stripMargin
  }

  /** td23 — vocabulary-GROWTH curve (the Heaps-law diagnostic): distinct
    * token types accumulated as the corpus is consumed in doc_id order,
    * reported at `nBuckets` equal-width id checkpoints with cumulative
    * doc and token mass. The corpus-health read every ingest pipeline
    * wants before spending on dedup: a healthy crawl grows types ~
    * tokens^β (Heaps), while a flattening curve means the tail of the
    * feed is re-serving the head (mirrors, boilerplate, a crawler loop)
    * — duplication visible WITHOUT any pairwise work.
    *
    * Exact and hash-gated: a type's first appearance is `min(doc_id)`
    * per token (one map-side-combined aggregate — the "new type" event
    * is a property of the id order, not of partitioning), bucketed by
    * exact integer floor-division against the broadcast (min, max) id
    * range; the cumulative sums run over the BOUNDED bucket frame
    * (nBuckets rows — the q07 over-aggregate window discipline, never
    * fact rows). Two data-scaled passes (per-doc token counts map-only;
    * the token explode feeding the min), no corpus sort, no skew
    * surface.
    */
  /** td23 checkpoint count — single source for the engine default AND the
    * generated oracle literals (the HeadVocabSize pattern).
    */
  val VocabGrowthBuckets: Int = 10

  def vocabGrowth(docs: DataFrame, nBuckets: Int = VocabGrowthBuckets): DataFrame = {
    val ids = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val decile = expr(s"(doc_id - lo) * $nBuckets div (hi - lo + 1)")
    val docStats = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .crossJoin(broadcast(ids))
      .select(decile.as("decile"), col("n_toks"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("new_docs"), sum(col("n_toks")).as("new_tokens"))
    val firstSeen = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("doc_id"))
      .crossJoin(broadcast(ids))
      .select(decile.as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docStats.join(firstSeen, Seq("decile"), "left")
      .na.fill(0L, Seq("new_types"))
      .select(col("decile"),
        sum(col("new_docs")).over(w).as("n_docs_cum"),
        sum(col("new_tokens")).over(w).as("n_tokens_cum"),
        col("new_types"),
        sum(col("new_types")).over(w).as("cum_types"))
      .orderBy(col("decile"))
  }

  /** td24 — per-source DISTRIBUTION-DRIFT monitor: the exact L1 (total
    * variation ×2) distance between each source's token distribution
    * and the whole-corpus distribution — the feed-health alarm that
    * fires when one ingest feed starts serving something different
    * (spam flood, language shift, scraper breakage) BEFORE any
    * document-level screen sees it. Complements td20 (pairwise set
    * overlap between feeds) and td18 (target-ratio scoring): this is
    * each feed vs the mixture it belongs to, frequency-weighted.
    *
    * Exact and hash-gated by the td11/td18 rational rule: with o_t the
    * source's count, c_t the corpus count, n_s and N the totals,
    *   L1 = Σ_t |o_t/n_s − c_t/N| = (A + n_s·(N − B)) / (n_s·N)
    * where A = Σ_{t∈s} |o_t·N − c_t·n_s| and B = Σ_{t∈s} c_t — the
    * absent-token tail collapses CLOSED-FORM into n_s·(N − B), so the
    * sum runs only over the source's OWN tokens, never source × vocab.
    * A and B are exact DECIMAL(38,0) integer sums (order-free); one
    * r6-rounded division at the end. Range [0, 2).
    *
    * Scale: one (source, token) map-side-combined aggregate feeds
    * everything; the corpus table (vocab-scale) joins it on token with
    * AQE skew handling; per-source rollup + two broadcast one-row
    * totals. Two data-scaled shuffles, no window over facts.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("o"))
    val ct = st.groupBy(col("tok")).agg(sum(col("o")).as("c"))
    val ns = st.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
    val tot = ct.agg(sum(col("c")).cast("decimal(38,0)").as("n_total"))
    st.join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_tokens"),
        sum(abs(col("o").cast("decimal(38,0)") * col("n_total") -
          col("c").cast("decimal(38,0)") * col("n_s"))).as("a_sum"),
        sum(col("c").cast("decimal(38,0)")).as("b_sum"),
        max(col("n_total")).as("n_total"))
      .select(col("source"), col("n_tokens"),
        r6(((col("a_sum") +
          col("n_tokens").cast("decimal(38,0)") *
            (col("n_total") - col("b_sum"))).cast("double")) /
          (col("n_tokens").cast("double") * col("n_total").cast("double")))
          .as("drift_l1"))
      .orderBy(col("source"))
  }

  /** td25 — the cross-source overlap matrix at SKETCH scale: td20's
    * documented escape hatch ("at thousands of per-domain feeds the
    * same matrix runs over dd4's MinHash signatures"), SHIPPED. Each
    * source gets ONE k-component MinHash signature of the union of its
    * documents' shingle sets — computed as the component-wise MIN of
    * the per-document native signatures (min distributes over union, so
    * the doc-level `minhash_sig` pass is reused verbatim) — and every
    * source pair's Jaccard is estimated by the matching-component
    * fraction. Unlike the engine-RNG sketch family this is FULLY
    * hash-gated: the signature is a deterministic md5-derived property
    * of the corpus (dd4's discipline), so the estimate itself
    * cross-engine hash-matches; the ESTIMATOR-vs-exact error is what
    * the spec bounds.
    *
    * Scale: the signature table is S×k cells built by one
    * map-side-combined aggregate over the exploded doc signatures —
    * per-source state is k minima however large the source; the pair
    * join fans on (i, m) matches only, bounded by S²k, never corpus².
    * This is what replaces td20 when S reaches the thousands: td20's
    * exact postings join is corpus-sized, this never touches text
    * again after the one signature pass.
    */
  def sourceOverlapSketch(
      docs: DataFrame, k: Int = 32, n: Int = 3): DataFrame = {
    val sig = docs
      .select(col("source"),
        graft.operators.Dedup.shinglesOf(tokens(col("text")), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("source"),
        posexplode(call_function("minhash_sig", col("sh"), lit(k)))
          .as(Seq("i", "m")))
      .groupBy(col("source"), col("i")).agg(min(col("m")).as("m"))
    sig.as("a").join(sig.as("b"),
        col("a.i") === col("b.i") && col("a.m") === col("b.m") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_match"))
      .select(col("source_a"), col("source_b"), col("n_match"),
        r6(col("n_match").cast("double") / lit(k.toDouble)).as("jaccard_est"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** td27 shared constants — single source for the engine defaults AND
    * the generated oracle literals (the HeadVocabSize pattern): the
    * head-vocabulary fit width and the head-mass cut.
    */
  val Td27FitV: Int = 128
  val Td27HeadK: Int = 10

  /** td27 — ZIPF-SLOPE corpus health fit: the log-log slope of the
    * token rank/frequency curve per source, the classic diagnostic for
    * corpus pathology (natural language sits near −1; template spam and
    * boilerplate flatten the head, OCR noise and deduplication failures
    * fatten the tail — Piantadosi 2014's review of Zipf's law is the
    * published frame). Shipped beside it: `head10_share`, the exact
    * fraction of each source's token mass carried by its top-10 types —
    * the one-number skew summary a mixture designer reads first.
    *
    * Hashability: a true least-squares over ln(rank)/ln(freq) is libm
    * and never oracle-exact (the td11/td18/td21 rational rule). The
    * shipped fit is the same regression over the EXACT INTEGER bit
    * quantization x = floorlog2(rank), y = floorlog2(freq) — td21's
    * `length(bin(n)) − 1` trick — so Σx, Σy, Σxy, Σx² are exact longs,
    * the slope is one correctly-rounded division of exact integers
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), and both engines land on the
    * identical double before the shared r6 grid. Whole-bit quantization
    * coarsens the fit identically in both engines and keeps the
    * diagnostic's monotone meaning (a flattened head still flattens the
    * bit-slope).
    *
    * Scale: the frequency table is one map-side-combined aggregate at
    * (source, token) grain; the rank cut `row_number ≤ V` over the
    * (source)-partitioned frequency order plans as WindowGroupLimit
    * (per-partition V-row heaps per source, the sa10 shape), so the
    * full vocabulary never sorts; everything after the cut is
    * (sources × V) rows. The head-mass denominator reuses the same
    * frequency table in a second bounded aggregate — no second pass
    * over text.
    */
  def zipfFit(
      docs: DataFrame, v: Int = Td27FitV, headK: Int = Td27HeadK): DataFrame = {
    val freq = docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("c").desc, col("tok"))
    val ranked = freq.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= v)
    def bits(c: Column): Column = (length(bin(c.cast("long"))) - 1).cast("long")
    val fit = ranked
      .select(col("source"), bits(col("rk")).as("x"), bits(col("c")).as("y"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_types"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val head = ranked.filter(col("rk") <= headK)
      .groupBy(col("source")).agg(sum(col("c")).as("hc"))
    val tot = freq.groupBy(col("source")).agg(sum(col("c")).as("tc"))
    // Explicit build sides: all three join inputs are per-source
    // aggregates (#sources rows — k-scale, all broadcastable), and with
    // no hint AQE picked the build side from runtime stats that sat on
    // the borderline — the fit⋈head side flipped BuildLeft↔BuildRight
    // between same-code takes (r13–r17, the whitelist's
    // aqe-order-variance entry). Pinning the two enrichment sides makes
    // the plan deterministic and retires td27 from the variance
    // whitelist; semantically free since either side fits in a
    // broadcast at any corpus scale.
    fit.join(broadcast(head), Seq("source")).join(broadcast(tot), Seq("source"))
      .select(col("source"), col("n_types"),
        r6((col("n_types") * col("sxy") - col("sx") * col("sy")).cast("double")
          / nullif((col("n_types") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), lit(0.0))).as("zipf_slope"),
        r6(col("hc").cast("double") / col("tc").cast("double"))
          .as("head10_share"))
      .orderBy(col("source"))
  }

  /** td27's oracle: the identical integer-bit regression — generated
    * from the same constants, `//`-free (all products stay integral
    * until the single final division each side rounds to the r6 grid).
    */
  private[graft] def zipfFitOracleSql(
      v: Int = Td27FitV, headK: Int = Td27HeadK): String =
    s"""WITH tk AS (SELECT source, unnest(${tokensSql("text")}) AS tok
       |            FROM documents),
       |f AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY source, tok),
       |r AS (SELECT source, tok, c, row_number() OVER (PARTITION BY source
       |        ORDER BY c DESC, tok) AS rk FROM f),
       |p AS (SELECT source, CAST(length(bin(rk)) - 1 AS BIGINT) AS x,
       |        CAST(length(bin(c)) - 1 AS BIGINT) AS y
       |      FROM r WHERE rk <= $v),
       |s AS (SELECT source, count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |        SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM p GROUP BY source),
       |h AS (SELECT source, SUM(c) AS hc FROM r WHERE rk <= $headK
       |      GROUP BY source),
       |tot AS (SELECT source, SUM(c) AS tc FROM f GROUP BY source)
       |SELECT s.source, CAST(s.n AS BIGINT) AS n_types,
       |  round(CAST(s.n*s.sxy - s.sx*s.sy AS DOUBLE)
       |    / nullif(CAST(s.n*s.sxx - s.sx*s.sx AS DOUBLE), 0.0) * 1e6) / 1e6
       |    AS zipf_slope,
       |  round(CAST(h.hc AS DOUBLE) / CAST(tot.tc AS DOUBLE) * 1e6) / 1e6
       |    AS head10_share
       |FROM s JOIN h USING (source) JOIN tot USING (source)
       |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "td27_zipf_fit" -> ((s: SparkSession, d: String) =>
      zipfFit(Tables.documents(s, d))),
    "td26_bpe_encode" -> ((s: SparkSession, d: String) =>
      bpeEncode(s, Tables.documents(s, d))),
    "td25_source_overlap_sketch" -> ((s: SparkSession, d: String) =>
      sourceOverlapSketch(Tables.documents(s, d))),
    "td24_source_drift" -> ((s: SparkSession, d: String) =>
      sourceDrift(Tables.documents(s, d))),
    "td23_vocab_growth" -> ((s: SparkSession, d: String) =>
      vocabGrowth(Tables.documents(s, d))),
    "td22_bpe_merges" -> ((s: SparkSession, d: String) =>
      bpeMerges(s, Tables.documents(s, d))),
    "td21_lm_surprisal" -> ((s: SparkSession, d: String) =>
      lmSurprisal(Tables.documents(s, d))),
    "td20_source_overlap" -> ((s: SparkSession, d: String) =>
      sourceOverlap(Tables.documents(s, d))),
    "td19_oov_rate" -> ((s: SparkSession, d: String) =>
      oovRate(Tables.documents(s, d))),
    "td18_dsir_importance" -> ((s: SparkSession, d: String) =>
      dsirImportance(Tables.documents(s, d))),
    "td16_chunking" -> ((s: SparkSession, d: String) =>
      chunkDocs(Tables.documents(s, d))),
    "td17_dup_ngrams" -> ((s: SparkSession, d: String) =>
      dupNgrams(Tables.documents(s, d))),
    "td14_heavy_hitters" -> ((s: SparkSession, d: String) =>
      heavyHitters(Tables.documentsRebalanced(s, d))),
    "td1_text_stats" -> ((s: SparkSession, d: String) => textStats(Tables.documents(s, d))),
    "td2_lang_id" -> ((s: SparkSession, d: String) => langId(Tables.documents(s, d))),
    "td9_lang_id_script" -> ((s: SparkSession, d: String) => langIdScript(Tables.documents(s, d))),
    "td3_fingerprint" -> ((s: SparkSession, d: String) => fingerprints(Tables.documents(s, d))),
    "td4_token_counts" -> ((s: SparkSession, d: String) => tokenCounts(Tables.documents(s, d))),
    "td5_winnow_fingerprint" -> ((s: SparkSession, d: String) => winnowFingerprints(Tables.documentsRebalanced(s, d))),
    "td6_quality_filter" -> ((s: SparkSession, d: String) => qualityFilter(Tables.documents(s, d))),
    "td7_corpus_rollup" -> ((s: SparkSession, d: String) => corpusRollup(Tables.documents(s, d))),
    "td8_ngram_freq" -> ((s: SparkSession, d: String) => ngramFreq(Tables.documentsRebalanced(s, d))),
    "td10_repetition" -> ((s: SparkSession, d: String) => repetitionMetrics(Tables.documents(s, d))),
    "td11_doc_novelty" -> ((s: SparkSession, d: String) => docNovelty(Tables.documentsRebalanced(s, d))),
    "td12_pii_scan" -> ((s: SparkSession, d: String) => piiScan(Tables.documents(s, d))),
    "td13_bm25" -> ((s: SparkSession, d: String) => bm25(Tables.documents(s, d), Bm25Terms)),
    "td15_tfidf_keywords" -> ((s: SparkSession, d: String) =>
      tfidfKeywords(Tables.documentsRebalanced(s, d))))

  val oracles: Map[String, String] = Map(
    // the identical integer-bit regression, all-integral until one
    // final correctly-rounded division per column (td21's rational rule)
    "td27_zipf_fit" -> zipfFitOracleSql(),
    // dd4's signature chain (same base hash, same md5-drawn (a,b)) at
    // the SOURCE grain: min over the source's shingle union, then the
    // matching-component pair count — the whole estimate is a
    // deterministic property of the corpus, so it hash-matches
    "td25_source_overlap_sketch" ->
      s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
         |sh AS (SELECT source, unnest(list_distinct(
         |    [array_to_string(toks[i+1:i+3], ' ')
         |     FOR i IN range(len(toks)-2)])) AS s
         |  FROM t WHERE len(toks) >= 3),
         |h AS (SELECT source,
         |  ('0x' || substring(md5(s), 1, 13))::BIGINT % 2147483647 AS h FROM sh),
         |perm AS (SELECT i,
         |  ('0x' || substring(md5('mh-a:' || i), 1, 13))::BIGINT % 2147483646 + 1 AS a,
         |  ('0x' || substring(md5('mh-b:' || i), 1, 13))::BIGINT % 2147483647 AS b
         |  FROM range(32) r(i)),
         |sig AS (SELECT source, i, min((a * h + b) % 2147483647) AS m
         |  FROM h CROSS JOIN perm GROUP BY source, i),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS n_match
         |  FROM sig a JOIN sig b
         |    ON a.i = b.i AND a.m = b.m AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, n_match,
         |  round((CAST(n_match AS DOUBLE) / 32) * 1e6) / 1e6 AS jaccard_est
         |FROM p ORDER BY source_a, source_b""".stripMargin,
    // the same exact integer A/B sums (HUGEINT = the DECIMAL(38,0)
    // twin), the same closed-form absent-token tail, the same one
    // double division r6-rounded (decimal→double is correctly rounded
    // in both engines, the dsum convention)
    "td24_source_drift" ->
      s"""WITH st AS (SELECT source, tok, count(*) AS o FROM
         |    (SELECT source, unnest($toksSql) AS tok FROM documents) u
         |  GROUP BY 1, 2),
         |ct AS (SELECT tok, sum(o) AS c FROM st GROUP BY tok),
         |ns AS (SELECT source, sum(o) AS n_s FROM st GROUP BY source),
         |tot AS (SELECT sum(c) AS n_total FROM ct),
         |agg AS (SELECT source,
         |    max(n_s) AS n_tokens,
         |    sum(abs(o::HUGEINT * n_total - c::HUGEINT * n_s)) AS a_sum,
         |    sum(c::HUGEINT) AS b_sum,
         |    max(n_total) AS n_total
         |  FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN tot
         |  GROUP BY source)
         |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  round((CAST(a_sum + n_tokens::HUGEINT * (n_total - b_sum) AS DOUBLE)
         |    / (CAST(n_tokens AS DOUBLE) * CAST(n_total AS DOUBLE))) * 1e6) / 1e6
         |    AS drift_l1
         |FROM agg ORDER BY source""".stripMargin,
    // the same min-doc first-appearance rule, the same exact integer
    // floor-div bucketing against the (min, max) id range, the same
    // bounded cumulative frame
    "td23_vocab_growth" ->
      s"""WITH ids AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
         |d AS (SELECT doc_id, len($toksSql) AS n_toks FROM documents),
         |ds AS (SELECT (doc_id - lo) * $VocabGrowthBuckets // (hi - lo + 1) AS decile,
         |    count(*) AS new_docs, sum(n_toks) AS new_tokens
         |  FROM d, ids GROUP BY 1),
         |fs AS (SELECT (doc_id - lo) * $VocabGrowthBuckets // (hi - lo + 1) AS decile,
         |    count(*) AS new_types
         |  FROM (SELECT tok, min(doc_id) AS doc_id FROM
         |      (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |    GROUP BY tok) f, ids
         |  GROUP BY 1)
         |SELECT ds.decile,
         |  CAST(sum(new_docs) OVER w AS BIGINT) AS n_docs_cum,
         |  CAST(sum(new_tokens) OVER w AS BIGINT) AS n_tokens_cum,
         |  CAST(coalesce(new_types, 0) AS BIGINT) AS new_types,
         |  CAST(sum(coalesce(new_types, 0)) OVER w AS BIGINT) AS cum_types
         |FROM ds LEFT JOIN fs USING (decile)
         |WINDOW w AS (ORDER BY ds.decile
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY ds.decile""".stripMargin,
    // the same dict cut, the same greedy recurrence unrolled one CTE
    // triple per merge step (see bpeOracleSql), generated from the
    // shared (BpeDictSize, BpeMerges) defaults
    "td22_bpe_merges" -> bpeOracleSql(BpeDictSize, BpeMerges),
    // td22's training chain verbatim (shared CTE builder), the corpus
    // re-encoded with the learned a1..aN merges as the same nested
    // replace chain; word-free docs LEFT-join to (0, 0, NULL)
    "td26_bpe_encode" ->
      s"""WITH ${bpeEncodeOracleSql(BpeDictSize, BpeMerges)}
         |SELECT d.doc_id, CAST(coalesce(ag.nw, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(ag.nb, 0) AS BIGINT) AS n_bpe_tokens,
         |  round((CAST(ag.nb AS DOUBLE) / ag.nw) * 1e6) / 1e6 AS bpe_ratio
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // the same holdout slice, the same add-one LM, the same exact
    // integer floorlog2 via length(bin(x))-1 (// = DuckDB integral
    // divide); denom cast to BIGINT because DuckDB sums BIGINT into
    // HUGEINT, which bin() renders at 128-bit width
    "td21_lm_surprisal" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |lm AS (SELECT tok, count(*) AS c FROM t
         |  WHERE doc_id % $LmRefMod = 0 GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) + count(*) + 1 AS BIGINT) AS denom FROM lm)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |  CAST(sum(length(bin(denom // (coalesce(c, 0) + 1))) - 1) AS BIGINT)
         |    AS bits,
         |  CAST(sum(length(bin(denom // (coalesce(c, 0) + 1))) - 1)
         |    // count(*) AS BIGINT) AS bits_per_token
         |FROM t LEFT JOIN lm ON t.tok = lm.tok CROSS JOIN tot
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // the same distinct postings, the same token-keyed pair join, the
    // same three-BIGINT Jaccard with the r6 division
    "td20_source_overlap" ->
      s"""WITH p AS (SELECT DISTINCT source, tok FROM
         |  (SELECT source, unnest($toksSql) AS tok FROM documents)),
         |s AS (SELECT source, count(*) AS n_vocab FROM p GROUP BY source),
         |i AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS n_common
         |  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.source_a, i.source_b, i.n_common,
         |  sa.n_vocab + sb.n_vocab - i.n_common AS n_union,
         |  round((CAST(i.n_common AS DOUBLE)
         |    / (sa.n_vocab + sb.n_vocab - i.n_common)) * 1e6) / 1e6 AS jaccard
         |FROM i JOIN s sa ON sa.source = i.source_a
         |       JOIN s sb ON sb.source = i.source_b
         |ORDER BY i.source_a, i.source_b""".stripMargin,
    // vocabulary cut via the same total order (count DESC, token ASC);
    // the rate division mirrors r6 exactly; the vocab-size literal is
    // generated from the shared HeadVocabSize default
    "td19_oov_rate" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |v AS (SELECT tok FROM (
         |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
         |    FROM t GROUP BY tok) WHERE rn <= $HeadVocabSize)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  round((CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE)) * 1e6) / 1e6 AS oov_rate
         |FROM t LEFT JOIN v ON t.tok = v.tok
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // the same hashed-bucket substrate, the same add-one-smoothed
    // integer floor-div ratio on the 1e-6 grid (HUGEINT = the
    // DECIMAL(38,0) twin), the same order-free integer sums; BIGINT
    // casts keep pandas from widening HUGEINT to float on fetch
    "td18_dsir_importance" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |tb AS (SELECT doc_id, lang,
         |    ('0x' || substring(md5('dsir-v1:' || tok), 1, 13))::BIGINT % 1024 AS b,
         |    count(*) AS c
         |  FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM t)
         |  GROUP BY 1, 2, 3),
         |qs AS (SELECT b, sum(c) AS qc FROM tb GROUP BY b),
         |ts AS (SELECT b, sum(c) AS tc FROM tb WHERE lang = 'en' GROUP BY b),
         |tot AS (SELECT sum(c) AS nq,
         |    sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS nt FROM tb),
         |r AS (SELECT qs.b,
         |    (1000000::HUGEINT * (coalesce(tc, 0) + 1) * (nq + 1024))
         |      // ((qc + 1)::HUGEINT * (nt + 1024)) AS w
         |  FROM qs LEFT JOIN ts ON qs.b = ts.b CROSS JOIN tot)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(c * w) AS BIGINT) AS importance,
         |  CAST(sum(c * w) // sum(c) AS BIGINT) AS imp_per_token
         |FROM tb JOIN r USING (b)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // identical 0-based gram starts, identical (cnt DESC, gram) argmax,
    // identical linear interval-merge coverage fold (span i adds
    // least(n, s_i - s_{i-1}); first span adds n), identical
    // nullif-guarded single-division fractions — exact-arithmetic
    "td17_dup_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |g2 AS (SELECT doc_id, i,
         |    array_to_string(toks[i+1:i+2], ' ') AS gram
         |  FROM b, unnest(CASE WHEN n >= 2 THEN generate_series(0, n - 2)
         |    ELSE CAST([] AS BIGINT[]) END) u(i)),
         |c2 AS (SELECT doc_id, gram, count(*) AS cnt,
         |    list_sort(list(i)) AS starts
         |  FROM g2 GROUP BY doc_id, gram),
         |top2 AS (SELECT doc_id, gram, starts FROM (
         |    SELECT doc_id, gram, starts,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY cnt DESC, gram) AS rn
         |    FROM c2 WHERE cnt >= 2) WHERE rn = 1),
         |g5 AS (SELECT doc_id, i,
         |    array_to_string(toks[i+1:i+5], ' ') AS gram
         |  FROM b, unnest(CASE WHEN n >= 5 THEN generate_series(0, n - 5)
         |    ELSE CAST([] AS BIGINT[]) END) u(i)),
         |c5 AS (SELECT doc_id, gram, count(*) AS cnt, list(i) AS starts
         |  FROM g5 GROUP BY doc_id, gram),
         |d5 AS (SELECT doc_id, list_sort(flatten(list(starts))) AS dstarts
         |  FROM c5 WHERE cnt >= 2 GROUP BY doc_id),
         |j AS (SELECT b.doc_id, b.n, t2.gram AS top_gram,
         |    CASE WHEN t2.starts IS NOT NULL THEN
         |      CAST(list_sum(list_transform(t2.starts, (s, i) ->
         |        CASE WHEN i = 1 THEN 2
         |             ELSE least(2, s - t2.starts[i-1]) END)) AS BIGINT)
         |    ELSE 0 END AS cov2,
         |    CASE WHEN d5.dstarts IS NOT NULL THEN
         |      CAST(list_sum(list_transform(d5.dstarts, (s, i) ->
         |        CASE WHEN i = 1 THEN 5
         |             ELSE least(5, s - d5.dstarts[i-1]) END)) AS BIGINT)
         |    ELSE 0 END AS cov5
         |  FROM b LEFT JOIN top2 t2 USING (doc_id)
         |         LEFT JOIN d5 USING (doc_id))
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, top_gram,
         |  cov2 / nullif(n, 0) AS top2_frac,
         |  cov5 / nullif(n, 0) AS dup5_frac,
         |  (cov2 / nullif(n, 0) > 0.2 OR cov5 / nullif(n, 0) > 0.15)
         |    AS repetitive
         |FROM j ORDER BY doc_id""".stripMargin,
    // the identical start sequence (0, step, 2·step … < n_tokens), the
    // identical 1-based inclusive token slice; chunk_id = start / step
    "td16_chunking" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
         |  CAST(len(toks[start+1:start+64]) AS BIGINT) AS chunk_tokens,
         |  array_to_string(toks[start+1:start+64], ' ') AS chunk_text
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    // the naive formulation IS the oracle: per-(doc,term) counts, doc
    // frequencies, score = (tf*N)/df — one long product, one IEEE
    // division, both engines identical; ties rank by term ascending
    "td15_tfidf_keywords" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         |  (tf.tf * n.n) / dft.df AS score,
         |  row_number() OVER (PARTITION BY tf.doc_id
         |    ORDER BY (tf.tf * n.n) / dft.df DESC, tf.term) AS rk
         |  FROM tf JOIN dft USING (term) CROSS JOIN n)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |  round(score * 1e6) / 1e6 AS score
         |FROM s WHERE rk <= 3 ORDER BY doc_id, score DESC, term""".stripMargin,
    "td1_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, text, len(toks) AS n_tokens,
         |        ${stopCountSql("toks")} AS n_stop,
         |        length(regexp_replace(text, '$WsClass', '', 'g')) AS len_nonws FROM t)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  CAST(len_nonws AS BIGINT) AS len_nonws,
         |  round(len_nonws / nullif(n_tokens, 0), 6) AS avg_token_len,
         |  round(n_stop / nullif(n_tokens, 0), 6) AS stop_ratio,
         |  ${qualityScoreSql("n_tokens", "n_stop")} AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,
    "td2_lang_id" -> {
      val rounded = LangStops.map(_._1)
        .map(l => s"round(r_$l * 1e6) / 1e6 AS ${l}_ratio").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |$wordRatioDefsSql
         |FROM t)
         |SELECT doc_id, $rounded,
         |  ${wordPredSql(0.15)} AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "td9_lang_id_script" -> {
      val scriptDefs = ScriptProfiles.scripts.map { case (name, _) =>
        s"len(regexp_extract_all(text, '${ScriptProfiles.classLiteral(name)}')) AS c_$name"
      }.mkString(",\n")
      val ratioDefs = ScriptProfiles.scripts.map { case (name, _) =>
        s"c_$name / nullif(c_nonws, 0) AS ${name}_r"
      }.mkString(",\n")
      val rounded = ScriptProfiles.scripts.map { case (name, _) =>
        s"round(${name}_r * 1e6) / 1e6 AS ${name}_ratio"
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |$scriptDefs,
         |  length(regexp_replace(text, '$WsClass', '', 'g')) AS c_nonws,
         |$wordRatioDefsSql
         |FROM t),
         |p AS (SELECT doc_id,
         |$ratioDefs,
         |  ${wordPredSql(0.15)} AS word_pred
         |FROM s),
         |q AS (SELECT *,
         |  CASE WHEN hangul_r >= $ScriptMin THEN 'ko'
         |       WHEN han_r + kana_r >= $ScriptMin AND kana_r >= $KanaMin THEN 'ja'
         |       WHEN han_r >= $ScriptMin THEN 'zh'
         |       WHEN thai_r >= $ScriptMin THEN 'th'
         |       ELSE 'latn' END AS script_pred
         |FROM p)
         |SELECT doc_id,
         |$rounded,
         |  script_pred,
         |  CASE WHEN script_pred != 'latn' THEN script_pred ELSE word_pred END AS lang_pred
         |FROM q ORDER BY doc_id""".stripMargin
    },
    "td3_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(coalesce(array_to_string(list_sort(${tokensSql(asciiLowerSql("text"))}), ' '), '')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "td4_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$WordPattern')) AS BIGINT) AS word_tokens,
         |  CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "td6_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  len(toks) BETWEEN 20 AND 1000 AS r_n_tokens,
         |  (length(regexp_replace(text, '$WsClass', '', 'g')) * 1.0 / nullif(len(toks), 0)) BETWEEN 3.0 AND 10.0 AS r_token_len,
         |  len(list_filter(toks, x -> x IN $stopSql)) >= 2 AS r_stopwords,
         |  (length(regexp_replace(text, '$SymClass', '', 'g')) * 1.0 / greatest(length(text), 1)) <= 0.1 AS r_symbols,
         |  (len(list_distinct(toks)) * 1.0 / nullif(len(toks), 0)) >= 0.3 AS r_distinct
         |FROM t)
         |SELECT *, r_n_tokens AND r_token_len AND r_stopwords AND r_symbols AND r_distinct AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "td7_corpus_rollup" ->
      s"""WITH t AS (SELECT lang, source, text, $toksSql AS toks FROM documents),
         |s AS (SELECT lang, source, len(toks) AS n,
         |  len(list_filter(toks, x -> x IN $stopSql)) AS n_stop,
         |  (len(toks) BETWEEN 20 AND 1000)
         |    AND ((length(regexp_replace(text, '$WsClass', '', 'g')) * 1.0 / nullif(len(toks), 0)) BETWEEN 3.0 AND 10.0)
         |    AND (len(list_filter(toks, x -> x IN $stopSql)) >= 2)
         |    AND ((length(regexp_replace(text, '$SymClass', '', 'g')) * 1.0 / greatest(length(text), 1)) <= 0.1)
         |    AND ((len(list_distinct(toks)) * 1.0 / nullif(len(toks), 0)) >= 0.3) AS keep,
         |  round(least(1.0, len(toks) / 20.0) * (1.0 - len(list_filter(toks, x -> x IN $stopSql)) * 1.0 / nullif(len(toks), 0)) * 1e6) / 1e6 AS q
         |FROM t)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(n) AS BIGINT) AS total_tokens,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  round(CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) / COUNT(q) * 1e6) / 1e6 AS avg_quality
         |FROM s GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    "td8_ngram_freq" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(toks[i+1:i+3], ' ') FOR i IN range(len(toks)-2)]) AS shingles FROM t),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh)
        |SELECT s AS ngram, count(*) AS df FROM ex GROUP BY 1
        |ORDER BY df DESC, ngram LIMIT 100""".stripMargin,
    "td11_doc_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct([array_to_string(toks[i+1:i+3], ' ') FOR i IN range(len(toks)-2)]) AS shingles FROM t),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |dfc AS (SELECT s, count(*) AS df FROM ex GROUP BY s)
         |SELECT doc_id, count(*) AS n_shingles,
         |  round(CAST(SUM(CAST(df AS DECIMAL(38,6))) AS DOUBLE) / COUNT(df) * 1e6) / 1e6 AS mean_df,
         |  round(CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / df AS DECIMAL(38,6))) AS DOUBLE) / COUNT(df) * 1e6) / 1e6 AS novelty
         |FROM ex JOIN dfc USING (s)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "td10_repetition" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
        |g AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(c) AS n_lines,
        |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
        |  sum(length(line) * c) AS chars,
        |  sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END) AS dup_chars
        |FROM g GROUP BY 1)
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  round(dup_lines / nullif(n_lines, 0) * 1e6) / 1e6 AS dup_line_frac,
        |  round(dup_chars / nullif(chars, 0) * 1e6) / 1e6 AS dup_char_frac
        |FROM a ORDER BY doc_id""".stripMargin,
    "td12_pii_scan" ->
      s"""WITH r AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '$EmailPattern')) AS n_emails,
         |  len(regexp_extract_all(text, '$Ipv4Pattern')) AS n_ipv4,
         |  len(regexp_extract_all(text, '$PhonePattern')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailPattern', '<EMAIL>', 'g'),
         |    '$Ipv4Pattern', '<IP>', 'g'),
         |    '$PhonePattern', '<PHONE>', 'g')) AS redacted_fp
         |  FROM documents)
         |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         |  CAST(n_ipv4 AS BIGINT) AS n_ipv4, CAST(n_phones AS BIGINT) AS n_phones,
         |  redacted_fp, n_emails = 0 AND n_ipv4 = 0 AND n_phones = 0 AS pii_free
         |FROM r ORDER BY doc_id""".stripMargin,
    "td13_bm25" -> {
      val tfDefs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(toks) - len(list_filter(toks, x -> x != '$t')) AS tf_$i"
      }.mkString(",\n")
      val dfDefs = Bm25Terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
        .mkString(",\n")
      val termSql = Bm25Terms.indices.map { i =>
        s"(CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5)" +
          s" * tf_$i * CAST($Bm25K1Plus1 AS DOUBLE)" +
          s" / (tf_$i + CAST($Bm25K1 AS DOUBLE) * (CAST($Bm25OneMinusB AS DOUBLE)" +
          s" + CAST($Bm25B AS DOUBLE) * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
      }.mkString("\n  + ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id, len(toks) AS dl,
         |$tfDefs
         |FROM t),
         |s AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
         |$dfDefs
         |FROM b)
         |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
         |  round(($termSql) * 1e6) / 1e6 AS score
         |FROM b, s ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    },
    "td5_winnow_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |g AS (SELECT doc_id,
        |  [md5(array_to_string(toks[i+1:i+3], ' ')) FOR i IN range(len(toks)-2)] AS grams FROM t),
        |w AS (SELECT doc_id,
        |  list_distinct([list_min(grams[j+1:j+4]) FOR j IN range(greatest(len(grams)-3, 1))]) AS wins
        |  FROM g WHERE len(grams) > 0)
        |SELECT doc_id, unnest(wins) AS fp FROM w ORDER BY doc_id, fp""".stripMargin)
}
