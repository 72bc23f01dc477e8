package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Unit semantics of the quality-filter rules (td6 is oracle-checked at the
  * corpus level; this pins WHICH rule fires for crafted inputs).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("td6 quality filter: each rule binds on its crafted violation, keep is the conjunction") {
    val good = (("the quick brown fox jumps over a lazy dog near the riverbank " * 3).trim)
    val docs = Seq(
      (1L, good),                                    // passes all
      (2L, "too short to keep"),                     // r_n_tokens
      (3L, ("spam " * 30).trim),                     // r_distinct (and r_stopwords)
      (4L, (("$$$! %% @@ ## " * 8).trim)),           // r_symbols
      (5L, (("internationalization " * 25).trim))    // r_token_len (avg > 10)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(rows(1L).getBoolean(rows(1L).fieldIndex("keep")))
    def failed(id: Long): Set[String] =
      Seq("r_n_tokens", "r_token_len", "r_stopwords", "r_symbols", "r_distinct")
        .filterNot(f => rows(id).getBoolean(rows(id).fieldIndex(f))).toSet
    assert(failed(1L) === Set.empty)
    assert(failed(2L).contains("r_n_tokens"))
    assert(failed(3L).contains("r_distinct"))
    assert(failed(4L).contains("r_symbols"))
    assert(failed(5L).contains("r_token_len"))
    // keep is exactly the conjunction of the five rule flags
    rows.values.foreach { r =>
      val conj = Seq("r_n_tokens", "r_token_len", "r_stopwords", "r_symbols", "r_distinct")
        .forall(f => r.getBoolean(r.fieldIndex(f)))
      assert(r.getBoolean(r.fieldIndex("keep")) === conj)
    }
  }

  test("tokenizer: runs of whitespace yield no empty tokens; ws-only docs have zero") {
    import org.apache.spark.sql.functions.col
    val got = Seq("a b", "a  b", "\ta b\n", "   ", "", "ab", "x  \t y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) === Seq("a", "b"))
    assert(got(1L) === Seq("a", "b"), "double space minted an empty token")
    assert(got(2L) === Seq("a", "b"), "leading tab / trailing newline leaked")
    assert(got(3L) === Seq.empty, "whitespace-only doc must have zero tokens")
    assert(got(4L) === Seq.empty)
    assert(got(5L) === Seq("ab"))
    assert(got(6L) === Seq("x", "y"))
  }

  test("text stats survive a zero-token document: null ratios, not NaN or a crash") {
    val docs = Seq((1L, "the cat sat"), (2L, "   ")).toDF("doc_id", "text")
    val rows = TextAnalysis.textStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(2L).getLong(rows(2L).fieldIndex("n_tokens")) === 0L)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("avg_token_len")))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("stop_ratio")))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("quality_score")))
    assert(rows(1L).getLong(rows(1L).fieldIndex("n_tokens")) === 3L)
    // and the language classifier: an unclassifiable zero-token doc is 'und'
    val lid = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(lid(2L) === "und")
  }
}
