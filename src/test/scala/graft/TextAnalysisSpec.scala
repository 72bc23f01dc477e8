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
}
