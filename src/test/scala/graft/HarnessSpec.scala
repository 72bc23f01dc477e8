package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Contracts of the driver-facing harness itself. */
class HarnessSpec extends AnyFunSuite with SparkFixture {

  test("jsonEscape: every control char, quote and backslash survives json parsing") {
    val nasty = "line1\nline2\ttab \"quoted\" back\\slash \r cr  ctrl"
    val escaped = GraftSession.jsonEscape(nasty)
    // no raw control characters may remain
    assert(escaped.forall(c => c >= ' '))
    // minimal JSON round-trip: the escaped text inside quotes is valid
    val json = s"""{"k": "$escaped"}"""
    assert(json.count(_ == '"') == 6) // braces intact, quoting balanced
    assert(escaped.contains("\\n") && escaped.contains("\\t") &&
      escaped.contains("\\\"") && escaped.contains("\\\\") &&
      escaped.contains("\\u0001"))
  }

  test("Tables reader cache: same session + table -> same DataFrame plan") {
    val a = Tables.lineitem(spark, sf001)
    val b = Tables.lineitem(spark, sf001)
    assert(a eq b)
    // different scale dir -> different reader
    val c = Tables.lineitem(spark, "/root/testdata/sf0.01")
    assert(!(a eq c))
  }

  test("every registry query has either an oracle or a documented rows-only reason") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the approximate/RNG-dependent set — anything new appearing here
    // must add an oracle or justify itself in this list
    // dd4/dd5/dd7/sim2/sim3/sim4 left this list in round 8: their hash
    // constants and hyperplanes became md5 draws a DuckDB oracle
    // regenerates, so the candidate sets are hash-gated now
    assert(rowsOnly === Set(
      "sim5_ann_ivf_learned", // deterministic but k-means is not SQL-twinnable;
                              // determinism/objective/recall in SimilaritySpec
      "sa1_seeded_sample", "sa2_stratified_sample",
      "q29_approx_sketches", // sketch estimates are engine-specific by
                             // nature; accuracy floors vs the exact
                             // twins in SqlTwinsSpec
      "st14_stream_heavy_users", // streaming MG sketch: merge-order-
                                 // dependent estimates; guarantees +
                                 // below-k exactness in StreamingSpec
      "td14_heavy_hitters")) // Misra–Gries estimates are merge-order
                             // dependent; the order-independent
                             // guarantees are asserted vs exact counts
                             // in TextAnalysisSpec
    // and no oracle may exist without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
