package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sql

/** S5/P7 — the spark.sql text twins must produce exactly the DataFrame
  * plans' results (same columns, same rows, same order).
  */
class SqlTwinsSpec extends AnyFunSuite with SparkFixture {

  for ((name, sqlQuery) <- Sql.queries.toSeq.sortBy(_._1)) {
    test(s"$name: spark.sql text == DataFrame twin") {
      val viaSql = sqlQuery(spark, sf001)
      val viaDf = Sql.dataFrameTwins(name)(spark, sf001)
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq, "column names")
      val s = viaSql.collect().map(_.toSeq)
      val d = viaDf.collect().map(_.toSeq)
      assert(s.length === d.length, "row count")
      s.zip(d).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a === b, s"row $i")
      }
    }
  }

  test("q29: sketch estimates track their exact twins (HLL within 3·rsd, quantile within one step)") {
    val rows = graft.operators.Analytics.q29ApproxSketches(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      // default HLL rsd is 0.05; 3 standard deviations is a generous,
      // non-flaky bound at these cardinalities
      assert(math.abs(approx - exact) <= math.max(3.0, 0.15 * exact),
        s"${r.getString(0)}: HLL estimate $approx vs exact $exact")
      val ep50 = r.getDouble(r.fieldIndex("exact_p50"))
      val ap50 = r.getDouble(r.fieldIndex("approx_p50"))
      // accuracy 10000 on a ~50-value integer-ish domain: the sketch
      // must land on an actual data value within one step of the exact
      // interpolated median
      assert(math.abs(ap50 - ep50) <= 1.0,
        s"${r.getString(0)}: approx p50 $ap50 vs exact $ep50")
    }
  }
}
