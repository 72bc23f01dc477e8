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
}
