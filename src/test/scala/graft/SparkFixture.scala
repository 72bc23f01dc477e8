package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM — the SAME conf
  * contract as every main (GraftSession is the single source of truth).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("4")
}

trait SparkFixture {
  lazy val spark: SparkSession = TestSpark.spark
  val sf001 = "/root/testdata/sf0.001"
}
