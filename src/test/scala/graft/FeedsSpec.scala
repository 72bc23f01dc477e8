package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CleanStore, Feeds}

/** §2.11 — the chart-feed sink contract: every feed lands as ONE small
  * file per format and round-trips exactly, computed from the materialized
  * clean serving layer.
  */
class FeedsSpec extends AnyFunSuite with SparkFixture {

  test("writeAll materializes every feed as a single file that round-trips") {
    val out = Files.createTempDirectory("feeds").toString
    Feeds.writeAll(spark, sf001, out)
    val served = Feeds.Served(
      CleanStore.lineitem(spark, sf001), CleanStore.events(spark, sf001))
    Feeds.feeds(served, spark, sf001).foreach { case (name, df) =>
      val expected = df.collect().map(_.toSeq).toSet
      assert(expected.nonEmpty, s"$name produced no rows")
      val parquetFiles = new java.io.File(s"$out/$name")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parquetFiles.length === 1, s"$name: one parquet file per feed")
      val roundTrip = spark.read.parquet(s"$out/$name").collect().map(_.toSeq).toSet
      assert(roundTrip === expected, s"$name parquet round-trip")
      val jsonCount = spark.read.json(s"$out/${name}_json").count()
      assert(jsonCount === expected.size.toLong, s"$name json row count")
    }
  }
}
