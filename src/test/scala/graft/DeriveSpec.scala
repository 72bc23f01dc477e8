package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Derive

/** P1–P5 edge semantics (SURVEY.md §2.3 / §7.4). */
class DeriveSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("guardedRatio: zero or negative denominator -> 0.0, never division blowup") {
    val df = Seq((10.0, 0.0), (10.0, -2.0), (10.0, 4.0)).toDF("num", "den")
    val got = df.select(Derive.guardedRatio(col("num"), col("den"))).as[Double].collect()
    assert(got.toSeq === Seq(0.0, 0.0, 2.5))
  }

  test("labelMap: pandas .map semantics — no match => null") {
    val df = Seq("A", "N", "Z").toDF("code")
    val got = df.select(
      Derive.labelMap(col("code"), Map("A" -> "Accepted", "N" -> "None")).as("l"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("Accepted"), Some("None"), None))
  }

  test("deltaDays: exact day arithmetic in double seconds") {
    val df = Seq((
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 12:00:00"))).toDF("a", "b")
    val got = df.select(Derive.deltaDays(col("a"), col("b"))).as[Double].collect().head
    assert(got === 1.5)
  }

  test("dayNameOf: full English names regardless of platform locale") {
    val df = Seq(
      Timestamp.valueOf("2024-01-01 10:00:00"), // a Monday
      Timestamp.valueOf("2024-01-07 10:00:00")  // a Sunday
    ).toDF("ts")
    val got = df.select(Derive.dayNameOf(col("ts"))).as[String].collect()
    assert(got.toSeq === Seq("Monday", "Sunday"))
  }

  test("hourOf: long-typed hour 0..23") {
    val df = Seq(Timestamp.valueOf("2024-01-01 23:59:59")).toDF("ts")
    assert(df.select(Derive.hourOf(col("ts"))).as[Long].collect().head === 23L)
  }
}
