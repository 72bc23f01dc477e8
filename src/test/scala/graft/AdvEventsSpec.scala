package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonFirstLong
import graft.streaming.EventStreams
import org.apache.spark.unsafe.types.UTF8String

/** Pins the contracts the adversarial-events replay forced
  * (tools/advevents.py's catch record): the strict-JSON extraction rule,
  * the event-time validity screen, and the watermark-poisoning hazard
  * the screen closes end-to-end.
  */
class AdvEventsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("json_first_long: the strict-JSON first-key integer-token table") {
    def f(s: String): Option[Long] =
      Option(JsonFirstLong.compute(UTF8String.fromString(s), "k")).map(_.longValue)
    assert(f("""{"k": 69}""") === Some(69L))
    assert(f("""{"k": -7}""") === Some(-7L))
    assert(f("""{"k": 9223372036854775807}""") === Some(Long.MaxValue))
    // overflow past long = NULL (the TRY_CAST twin behavior)
    assert(f("""{"k": 99999999999999999999}""") === None)
    // strictness: the leniencies Spark's own readers enable are OFF
    assert(f("""{k: 69}""") === None, "unquoted field name")
    assert(f("""{'k': 69}""") === None, "single quotes")
    assert(f("""{"k": 1} trailing""") === None, "trailing garbage")
    assert(f("""{"k": NaN}""") === None, "NaN literal")
    assert(f("""{"k": 1,}""") === None, "trailing comma")
    assert(f("not json at all") === None)
    assert(f("") === None)
    // integer TOKEN only — no cross-type coercion (where engines diverge)
    assert(f("""{"k": "69"}""") === None, "JSON string")
    assert(f("""{"k": 12.5}""") === None, "decimal")
    assert(f("""{"k": 1e3}""") === None, "exponent form")
    assert(f("""{"k": true}""") === None)
    assert(f("""{"k": null}""") === None)
    assert(f("""{"k": [1, 2]}""") === None)
    assert(f("""{"k": {"a": 1}}""") === None)
    // FIRST duplicate wins (get_json_object/DuckDB, NOT from_json's last)
    assert(f("""{"k": 1, "k": 2}""") === Some(1L))
    // ...but the rest of the document must still be valid
    assert(f("""{"k": 1, oops}""") === None)
    // top-level only — the $.k path contract
    assert(f("""{"a": {"k": 5}}""") === None)
    assert(f("""{"a": {"k": 5}, "k": 6}""") === Some(6L))
    // valid non-object documents carry no $.k
    assert(f("""[1, 2]""") === None)
    assert(f("""69""") === None)
  }

  test("json_first_long: never throws on garbage (fuzz)") {
    val rng = new scala.util.Random(42)
    val alphabet = "{}[]\",:0123456789ek.-+ \n\ttruefalsenull\\é中"
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rng.nextInt(40))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      JsonFirstLong.compute(UTF8String.fromString(s), "k") // must not throw
    }
  }

  test("validEventTime: screens clock-skew garbage, passes the working window, NULL ts falls out") {
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-10 12:00:00"))),
      (2L, Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59"))),
      (3L, Some(java.sql.Timestamp.valueOf("2262-04-11 23:47:16"))),
      (4L, Some(java.sql.Timestamp.valueOf("2019-12-31 23:59:59"))),
      (5L, Some(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))),
      (6L, None)
    ).toDF("event_id", "ts")
    val kept = EventStreams.validEventTime(df).select("event_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 5L))
  }

  test("watermark poisoning is real and the screen closes it: one far-future row costs well-timed windows without the screen, none with it") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("advpoison").toFile
    val mk = (id: Long, t: String, v: Double) =>
      (id, java.sql.Timestamp.valueOf(t), 1L, "view", v, """{"k": 1}""")
    val schema =
      "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    // arrival order is made DETERMINISTIC by draining the stream to
    // completion between file drops (two AvailableNow runs over one
    // checkpoint — exactly a production restart): run 1 ingests the
    // poison, run 2's rows then face the poisoned persisted watermark
    def run(screen: Boolean, tag: String): Set[String] = {
      val data = new java.io.File(dir, s"events_$tag")
      val out = new java.io.File(dir, s"out_$tag").getAbsolutePath
      val chk = new java.io.File(dir, s"chk_$tag").getAbsolutePath
      def drain(): Unit = {
        val src0 = spark.readStream.schema(schema)
          .parquet(s"${data.getAbsolutePath}/*/")
        val src = if (screen) EventStreams.validEventTime(src0) else src0
        src.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").cast("string").as("ws"), col("n"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      Seq(mk(1, "2024-01-10 10:00:00", 1.0), mk(2, "2024-01-10 10:30:00", 2.0),
          mk(3, "2262-04-11 23:00:00", 9.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(new java.io.File(data, "f1").getAbsolutePath)
      drain()
      Seq(mk(4, "2024-01-10 11:10:00", 3.0), mk(5, "2024-01-10 12:10:00", 4.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(new java.io.File(data, "f2").getAbsolutePath)
      drain()
      // a later well-timed arrival advances the (unpoisoned) watermark so
      // pending windows can flush — in the poisoned run file 2's rows were
      // DROPPED, so no amount of further data can ever emit their windows
      Seq(mk(6, "2024-01-10 14:30:00", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(new java.io.File(data, "f3").getAbsolutePath)
      drain()
      spark.read.parquet(out).select("ws").as[String].collect().toSet
    }
    val poisoned = run(screen = false, "raw")
    val screened = run(screen = true, "scr")
    // without the screen, the 2262 row's persisted watermark calls file
    // 2's rows (11:10, 12:10) late — their windows never appear
    assert(!poisoned.contains("2024-01-10 11:00:00") &&
      !poisoned.contains("2024-01-10 12:00:00"),
      s"expected the poisoned run to lose file 2's windows, got $poisoned")
    // with the screen, every well-timed window survives
    assert(screened.contains("2024-01-10 10:00:00") &&
      screened.contains("2024-01-10 11:00:00") &&
      screened.contains("2024-01-10 12:00:00"),
      s"screened run must keep all well-timed windows, got $screened")
    assert(!screened.exists(_.startsWith("2262")), "the poison row is screened")
  }
}
