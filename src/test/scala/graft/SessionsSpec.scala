package graft

import java.time.ZoneOffset
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.{EventStreams, Sessions}

/** Batch/stream parity for the custom-state sessionization operator. */
class SessionsSpec extends AnyFunSuite with SparkFixture {

  private def micros(t: java.time.LocalDateTime): Long =
    t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000

  test("cross-micro-batch late event inside the session span merges (batch-twin semantics)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = Sessions.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"),
      gapMinutes = 30, watermarkDelay = "2 hours") // delay > gap admits late rows
    spark.catalog.dropTempView("late_parity")
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName("late_parity").start()
    try {
      // batch 1: one open session 10:00..10:50 (all gaps <= 30m)
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:25:00"), 1.0), (1L, ts("2024-01-01 10:50:00"), 1.0))
      q.processAllAvailable()
      // batch 2: late event INSIDE the span — 45m before lastUs, so an
      // abs(us - lastUs) <= gap check would wrongly split; the batch twin
      // (sorted: 10:00, 10:05, 10:25, 10:50) keeps one session
      input.addData((1L, ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      // batch 3: gap breaker closes and emits the first session
      input.addData((1L, ts("2024-01-01 20:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("late_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def us(s: String) = micros(ts(s).toLocalDateTime)
    assert(got.toSeq === Seq(
      (1L, 1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:50:00"), 4L)))
  }

  test("st7: the driver-gated closed subset equals the identically-filtered batch result, values bit-exact") {
    import org.apache.spark.sql.functions._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        micros(r.getAs[java.time.LocalDateTime](2)),
        micros(r.getAs[java.time.LocalDateTime](3)),
        r.getLong(4), r.getDouble(5))
    val got = Sessions.st7StreamSessions(spark, sf001).collect().map(key).toSeq
    val maxUs = Tables.events(spark, sf001)
      .selectExpr("max(unix_micros(ts))").collect().head.getLong(0)
    val expected = Sessions.sessionizeBatch(Tables.events(spark, sf001))
      .filter(unix_micros(col("session_end").cast("timestamp"))
        + 1800000000L + 2000000L < lit(maxUs) - 1800000000L)
      .collect().map(key).toSeq
    assert(expected.nonEmpty, "gate subset empty — margin condition broken")
    // exact equality INCLUDING total_value: the scaled-long state sum is
    // bit-identical to the batch decimal aggregation
    assert(got === expected)
  }

  test("flatMapGroupsWithState sessionization matches the batch lag/cumsum twin") {
    val events = Tables.events(spark, sf001)
    val maxUs = events
      .selectExpr("max(unix_micros(ts))").collect().head.getLong(0)

    // (user, session_id, start_us, end_us, n_events, total_value) — the
    // streaming state accumulates EXACT scaled-long decimal sums, so the
    // value compares bit-for-bit against the batch decimal aggregation
    val batch = Sessions.sessionizeBatch(events).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        micros(r.getAs[java.time.LocalDateTime](2)),
        micros(r.getAs[java.time.LocalDateTime](3)),
        r.getLong(4), r.getDouble(5))
    }.toSet

    val streamed = {
      val ds = Sessions.sessionizeStream(EventStreams.eventStream(spark, sf001))
      EventStreams.runToMemory(ds.toDF(), "st3_parity")
      spark.table("st3_parity").collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))
      }.toSet
    }

    assert(streamed.nonEmpty, "stream emitted no sessions")
    assert((streamed -- batch).isEmpty,
      s"stream emitted ${(streamed -- batch).size} sessions batch doesn't have")
    // sessions ENDING well before the final watermark must all be emitted:
    // end + gap(30m) + delay(30m) + margin safely before maxTs
    val cutoffUs = maxUs - 2L * 3600 * 1000000
    val mustEmit = batch.filter(_._4 < cutoffUs)
    assert(mustEmit.nonEmpty)
    assert((mustEmit -- streamed).isEmpty,
      s"stream withheld ${(mustEmit -- streamed).size} closed sessions of ${mustEmit.size}")
  }
}
