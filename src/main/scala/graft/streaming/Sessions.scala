package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions._
import graft.sources.Tables

/** Gap-based sessionization of the events stream — the canonical CUSTOM
  * STATE operator (no built-in window covers "session ends after N quiet
  * minutes").
  *
  *  - [[sessionizeBatch]] is the oracle-checked twin: lag + cumulative-sum
  *    session ids per user, one window shuffle on user_id — the standard
  *    relational formulation, linear at any scale.
  *  - [[sessionizeStream]] is the streaming path:
  *    `flatMapGroupsWithState` with event-time timeout — per-user state is
  *    one open session (constant size), closed sessions are APPENDED when a
  *    later event breaks the gap or the watermark passes the session's
  *    timeout. State is bounded by (active users × one session record):
  *    the 100 TB-stream shape. Batch/stream parity is asserted in
  *    `SessionsSpec`.
  *
  * Parity contract: with `watermarkDelay <= gap` (the default: both 30m),
  * the stream matches the batch twin EXACTLY — any event that could land
  * before the open session's reach is already below the watermark (the
  * user's own lastUs drives the global max forward) and is dropped before
  * the operator. With `watermarkDelay > gap`, admitted late events that
  * fall INSIDE or within gap of the open session's span merge correctly
  * (span-based check below, tested with a multi-batch MemoryStream), but
  * an event EARLIER than span-start − gap necessarily starts a backdated
  * new session: append mode cannot revise already-emitted output, so a
  * late event that would have BRIDGED two sessions in batch order cannot
  * re-merge them. Exactness under unbounded disorder would need a
  * hold-until-watermark event buffer in state — a deliberate non-goal
  * (state would grow with disorder, not with users).
  */
object Sessions {

  /** One open session per user: ordinal, bounds in epoch MICROseconds
    * (micros, not millis — the batch twin compares raw event times and a
    * sub-millisecond difference must not split sessions differently).
    * `sumMicros` accumulates the value total as EXACT scaled-decimal longs
    * (each double rounded to 6 dp the way Spark's double→DECIMAL(38,6)
    * cast does), not as a running double: the long sum is
    * order-independent and bit-identical to the batch twin's `dsumr`
    * decimal aggregation — a double accumulation in arrival order would
    * drift by ulps across micro-batch boundaries and could never be
    * hash-compared against the decimal oracle.
    */
  final case class SessState(ordinal: Long, startUs: Long, lastUs: Long, n: Long, sumMicros: Long)

  /** The double → 6-dp scaled long conversion Spark's `CAST(v AS
    * DECIMAL(38,6))` performs: HALF_UP on the SHORTEST decimal string of
    * the double (`Double.toString`), the exact semantics of
    * `Decimal.fromDecimal(BigDecimal(d))` — so Σ scaled6 == the batch
    * decimal sum, bit for bit.
    */
  private[streaming] def scaled6(v: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** A closed session, timestamps in epoch microseconds. */
  final case class SessionOut(
      user_id: Long, session_id: Long,
      start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  // ------------------------------------------------------------- batch

  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(byTs)
    val isNew = when(
      prev.isNull ||
        col("ts").cast("double") - prev.cast("double") > gapMinutes * 60.0, 1)
      .otherwise(0)
    events
      .withColumn("session_id", sum(isNew).over(cum).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"),
        count(lit(1)).as("n_events"),
        dsumr(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** st11 — the NATIVE `session_window` operator (compose-before-custom:
    * st3 derives sessions with a lag/cumsum window chain, st7 with custom
    * `flatMapGroupsWithState`; since Spark 3.2 the engine has a dedicated
    * session-window aggregate, and on a stream the SAME expression runs
    * with a watermark and bounded per-key state). Semantics differ from
    * st3 at the edges, and the oracle encodes the native contract
    * exactly: a new session starts when the gap is ≥ the timeout (window
    * ends are EXCLUSIVE — an event landing exactly at `prev + gap` does
    * not extend), and the reported `session_end` is `last_ts + gap` (the
    * window bound), not the last event time.
    */
  def st11SessionWindow(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsumr(col("value")).as("total_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("session_start"),
        col("sw.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  // ----------------------------------------------------------- streaming

  private def processGroup(gapUs: Long)(
      user: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
      state: GroupState[SessState]): Iterator[SessionOut] = {
    def closed(s: SessState) =
      // the long→double division is the same single rounding DuckDB's
      // CAST(decimal-sum AS DOUBLE) performs — values stay comparable
      SessionOut(user, s.ordinal, s.startUs, s.lastUs, s.n, s.sumMicros / 1e6)
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(closed(s))
    } else {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur = state.getOption
      // arrival order within a micro-batch is arbitrary — sort by event time
      rows.toSeq.sortBy(_._3).foreach { case (_, _, us, v) =>
        cur = cur match {
          // Span-based merge, matching the batch twin for cross-micro-batch
          // late events (in-watermark, us possibly < lastUs): an event
          // INSIDE the open session's span always merges (inserting into a
          // <=gap interval keeps every consecutive gap <=gap), an event
          // before the span merges iff within gap of startUs, after the
          // span iff within gap of lastUs. (A signed lastUs-only check
          // merged ANY earlier event; an abs(lastUs) check split sessions
          // the batch twin merges.) min/max keep the bounds honest,
          // matching the batch min(ts)/max(ts) aggregation.
          case Some(s) if us >= s.startUs - gapUs && us <= s.lastUs + gapUs =>
            Some(s.copy(
              startUs = math.min(s.startUs, us),
              lastUs = math.max(s.lastUs, us), n = s.n + 1,
              sumMicros = s.sumMicros + scaled6(v)))
          case Some(s) =>
            out += closed(s)
            Some(SessState(s.ordinal + 1, us, us, 1, scaled6(v)))
          case None =>
            Some(SessState(1, us, us, 1, scaled6(v)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // flush when the watermark passes the session's gap horizon
        state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000 + 1)
      }
      out.iterator
    }
  }

  def sessionizeStream(
      events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermarked ts column must SURVIVE the projection — the stateful
    // operator's event-time-timeout check looks for it in its input (the
    // group function only reads the micros twin)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        unix_micros(col("ts")).as("us"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(processGroup(gapUs))
  }

  /** The deterministic-closed-subset margin shared by [[st7StreamSessions]]
    * and its oracle: wide enough to absorb the watermark's micros→millis
    * truncation and the `+1 ms` timeout nudge, negligible next to the
    * 30-minute gap.
    */
  private val St7MarginUs = 2000000L

  /** st7's payload-plausibility bound, shared with its oracle text: the
    * session value-sum lives in scaled-long state (value × 1e6 as an
    * exact integer — the bit-repeatable sum), so its exactness domain is
    * |value| ≤ 1e9 with ~9200 rows of headroom per session at the bound
    * (1e9 · 1e6 · 9200 < 2^63). The adversarial-events replay planted a
    * 1e15 value and the state sum OVERFLOWED the stream dead under ANSI;
    * a telemetry amount beyond this bound is garbage (the st19 fence
    * family's judgement), screened at the door — fail-closed, not crash.
    */
  val MaxAbsEventValue: Double = 1e9

  /** st7 — the streaming sessionizer run END-TO-END through the driver
    * gate: start [[sessionizeStream]] over the parquet source, drain it
    * (AvailableNow; the final no-data micro-batch fires the event-time
    * timeouts), land the closed sessions in the parquet file sink, read
    * them back. The gate then keeps only the DETERMINISTIC subset — the
    * st2/st5 pattern: a session is provably flushed iff its timeout
    * horizon (end + gap) precedes the final watermark (max ts − delay) by
    * [[St7MarginUs]]; every such batch-twin session is either gap-broken
    * by a later event or timed out by the final watermark, so the filtered
    * stream output equals the identically-filtered batch result row for
    * row (values included — the scaled-long state sum is bit-identical to
    * the decimal oracle). Borderline sessions (end within the margin of
    * the watermark) are excluded from BOTH sides, not asserted on.
    */
  def st7StreamSessions(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
      delayMinutes: Int = 30): DataFrame = {
    // delay as minutes, not a free-form string: the gate filter below must
    // use the SAME delay the stream's watermark ran with — two parameters
    // could silently diverge
    // KEY + PAYLOAD COMPLETENESS at the door: the typed state tuple
    // has primitive Long/Double slots, so one NULL user_id or value
    // kills the stream (NOT_NULL_ASSERT_VIOLATION in the adversarial
    // replay). A session needs its key and its value mass; incomplete
    // rows are screened here and in the oracle text identically.
    val result = EventStreams.runToParquet(
      sessionizeStream(
        EventStreams.eventStream(spark, sfDir)
          .filter(col("user_id").isNotNull && col("value").isNotNull &&
            abs(col("value")) <= MaxAbsEventValue), gapMinutes,
        s"$delayMinutes minutes")
        .toDF(),
      "st7_sink", statePartitions = EventStreams.gateParts(sfDir))
    val gapUs = gapMinutes * 60L * 1000000L
    val delayUs = delayMinutes * 60L * 1000000L
    // the deterministic-subset bound must be the max over EXACTLY the
    // stream's input — the same event-time window AND the same
    // key/payload screens — because the stream's final watermark is
    // derived from that input: a bound over a looser row set (say, the
    // time screen only, when the latest time-valid event has a NULL
    // user) would admit sessions the stream never flushed
    val maxTs = EventStreams.validEventTime(Tables.events(spark, sfDir))
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        abs(col("value")) <= MaxAbsEventValue)
      .agg(max(unix_micros(col("ts"))).as("max_us"))
    result
      .crossJoin(broadcast(maxTs)) // 1-row scalar bound, broadcast probe
      .filter(col("end_us") + gapUs + St7MarginUs < col("max_us") - delayUs)
      .select(
        col("user_id"), col("session_id"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
        timestamp_micros(col("end_us")).cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st3_sessionize" ->
      ((s: SparkSession, d: String) => sessionizeBatch(Tables.events(s, d))),
    "st11_session_window" -> (st11SessionWindow(_, _)),
    "st7_stream_sessions" ->
      ((s: SparkSession, d: String) => st7StreamSessions(s, d)))

  // Oracle cumsum frames are RANGE, not ROWS (r15, caught by the
  // sf1synth duplicate-ts corpus): DuckDB evaluates the lag-flag CTE and
  // the cumulative-sum CTE as SEPARATE window operators, each sorting
  // (user_id, ts) independently, and under tied timestamps their peer
  // orders can disagree — a ROWS frame then splits a tie group across
  // two sessions (the flag=1 peer lands mid-group in the second sort).
  // RANGE makes every peer include the whole tie group's flags, which is
  // order-independent: exactly one row per tie group carries the
  // distinct-prev flag under ANY total order. The ENGINE is immune by
  // construction — lag and sum share one window spec, one sort, one
  // pass — so this is oracle-text-only; unique-ts corpora hash the same.
  val oracles: Map[String, String] = Map(
    "st3_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800.0
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM o)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events,
        |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
        |FROM s GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin,
    // native session_window contract: new session at gap >= timeout
    // (exclusive window ends), session_end = last event + gap. The gap
    // compare is EXACT microseconds (epoch_us longs): Spark compares µs
    // longs internally, and a double epoch() difference at ~1.7e9 s
    // magnitude has ulp ≈ 0.24 µs — an exact-1800 s gap could land at
    // 1799.99999997 and merge sessions the engine splits
    "st11_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM o)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTES AS session_end,
        |  count(*) AS n_events,
        |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id NULLS FIRST, session_start""".stripMargin,
    // the st3 batch result restricted to the deterministic closed subset —
    // end + gap + margin before the final watermark (max ts − delay); the
    // same filter the engine applies to the stream output
    "st7_stream_sessions" -> EventStreams.onValidEventTime(
      s"""WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800.0
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND abs(value) <= $MaxAbsEventValue),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM o),
        |b AS (
        |  SELECT user_id, session_id,
        |    min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
        |  FROM s GROUP BY 1, 2),
        |m AS (SELECT max(epoch_us(ts)) AS max_us FROM events
        |      WHERE user_id IS NOT NULL AND value IS NOT NULL
        |        AND abs(value) <= $MaxAbsEventValue)
        |SELECT b.* FROM b, m
        |WHERE epoch_us(session_end) + 1800000000 + 2000000 < max_us - 1800000000
        |ORDER BY user_id, session_id""".stripMargin))
}
