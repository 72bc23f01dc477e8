package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Derived-column feature engineering (SURVEY.md §2.3, P1–P5).
  *
  * All pure `Column` expressions — they stay inside whole-stage codegen and
  * add no shuffle; at 100 TB these are free riders on whatever scan already
  * happens.
  */
object Derive {

  /** P1 — timestamp difference in fractional days (reference computes
    * minutes between pickup/dropoff; same shape). Double seconds arithmetic
    * matches DuckDB `(epoch(b) - epoch(a)) / 86400`.
    */
  def deltaDays(a: Column, b: Column): Column =
    (b.cast("timestamp").cast("double") - a.cast("timestamp").cast("double")) / 86400.0

  /** P2 — hour extraction, widened to long for oracle schema parity. */
  def hourOf(ts: Column): Column = hour(ts).cast("long")

  /** P3 — weekday full English name. */
  def dayNameOf(ts: Column): Column = weekdayName(ts)

  /** P4 — guarded division: `num / den` when `den > 0`, else 0.0
    * (reference: trip_speed_mph, assignment1.ipynb:195–198).
    */
  def guardedRatio(num: Column, den: Column): Column =
    when(den > 0, num / den).otherwise(0.0)

  /** P5 — code→label mapping with pandas `.map` semantics: no match ⇒ null
    * (app.py:120–127). Chained `when` without `otherwise` gives exactly
    * that.
    */
  def labelMap(code: Column, labels: Map[String, String]): Column =
    labels.foldLeft(Option.empty[Column]) { case (acc, (k, v)) =>
      Some(acc.fold(when(code === k, v))(_.when(code === k, v)))
    }.getOrElse(lit(null).cast("string"))

  /** Reference-shaped derivation bundle over a (start, end) timestamp pair:
    * duration, hour, weekday, guarded speed-like ratio.
    */
  def withTimeFeatures(
      df: DataFrame,
      start: String,
      end: String,
      distance: String): DataFrame = {
    val dur = deltaDays(col(start), col(end))
    df.withColumn("duration_days", dur)
      .withColumn("start_hour", hourOf(col(start)))
      .withColumn("start_day_of_week", dayNameOf(col(start)))
      .withColumn("rate_per_day", guardedRatio(col(distance), dur))
  }
}
