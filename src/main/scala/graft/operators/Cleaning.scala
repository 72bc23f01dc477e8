package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Row-quality cleaning with per-rule removal accounting.
  *
  * Reference semantics (assignment1.ipynb:112–164): drop nulls on critical
  * columns, then apply ordered predicates, counting for each rule only the
  * rows that survived every earlier rule (sequential attribution — order
  * matters). The reference does this as five eager passes; here it is ONE
  * pass: the conjunction of all predicates is a single pushed-down Filter,
  * and the per-rule counts ride along as `observe()` metrics, so at 100 TB
  * the accounting costs zero extra scans and zero shuffles.
  */
object Cleaning {

  final case class Rule(name: String, predicate: Column)

  /** Null-check predicate for the critical-column rule (V4). */
  def notNull(criticalCols: Seq[String]): Column =
    criticalCols.map(col(_).isNotNull).reduce(_ && _)

  /** The cleaned frame: one conjunctive filter, fully pushdown-friendly. */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(rules.map(_.predicate).reduce(_ && _))

  /** Cleaned frame + an [[Observation]] whose metrics (after any action on
    * the returned frame) hold `removed_<rule>` counts with the reference's
    * sequential attribution, plus `rows_in` / `rows_out`.
    */
  def cleanWithAccounting(
      df: DataFrame,
      rules: Seq[Rule]): (DataFrame, Observation) = {
    val obs = Observation("clean")
    // Rule i counts rows failing predicate i that passed predicates 0..i-1.
    val metrics = rules.zipWithIndex.map { case (r, i) =>
      val survivedEarlier =
        rules.take(i).map(_.predicate).foldLeft(lit(true))(_ && _)
      count(when(survivedEarlier && !coalesce(r.predicate, lit(false)), 1))
        .as(s"removed_${r.name}")
    } :+ count(lit(1)).as("rows_in")
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    (clean(observed, rules), obs)
  }

  /** Convenience: run the accounting eagerly and return (cleaned, counts).
    * Triggers one job; counts include `rows_in`, `rows_out`, `removed_total`.
    */
  def cleanAndCount(
      df: DataFrame,
      rules: Seq[Rule]): (DataFrame, Map[String, Long]) = {
    val (cleaned, obs) = cleanWithAccounting(df, rules)
    val rowsOut = cleaned.count()
    val raw = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    val removed = raw.filter(_._1.startsWith("removed_")).values.sum
    (cleaned, raw ++ Map("rows_out" -> rowsOut, "removed_total" -> removed))
  }

  /** V9 as a query: the per-rule removal counts as a ONE-ROW DataFrame —
    * `rows_in, removed_<rule>..., rows_out` — with the reference's
    * sequential attribution (rule i counts only rows that passed rules
    * 0..i−1; assignment1.ipynb:147–164). One aggregate over one scan, no
    * shuffle beyond the single-row combine; oracle-expressible as chained
    * conditional counts, unlike the observe() variant.
    */
  def accountingAgg(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    def passed(r: Rule): Column = coalesce(r.predicate, lit(false))
    val metrics = rules.zipWithIndex.map { case (r, i) =>
      val survivedEarlier =
        rules.take(i).map(passed).foldLeft(lit(true))(_ && _)
      count(when(survivedEarlier && !passed(r), 1)).as(s"removed_${r.name}")
    }
    val exprs = Seq(count(lit(1)).as("rows_in")) ++ metrics :+
      count(when(rules.map(passed).reduce(_ && _), 1)).as("rows_out")
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** Per-column null census (V10/A12): one aggregate row, `<col>_nulls`. */
  def nullCensus(df: DataFrame): DataFrame = {
    val exprs = df.columns.map { c =>
      (count(lit(1)) - count(col(c))).as(s"${c}_nulls")
    }
    df.agg(exprs.head, exprs.tail: _*)
  }
}
