package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.11 — chart-feed sink contracts. The reference's five visualizations
  * are rendered by an external viz layer (Plotly/Streamlit); the engine's
  * job ends at SMALL, bounded aggregate tables written where that layer can
  * read them (BASELINE "Spark batch/streaming ETL + external viz").
  *
  * Feeds are ≤ a few hundred rows by construction (every one is a bounded
  * aggregate), so `coalesce(1)` writes one file per feed — the shape a
  * dashboard reader wants — without ever pulling fact-table data through
  * the driver. Parquet for typed consumers, JSON lines for web-facing ones.
  */
object Feeds {

  /** feed name → the bounded aggregate that computes it (app.py:109–381). */
  val feeds: Map[String, (SparkSession, String) => DataFrame] = Map(
    "metric_tiles" -> (Analytics.q12GlobalMetrics _), // 1 row of dashboard tiles
    "top_parts" -> (Analytics.q05TopParts _),         // top-10 bar chart
    "hourly_avg" -> (Analytics.q06HourlyAvg _),       // 24-row line chart
    "histogram" -> (Analytics.q13Histogram _),        // ≤100 bins
    "payment_pie" -> (Analytics.q15ValueCounts _),    // ≤5 slices
    "heatmap" -> (Analytics.q11Heatmap _))            // ≤168 cells

  def writeFeed(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.coalesce(1).write.mode("overwrite").format(format).save(path)

  /** Materialize every feed under `outDir/<name>` (parquet) and
    * `outDir/<name>_json` (JSON lines). The aggregate is computed ONCE:
    * the parquet lands first, the JSON twin re-reads that (tiny) file
    * instead of re-running the scan-and-aggregate pipeline.
    */
  def writeAll(spark: SparkSession, sfDir: String, outDir: String): Unit =
    feeds.foreach { case (name, fn) =>
      writeFeed(fn(spark, sfDir), s"$outDir/$name")
      writeFeed(spark.read.parquet(s"$outDir/$name"), s"$outDir/${name}_json", "json")
    }
}
