package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-staged parquet corpus (TESTDATA.md): TPC-H-ish
  * star schema + `events` / `documents` / `embeddings`.
  *
  * Scale posture: these are plain `spark.read.parquet` scans so Catalyst's
  * column pruning and predicate pushdown reach the parquet reader untouched
  * (SURVEY.md §2.1 S2). At 100 TB the same call reads a partitioned
  * directory; nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(path(sfDir, n))
    }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads under
    * `spark.sql.legacy.parquet.nanosAsLong` (as raw int64). Normalize to a
    * microsecond timestamp with integer division (`div`, not `/` — a double
    * division would lose precision above 2^53 ns). Truncation toward zero
    * matches DuckDB's ns→µs read behaviour, so oracle timestamps agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(sfDir, "events"))
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw
    }
  }
}

/** Fail-fast schema contract, reproducing the reference's `validate_data`
  * semantics (assignment1.ipynb:70–79): named missing columns, then typed
  * column checks — production checks that run before any job is launched
  * (driver-side, zero cluster cost).
  */
final case class SchemaContract(required: Seq[(String, DataType)]) {
  def validate(df: DataFrame): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = required.collect { case (n, _) if !present.contains(n) => n }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing expected columns: ${missing.mkString(", ")}")
    val wrong = required.collect {
      case (n, t) if present(n) != t => s"$n: expected $t, got ${present(n)}"
    }
    if (wrong.nonEmpty)
      throw new IllegalArgumentException(
        s"Column type mismatch: ${wrong.mkString("; ")}")
    df
  }
}
