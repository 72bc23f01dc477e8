package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SchemaContract

/** V1/V2 — fail-fast schema validation with NAMED columns in the error
  * (reference `validate_data`, assignment1.ipynb:70–79).
  */
class SchemaContractSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def df = Seq((1L, "x", 2.0)).toDF("id", "name", "score")

  test("all columns present with right types -> passes through unchanged") {
    val contract = SchemaContract(Seq(
      "id" -> LongType, "name" -> StringType, "score" -> DoubleType))
    assert(contract.validate(df).collect().length === 1)
  }

  test("missing columns -> exception naming every missing column") {
    val contract = SchemaContract(Seq(
      "id" -> LongType, "missing_a" -> StringType, "missing_b" -> IntegerType))
    val e = intercept[IllegalArgumentException](contract.validate(df))
    assert(e.getMessage.contains("Missing expected columns"))
    assert(e.getMessage.contains("missing_a"))
    assert(e.getMessage.contains("missing_b"))
  }

  test("wrong dtype -> exception naming the column and both types") {
    val contract = SchemaContract(Seq("id" -> LongType, "score" -> StringType))
    val e = intercept[IllegalArgumentException](contract.validate(df))
    assert(e.getMessage.contains("score"))
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("DoubleType"))
  }

  test("normalizeTs absorbs every staged ts vintage: nanos-long and NTZ both read as the same TIMESTAMP instant") {
    // the driver has re-staged events.parquet in two vintages so far
    // (TIMESTAMP(NANOS) -> nanos long under the conf; timestamp[us]
    // isAdjustedToUTC=false -> TIMESTAMP_NTZ). Both must normalize to
    // an identical session-UTC TimestampType wall clock — streaming
    // watermarks and epoch/double casts depend on it.
    import org.apache.spark.sql.functions._
    val wall = "2024-01-05 06:30:15.123456"
    val ldt = java.time.LocalDateTime.parse(wall.replace(' ', 'T'))
    val asNanos = Seq(Tuple1(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano))
      .toDF("ts") // the NANOS-vintage reading: a raw epoch-nanos long
    val normNanos = graft.sources.Tables.normalizeTs(asNanos)
    val asNtz = spark.sql(s"SELECT TIMESTAMP_NTZ'$wall' AS ts")
    val normNtz = graft.sources.Tables.normalizeTs(asNtz)
    assert(normNanos.schema("ts").dataType === TimestampType)
    assert(normNtz.schema("ts").dataType === TimestampType)
    val a = normNanos.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head.getString(0)
    val b = normNtz.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head.getString(0)
    assert(a === wall && b === wall,
      s"vintages disagree or lose precision: nanos=$a ntz=$b")
  }
}
