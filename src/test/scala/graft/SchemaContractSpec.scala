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
}
