package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.{Analytics, Cleaning, Derive, Feeds}
import graft.sources.{SchemaContract, Tables}

/** The reference's end-to-end batch flow (assignment1.ipynb Parts 1–3) as
  * ONE lazy lineage per stage: scan → validate → clean (with accounting) →
  * derive → clean-parquet sink → analytics → chart feeds. A user of the
  * reference switches by calling [[run]]; each stage is also usable alone
  * (the operators live in their own modules).
  *
  * `runMain graft.Pipeline <sfDir> <outDir>` executes the whole flow and
  * prints the removal accounting + feed locations.
  */
object Pipeline {

  /** Raw-side schema contract for the fact table (validate_data semantics,
    * assignment1.ipynb:70–79).
    */
  val lineitemContract: SchemaContract = SchemaContract(Seq(
    "l_orderkey" -> LongType,
    "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType,
    "l_returnflag" -> StringType,
    "l_shipdate" -> TimestampNTZType))

  final case class Result(
      cleanPath: String,
      accounting: Map[String, Long],
      feedDir: String)

  def run(spark: SparkSession, sfDir: String, outDir: String): Result = {
    // 1. scan + validate (fail fast, driver-side)
    val raw = lineitemContract.validate(Tables.lineitem(spark, sfDir))
    // 2. clean with one-pass observe() accounting + derive, one lineage
    val (cleaned, counts) = Cleaning.cleanAndCount(raw, Analytics.cleaningRules)
    val derived = Derive.withTimeFeatures(
      cleaned.withColumn("l_receiptdate",
        org.apache.spark.sql.functions.expr("l_shipdate + INTERVAL 2 DAYS")),
      start = "l_shipdate", end = "l_receiptdate", distance = "l_quantity")
    // 3. materialize the clean table (the notebook's parquet sink,
    //    assignment1.ipynb:223) — at scale this would be partitioned by date
    val cleanPath = s"$outDir/clean_lineitem"
    derived.write.mode("overwrite").parquet(cleanPath)
    // 4. analytics + chart feeds from the SAME operator bodies
    val feedDir = s"$outDir/feeds"
    Feeds.writeAll(spark, sfDir, feedDir)
    Result(cleanPath, counts, feedDir)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val res = run(spark, sfDir, outDir)
    println(s"clean table: ${res.cleanPath}")
    res.accounting.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"  $k%-22s $v") }
    println(s"feeds: ${res.feedDir}")
    spark.stop()
  }
}
