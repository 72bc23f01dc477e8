package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup
import graft.sources.Tables

/** Temporary stage-by-stage profiler for dd3. */
object DebugStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documentsRebalanced(spark, sfDir)
    time("warmup count")(docs.count())
    time("tokenize only")(
      docs.select(explode(split(trim(col("text")), " ")).as("t")).count())
    val ex = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
    time("ex = explode(shingles)")(ex.count())
    val kept = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= 50)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    time("kept = 2 windows")(kept.count())
    val lists = kept.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .select(col("ds"))
    time("lists = collect_list")(lists.count())
    val pairExpr = flatten(transform(col("ds"), (a, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))),
        b => struct(
          a.getField("doc_id").as("doc_a"), a.getField("n_sh").as("na"),
          b.getField("doc_id").as("doc_b"), b.getField("n_sh").as("nb")))))
    val pairs = lists.select(explode(pairExpr).as("p")).select(col("p.*"))
    time("pairs = HOF explode")(pairs.count())
    val inter = pairs.groupBy(col("doc_a"), col("na"), col("doc_b"), col("nb"))
      .agg(count(lit(1)).as("c"))
    time("inter = pair groupBy")(inter.count())
    time("full dd3 warm")(
      Dedup.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
