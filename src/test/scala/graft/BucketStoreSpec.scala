package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BucketStore, Tables}

/** The bucketed staging's lifecycle: build once, re-register (not rebuild)
  * when a fresh session's in-memory catalog hasn't seen existing files,
  * rebuild when the staging is stale.
  */
class BucketStoreSpec extends AnyFunSuite with SparkFixture {

  private def dataFiles(dir: File): Map[String, Long] =
    Option(dir.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified)
      .toMap

  test("catalog registration survives a drop without rewriting the files") {
    val first = BucketStore.lineitemByOrderkey(spark, sf001)
    val expected = Tables.lineitem(spark, sf001).count()
    assert(first.count() === expected)
    val dir = new File(BucketStore.dataDir(sf001, "lineitem"))
    val before = dataFiles(dir)
    assert(before.nonEmpty, "staging produced no bucket files")
    // a new JVM's in-memory catalog is empty — model it by dropping the table
    spark.sql(
      s"DROP TABLE IF EXISTS ${BucketStore.tableName(sf001, "lineitem", "l_orderkey")}")
    val again = BucketStore.lineitemByOrderkey(spark, sf001)
    assert(again.count() === expected)
    assert(dataFiles(dir) === before,
      "re-registration rewrote the staged files instead of reusing them")
  }

  test("the registered table is bucketed (8 buckets on the join key)") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val desc = spark.sql(
      s"DESCRIBE EXTENDED ${BucketStore.tableName(sf001, "orders", "o_orderkey")}")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets=8"), s"table not bucketed:\n$desc")
    assert(desc.contains("o_orderkey"), s"bucket key missing:\n$desc")
  }

  test("one file per bucket — the repartition aligns with the bucket hash") {
    BucketStore.lineitemByOrderkey(spark, sf001)
    val dir = new File(BucketStore.dataDir(sf001, "lineitem"))
    assert(dataFiles(dir).size === BucketStore.NumBuckets,
      s"expected exactly ${BucketStore.NumBuckets} bucket files")
  }

  test("a changed source stamp forces a rebuild") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val dir = new File(BucketStore.dataDir(sf001, "orders"))
    val before = dataFiles(dir)
    // the source parquet is read-only here, so simulate its rewrite by
    // perturbing the (mtime, length) tuple recorded in the spec — the
    // exact comparison a real source change flips (marker mtimes no
    // longer participate: a same-second rewrite would not move them)
    val specFile = new File(dir, "_graft_spec")
    val spec = new String(java.nio.file.Files.readAllBytes(specFile.toPath))
    java.nio.file.Files.write(specFile.toPath,
      spec.replaceFirst("src\\[", "src[stale-").getBytes)
    val again = BucketStore.ordersByOrderkey(spark, sf001)
    assert(again.count() === Tables.orders(spark, sf001).count())
    val after = dataFiles(dir)
    assert(after.nonEmpty)
    // a rebuild writes fresh files (new names or newer mtimes)
    assert(after !== before, "stale staging was not rebuilt")
  }

  test("a torn first build (crash before marker/spec) is repaired by the next builder") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val dir = new File(BucketStore.dataDir(sf001, "orders"))
    // simulate a builder killed mid-write: data files partially present
    // (one real bucket deleted, a torn temp file left behind), and the
    // completion evidence (_SUCCESS marker, _graft_spec) never written
    val victim = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-")).minBy(_.getName)
    assert(victim.delete(), "could not remove a bucket file")
    java.nio.file.Files.write(new File(dir, "part-99999-torn.snappy.parquet.tmp").toPath,
      Array.fill[Byte](64)(0x42))
    assert(new File(dir, "_SUCCESS").delete())
    assert(new File(dir, "_graft_spec").delete())
    // next serve must detect the torn state (no marker/spec), rebuild from
    // the source, and serve the full table — never the partial files
    val served = BucketStore.ordersByOrderkey(spark, sf001)
    assert(served.count() === Tables.orders(spark, sf001).count())
    assert(new File(dir, "_SUCCESS").exists() && new File(dir, "_graft_spec").exists())
    assert(!new File(dir, "part-99999-torn.snappy.parquet.tmp").exists(),
      "torn temp file survived the repair rebuild")
    assert(dataFiles(dir).size === BucketStore.NumBuckets,
      "repair did not restore one file per bucket")
  }
}
