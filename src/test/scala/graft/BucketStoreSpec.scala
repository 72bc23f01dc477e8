package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BucketStore, ManifestStore, Tables}

/** The bucketed staging's lifecycle under the r16 pointer-swap manifest:
  * build once into an immutable `snap=<id>` dir, re-register (not
  * rebuild) when a fresh session's in-memory catalog hasn't seen the
  * pointed snapshot, republish a NEW snapshot when the staging is stale
  * — a reader pinned to the previous generation completes against
  * intact files instead of hitting the in-place store's abort window.
  */
class BucketStoreSpec extends AnyFunSuite with SparkFixture {

  private def root(table: String) = new File(BucketStore.dataDir(sf001, table))

  private def snapDir(table: String): File = {
    val r = root(table)
    ManifestStore.currentPointer(r)
      .map(p => ManifestStore.snapDir(r, p._1))
      .getOrElse(fail(s"no manifest pointer under $r"))
  }

  private def snapTable(table: String, key: String): String = {
    val id = snapDir(table).getName.stripPrefix("snap=")
    s"${BucketStore.tableName(sf001, table, key)}_s$id"
  }

  private def dataFiles(dir: File): Map[String, Long] =
    Option(dir.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified)
      .toMap

  test("catalog registration survives a drop without rewriting the files") {
    val first = BucketStore.lineitemByOrderkey(spark, sf001)
    val expected = Tables.lineitem(spark, sf001).count()
    assert(first.count() === expected)
    val dir = snapDir("lineitem")
    val before = dataFiles(dir)
    assert(before.nonEmpty, "staging produced no bucket files")
    // a new JVM's in-memory catalog is empty — model it by dropping the
    // snapshot's registered table
    spark.sql(s"DROP TABLE IF EXISTS ${snapTable("lineitem", "l_orderkey")}")
    val again = BucketStore.lineitemByOrderkey(spark, sf001)
    assert(again.count() === expected)
    assert(dataFiles(dir) === before,
      "re-registration rewrote the staged files instead of reusing them")
  }

  test("the registered table is bucketed (8 buckets on the join key)") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val desc = spark.sql(
      s"DESCRIBE EXTENDED ${snapTable("orders", "o_orderkey")}")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets=8"), s"table not bucketed:\n$desc")
    assert(desc.contains("o_orderkey"), s"bucket key missing:\n$desc")
  }

  test("one file per bucket — the repartition aligns with the bucket hash") {
    BucketStore.lineitemByOrderkey(spark, sf001)
    assert(dataFiles(snapDir("lineitem")).size === BucketStore.NumBuckets,
      s"expected exactly ${BucketStore.NumBuckets} bucket files")
  }

  test("a changed source stamp republishes a NEW snapshot; the previous generation's files survive the horizon") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val r = root("orders")
    val (genBefore, spec) = ManifestStore.currentPointer(r).get
    val beforeDir = ManifestStore.snapDir(r, genBefore)
    val before = dataFiles(beforeDir)
    // the source parquet is read-only here, so simulate its rewrite by
    // perturbing the (mtime, length) tuple recorded in the pointer's
    // spec — the exact comparison a real source change flips
    java.nio.file.Files.write(new File(r, "_manifest").toPath,
      s"$genBefore\t${spec.replaceFirst("src\\[", "src[stale-")}".getBytes)
    val again = BucketStore.ordersByOrderkey(spark, sf001)
    assert(again.count() === Tables.orders(spark, sf001).count())
    val genAfter = ManifestStore.currentPointer(r).get._1
    assert(genAfter > genBefore, "stale staging was not republished")
    // pointer-swap contract: the superseded generation is still on disk
    // (the {current, previous} reader horizon) and byte-untouched
    assert(dataFiles(beforeDir) === before,
      "republish disturbed the previous generation's files")
  }

  test("a torn first build (crash before the pointer swap) is repaired by the next builder") {
    BucketStore.ordersByOrderkey(spark, sf001)
    val r = root("orders")
    // simulate a builder killed mid-write: a half-written orphan snapshot
    // (torn temp debris) and the pointer never swapped
    val orphan = new File(r, "snap=99")
    orphan.mkdirs()
    java.nio.file.Files.write(
      new File(orphan, "part-99999-torn.snappy.parquet.tmp").toPath,
      Array.fill[Byte](64)(0x42))
    assert(new File(r, "_manifest").delete())
    // next serve must sweep the orphan, rebuild from the source, and
    // publish a proven snapshot — never serve the partial files
    val served = BucketStore.ordersByOrderkey(spark, sf001)
    assert(served.count() === Tables.orders(spark, sf001).count())
    assert(!orphan.exists(), "torn orphan snapshot survived the repair")
    assert(dataFiles(snapDir("orders")).size === BucketStore.NumBuckets,
      "repair did not restore one file per bucket")
  }
}
