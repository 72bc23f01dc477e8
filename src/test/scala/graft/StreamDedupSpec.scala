package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.StreamDedup

/** st16's stream-vs-batch contract: the stateless stream-static band
  * join emits exactly the collisions a batch derivation over the same
  * split computes — and re-running the gate (fresh checkpoint replay)
  * changes nothing. The DuckDB hash gate covers the values; these hold
  * the engine-internal equivalence the oracle can't see.
  */
class StreamDedupSpec extends AnyFunSuite with SparkFixture {

  test("st16: streaming gate output == batch band-join twin, twice") {
    val docs = Tables.documents(spark, sf001)
    val newFrom = docs.agg(max(col("doc_id"))).head.getLong(0) - 49L
    val got = StreamDedup.st16StreamDedupGate(spark, sf001)
      .collect().map(_.toSeq).toSeq
    // batch twin: the same banded keys on both halves, same equi-join
    val keys = Dedup.bandedKeys(docs, 32, 3, 8)
    val expect = keys.filter(col("doc_id") >= newFrom)
      .join(keys.filter(col("doc_id") < newFrom)
          .select(col("band"), col("band_hash"), col("doc_id").as("hist_id")),
        Seq("band", "band_hash"))
      .select(col("doc_id"), col("hist_id"), col("band"))
      .orderBy(col("doc_id"), col("hist_id"), col("band"))
      .collect().map(_.toSeq).toSeq
    assert(got === expect)
    assert(got.nonEmpty, "the staged corpus's planted near-dups must collide")
    // every collision pairs an arrival with strict history
    assert(got.forall(r => r.head.asInstanceOf[Long] >= newFrom))
    assert(got.forall(r => r(1).asInstanceOf[Long] < newFrom))
    // replay: a second gate run (same checkpoint) reports the same hits
    val again = StreamDedup.st16StreamDedupGate(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(again === got)
  }
}
