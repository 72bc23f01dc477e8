package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.Tables

/** The recall claim sim2 makes (rows-only in the driver harness). */
class SimilaritySpec extends AnyFunSuite with SparkFixture {

  test("sim2 LSH ANN: recall >= 0.9 of sim1's exact top-5, and cosines are exact") {
    val emb = Tables.embeddings(spark, sf001)
    val exact = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val annRows = Similarity.lshAnn(emb).collect()
    val ann = annRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 100) // 20 queries x k=5
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall")
    // the cosine an ANN hit reports must equal the exact computation
    val exactCos = Similarity.topkExact(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    annRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(r.getDouble(2) === c))
    }
  }

  test("dd6 embed near-dups: no false positives, recall >= 0.85 vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf001)
    // brute force: every pair with cosine >= 0.4
    val e = emb.select(col("vec_id"), col("embedding"))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        graft.functions.r6(
          Similarity.cosine(col("a.embedding"), col("b.embedding"))).as("c"))
      .filter(col("c") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Similarity.embedNearDups(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty, "corpus must contain near-dup pairs at 0.4")
    // exact verify ⇒ zero false positives, and identical cosines
    got.foreach { case (k, c) =>
      assert(brute.contains(k), s"false positive pair $k")
      assert(brute(k) === c)
    }
    val recall = got.keySet.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.85, s"dd6 recall $recall over ${brute.size} pairs")
  }
}
