package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.VectorIndexStream

/** ANN recall audit at an arbitrary scale factor — the at-scale twin of
  * SimilaritySpec's recall gates, which run only at the staged test
  * scales. The 100 TB question those gates can't answer: do the LEARNED
  * cells (sim5's k-means quantizer, frozen for sim7/sim8's streaming
  * delta) keep finding the exact top-k as the corpus outgrows the
  * quantizer's training run? With derived k ([[Similarity.deriveKCells]],
  * k ∝ n/1024) the cell population stays ~constant, so recall at a fixed
  * probe count should hold — this main MEASURES that instead of arguing
  * it, on whatever corpus `SPARK_GRAFT_SF_DIR` points at (the scale
  * rehearsals point it at the `tools/scaleup.py` synth dirs).
  *
  * Ground truth is [[Similarity.topkExact]] (brute-force cosine top-k —
  * at 50× that is 100k × 20 dot products, a trivially distributed
  * broadcast-join scan). Each audited operator's (query, neighbor) pairs
  * are intersected with the exact set; recall = |∩| / |exact|. Collects
  * are bounded at nQueries × k rows (100) per operator — audit-scale,
  * never corpus-scale.
  *
  * Prints one JSON line and writes it to `SPARK_GRAFT_RECALL_OUT`
  * (default `bench/recall_last.json`) — same durable-record contract as
  * [[Bench]].
  */
object RecallCheck {

  /** (query_id, neighbor_id) pair set of a top-k result — the recall
    * currency. Bounded collect: nQueries × k rows.
    */
  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "bench/recall_last.json")
    val nQueries = 20
    val k = 5
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = Similarity.adm(spark, sfDir)
    val n = emb.count()
    val kCells = Similarity.deriveKCells(n)
    val exact = pairs(Similarity.topkExact(emb, nQueries, k))
    // The audited family: the learned-IVF serve (sim5), the
    // stream-maintained index (sim7: frozen quantizer trained on the base
    // HALF — the operator whose recall is most exposed to corpus growth,
    // its quantizer never saw the delta), and the compacted segment
    // (sim8: must serve the identical answer from a different layout).
    val audited: Seq[(String, () => DataFrame)] = Seq(
      "sim5_ann_ivf_learned" ->
        (() => Similarity.ivfAnnLearned(spark, sfDir, nQueries, k)),
      "sim7_stream_index_maintain" ->
        (() => VectorIndexStream.sim7StreamIndexMaintain(spark, sfDir, nQueries, k)),
      "sim8_ann_compacted_index" ->
        (() => VectorIndexStream.sim8ServeCompacted(spark, sfDir, nQueries, k)))
    val recalls = audited.map { case (name, fn) =>
      val got = pairs(fn())
      val recall = (exact & got).size.toDouble / exact.size
      println(f"[recall] $name%-28s $recall%.3f  (${(exact & got).size}/${exact.size})")
      name -> recall
    }
    val json =
      s"""{"sf":"$sfDir","n_vectors":$n,"k_cells":$kCells,""" +
        s""""n_queries":$nQueries,"k":$k,"n_exact_pairs":${exact.size},""" +
        s""""recall":{""" +
        recalls.map { case (q, r) => s""""$q":$r""" }.mkString(",") + "}}"
    println(json)
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, json)
    spark.stop()
  }
}
