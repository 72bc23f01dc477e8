package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Same-JVM adjudication of the st18/st24 OOV membership rewrite
  * (array_contains over a V-element array literal → isInCollection):
  * cross-take rate comparisons on this host are window-confounded
  * (r18_NOTES "host-window variance"), so the two formulations are
  * timed against the same in-memory corpus in one session, and the
  * optimized plan is asserted to carry the InSet hash probe — if a
  * Spark upgrade stops rewriting In inside higher-order-function
  * lambdas, this fails loudly rather than silently re-shipping the
  * O(V × tokens) scan.
  */
class OovMembershipBenchSpec extends AnyFunSuite with SparkFixture {

  test("isInCollection inside the HOF lambda optimizes to InSet and is not slower than the array scan") {
    val vocab = (1 to 200).map(i => s"tok$i")
    val docs = spark.range(20000).select(
      col("id").as("doc_id"),
      // ~60 tokens/doc, half in-vocab, half OOV
      split(concat_ws(" ", (1 to 60).map(j =>
        concat(lit(if (j % 2 == 0) "tok" else "oov"),
          (col("id") * j % 200 + 1).cast("string"))): _*), " ").as("toks"))
      .persist()
    docs.count()

    val vlit = array(vocab.map(lit(_)): _*)
    def scanExpr = aggregate(col("toks"), lit(0L),
      (acc, t) => acc + when(array_contains(vlit, t), 0L).otherwise(1L))
    def insetExpr = aggregate(col("toks"), lit(0L),
      (acc, t) => acc + when(t.isInCollection(vocab), 0L).otherwise(1L))

    // the rewrite actually happens inside the lambda
    val optimized = docs.select(insetExpr.as("n_oov"))
      .queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("inset"),
      s"OptimizeIn did not rewrite inside the HOF lambda:\n$optimized")

    def time(c: org.apache.spark.sql.Column): (Double, Long) = {
      val df = docs.select(sum(c).as("s"))
      val t0 = System.nanoTime()
      val v = df.head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, v)
    }
    // warm both paths once, then best-of-3 each, interleaved
    time(scanExpr); time(insetExpr)
    val runs = (1 to 3).map(_ => (time(scanExpr), time(insetExpr)))
    val scanBest = runs.map(_._1._1).min
    val insetBest = runs.map(_._2._1).min
    // identical verdicts
    assert(runs.forall { case ((_, a), (_, b)) => a == b })
    info(f"array_contains best $scanBest%.3f s vs isInCollection best $insetBest%.3f s " +
      f"(${scanBest / insetBest}%.1fx) on 20k docs x 60 toks, V=200")
    // The plan-shape assertion above is the real guard. The wall-clock
    // comparison races the host (r18 advisor, low): on a contended box
    // the hash probe can lose a best-of-3 at V=200 to timer noise, so
    // the timing floor is only ENFORCED when the host is quiet — same
    // foreign-load signal as the bench's mid-run gate — and
    // informational otherwise.
    val foreign = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case s: com.sun.management.OperatingSystemMXBean =>
        val sys0 = s.getCpuLoad; val self0 = s.getProcessCpuLoad
        if (sys0.isNaN || self0.isNaN) 0.0
        else math.max(0.0, sys0 - self0) * Runtime.getRuntime.availableProcessors()
      case _ => 0.0
    }
    if (foreign <= 4.0)
      assert(insetBest <= scanBest * 1.15,
        f"InSet ($insetBest%.3f s) slower than the array scan ($scanBest%.3f s) on a quiet host")
    else
      info(f"host busy (foreign load $foreign%.1f cores) — timing floor informational only: " +
        f"InSet $insetBest%.3f s vs scan $scanBest%.3f s")
    docs.unpersist()
  }
}
