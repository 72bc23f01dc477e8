package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items ("heavy hitters") sketch as a typed
  * [[Aggregator]] — the custom-AGGREGATE extension seam (SURVEY §7.3)
  * shipped: a mergeable, bounded-memory summary that finds every term
  * whose true frequency exceeds N/(k+1) while holding AT MOST k counters
  * per partial aggregate, regardless of vocabulary size. The exact top-k
  * (td8's plan) keys a shuffle by every distinct term — correct, but its
  * partial-aggregate hash maps scale with the vocabulary; at 100 TB the
  * sketch is the candidate-generation path: k counters per task, one
  * k-entry map per partition crossing the wire, exact counts recovered
  * afterwards for the surviving candidates only.
  *
  * Guarantees (asserted in TextAnalysisSpec, valid under ANY reduce/merge
  * order, which is what makes a nondeterministically-merged distributed
  * aggregation sound):
  *  - no false negatives above the threshold: true count > N/(k+1) ⇒ the
  *    term is in the summary;
  *  - estimates never exceed the true count, and undershoot by at most
  *    N/(k+1) (the total decrement mass).
  * The specific ESTIMATES (not the guarantees) depend on merge order, so
  * the registry query is rows-only by design, like every sketch (q29).
  *
  * Classic streaming summary (Misra & Gries 1982; merge step per Agarwal
  * et al., "Mergeable Summaries", PODS 2012).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    // a NULL term is unattributable and, worse, un-ENCODABLE: Catalyst's
    // map encoder rejects null keys, so one null reaching the buffer
    // kills the whole aggregation (caught by the adversarial events
    // replay via st14). The sketch skips it; screening nulls at the
    // SOURCE remains the caller's contract (the st13 key-completeness
    // posture) — this is the never-throw backstop
    if (term == null) b
    else b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < k => b.updated(term, 1L)
      case None =>
        // full and unseen: decrement every counter (the arriving term's
        // +1 and one unit of every counter cancel), dropping zeros
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val cut = combined.values.toSeq.sortBy(-_)(Ordering.Long)(k)
      combined.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
