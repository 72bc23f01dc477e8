package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE symbol count of one word under a FROZEN merge table — the native
  * twin of the rendered-string formulation
  * (`regexp_replace(w, "(.)", "|$1|")` followed by one literal `replace`
  * per merge, symbols = surviving delimiters / 2) that td26/st25 used.
  * Semantically identical by construction: a merge in the rendered string
  * replaces left-to-right non-overlapping occurrences of `|l||r|`, which
  * is exactly a greedy leftmost non-overlapping merge of adjacent symbol
  * spans — the published Sennrich apply step and the same loop
  * `trainBpeMerges` runs at training time.
  *
  * Exists because the rendered chain was the registry's largest 100×
  * constant (td26: one per-char regexp plus `nMerges` full-string
  * `replace` passes — each allocating a ~3×-length copy — per word
  * OCCURRENCE): here a word is scanned once into code-point spans and
  * each merge is one in-place compaction pass over int arrays; symbols
  * stay contiguous substrings of the input (a merge of adjacent spans is
  * their union), so no per-symbol strings are ever built. Same map-only
  * plan, ~order-of-magnitude smaller constant; the DuckDB oracle keeps
  * the replace-chain formulation, so the hash gate proves the two
  * formulations equal on every run.
  *
  * The merge table rides in `pairsSpec` ("l:r,l:r,…" in training order —
  * symbols are dictionary-admissible words' pieces, `[a-z]+` by the
  * [[graft.operators.TextAnalysis.BpeWordPattern]] admission, so the
  * delimiters are safe); it is a plan-shape constant baked into codegen
  * via a reference object, the WordShingles/MatchCount posture.
  */
case class BpeSymCount(child: Expression, pairsSpec: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_sym_count expects string, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_sym_count"

  @transient private lazy val pairs: Array[String] = BpeSymCount.parse(pairsSpec)

  override protected def nullSafeEval(input: Any): Any =
    BpeSymCount.compute(input.asInstanceOf[UTF8String], pairs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePairs", pairs, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeSymCount.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSymCount =
    copy(child = newChild)
}

object BpeSymCount {

  /** "l:r,l:r,…" → flat [l0, r0, l1, r1, …]; empty spec = no merges. */
  def parse(spec: String): Array[String] =
    if (spec.isEmpty) Array.empty
    else spec.split(',').flatMap { p =>
      val i = p.indexOf(':')
      require(i > 0 && i < p.length - 1, s"bpe_sym_count: bad pair '$p'")
      Array(p.substring(0, i), p.substring(i + 1))
    }

  /** Greedy leftmost non-overlapping merge chain over code-point spans;
    * returns the surviving symbol count. Spans are (start, end) indices
    * into the word — merging adjacent spans unions them, so symbols are
    * always contiguous substrings and equality is a region compare.
    */
  def compute(word: UTF8String, pairs: Array[String]): Long = {
    val s = word.toString
    val n = s.length
    if (n == 0) return 0L
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val w = Character.charCount(s.codePointAt(i))
      starts(m) = i; ends(m) = i + w; m += 1; i += w
    }
    var p = 0
    while (p + 1 < pairs.length) {
      val l = pairs(p); val r = pairs(p + 1)
      var out = 0
      i = 0
      while (i < m) {
        if (i + 1 < m && region(s, starts(i), ends(i), l) &&
            region(s, starts(i + 1), ends(i + 1), r)) {
          // merge: adjacent spans are contiguous, union them
          starts(out) = starts(i); ends(out) = ends(i + 1); out += 1; i += 2
        } else {
          starts(out) = starts(i); ends(out) = ends(i); out += 1; i += 1
        }
      }
      m = out
      p += 2
    }
    m.toLong
  }

  private def region(s: String, a: Int, b: Int, t: String): Boolean =
    b - a == t.length && s.regionMatches(a, t, 0, t.length)
}
