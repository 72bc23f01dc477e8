package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-language stopword lexicons — ONE source of truth shared by the
  * native [[StopCounts]] expression, the TextAnalysis operators and the
  * DuckDB oracle generators (which interpolate these words into SQL
  * `IN (...)` lists). Order is the scoring/tie-break order of the td2
  * argmax. Tiny fixed sets: they ride executor-side inside the expression
  * (the broadcast-variable equivalent); a real-scale lexicon (thousands of
  * entries per language) would become a broadcast-joined dimension
  * instead.
  */
object StopLexicons {
  val langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "den", "von"),
    "fr" -> Seq("le", "les", "et", "une", "est", "que", "pour", "dans", "de", "sur"),
    "es" -> Seq("el", "los", "de", "y", "un", "una", "es", "por", "con", "a"))

  /** Cross-lexicon membership is REAL in natural lexicons and the scorer
    * must count such a token for every language that claims it: here
    * "de" ∈ {fr, es} (the most common French word and a core Spanish
    * preposition) and "a" ∈ {en, es}. These overlaps also keep the
    * multi-bit path of [[StopCounts]] genuinely exercised (asserted in
    * ExpressionProps).
    */
  val overlapping: Set[String] = {
    val all = langs.flatMap(_._2)
    all.groupBy(identity).collect { case (w, os) if os.size > 1 => w }.toSet
  }
}

/** Per-language stopword occurrence counts of a token array in ONE pass:
  * returns `array<long>` of length |langs|, element i = number of tokens
  * present in lexicon i (occurrences, not distinct tokens).
  *
  * Semantically identical to
  * `array(size(filter(toks, t -> t.isin(lex_0))), ...)` per language —
  * but those `filter` lambdas run INTERPRETED (one closure dispatch per
  * token PER LANGUAGE per row, the dominant cost of the text family), and
  * the lexicons would ride the plan as repeated literal lists. Here every
  * token costs ONE hash lookup against an executor-cached
  * token → language-bitmask map, inside whole-stage codegen — scoring L
  * languages costs the same pass as scoring one. Null tokens are skipped,
  * matching `isin`'s null semantics under `filter` (counts are integers,
  * so bit-identity with the HOF form is exact — asserted in
  * ExpressionProps).
  */
case class StopCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"stop_counts expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stop_counts"

  override protected def nullSafeEval(input: Any): Any =
    StopCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StopCounts =
    copy(child = newChild)
}

object StopCounts {
  private val nLangs = StopLexicons.langs.size

  /** token → bitmask of the lexicons containing it (a word may belong to
    * several languages — see [[StopLexicons.overlapping]]: "de" ∈ {fr, es},
    * "a" ∈ {en, es} — and must count for each).
    */
  private val mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    StopLexicons.langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def compute(toks: ArrayData): ArrayData = {
    val counts = new Array[Long](nLangs)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val bits = mask.get(toks.getUTF8String(i))
        if (bits != null) {
          var b = bits.intValue()
          var l = 0
          while (b != 0) {
            if ((b & 1) != 0) counts(l) += 1
            b >>>= 1
            l += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
