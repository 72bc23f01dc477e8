package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a token array, each shingle the tokens
  * joined by a single space — semantically identical to
  * `array_distinct(transform(sequence(0, size(toks)-n),
  *   i -> concat_ws(' ', slice(toks, i+1, n))))` guarded for short inputs.
  *
  * Exists for two reasons the HOF formulation can't deliver:
  *  - `transform` lambdas run INTERPRETED (one closure dispatch + slice
  *    allocation per shingle per row) — this is a single codegen'd static
  *    call doing one sliding pass;
  *  - the HOF tree (sequence + transform + slice + concat_ws + when +
  *    array_distinct) is ~6 nested expression nodes whose analysis/codegen
  *    dominated the dedup family's cold start; this is one node.
  *
  * Null tokens are skipped inside a shingle (concat_ws semantics; DuckDB
  * `array_to_string` agrees). Fewer than n tokens ⇒ empty array, matching
  * the empty `range()` of the DuckDB oracle. First-occurrence order is
  * preserved like `array_distinct`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"word_shingles: n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls, matching concat_ws / DuckDB array_to_string;
      // it also allocates fresh bytes, so set keys never alias a reused
      // unsafe input buffer
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
