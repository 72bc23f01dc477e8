package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches in a string — `regexp_count`
  * without the array: Spark lowers `regexp_count(s, p)` to
  * `size(regexp_extract_all(s, p, 0))` (visible in the executed plan),
  * which materializes one UTF8String per match only to take the length.
  * On token-counting queries (td4's two patterns, td12's three) that is
  * an allocation per token per pattern over the whole corpus. This
  * expression runs the identical `java.util.regex` find() loop and keeps
  * only the counter.
  *
  * Bit-compatible with `regexp_count` by construction: same
  * `Pattern.compile` (no flags), same `Matcher.find()` iteration — Java's
  * own zero-length-match advance rule — so the count equals
  * `size(regexp_extract_all(...))` for every input (property-tested
  * against the built-in in ExpressionProps). Returns long (the queries
  * cast anyway; emitting long saves the cast node).
  *
  * The pattern is a plan-shape constant baked into the expression (the
  * GraftExtensions registration requires a literal), compiled once per
  * JVM via the companion cache — never per row, never per batch.
  */
case class MatchCount(child: Expression, pattern: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"match_count expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "match_count"

  override protected def nullSafeEval(input: Any): Any =
    MatchCount.compute(input.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the pattern string travels through a codegen reference (it may
    // contain arbitrary regex punctuation — unescapable as a source
    // literal)
    val patRef = ctx.addReferenceObj("matchCountPattern", pattern, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.MatchCount.compute($c, $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatchCount =
    copy(child = newChild)
}

object MatchCount {
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  def compute(s: UTF8String, pattern: String): Long = {
    val p = patternCache.computeIfAbsent(pattern, java.util.regex.Pattern.compile(_))
    val m = p.matcher(s.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }
}
