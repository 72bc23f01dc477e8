package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-script code-point ranges — the "small per-language profile table"
  * of the char-n-gram language-ID family (Cavnar–Trenkle 1994 / CLD's
  * script-detection first stage, both published). Whitespace tokenization
  * carries no signal for unsegmented scripts, so the discriminative
  * feature IS the character inventory: Unicode block membership (a char
  * unigram profile). ONE source of truth shared by the native
  * [[ScriptCounts]] expression and the DuckDB oracle generator (which
  * renders these ranges as `[\x{...}-\x{...}]` classes — RE2 and Java
  * regex share that syntax).
  *
  * Order is the output order of `script_counts`. Ranges are disjoint
  * across scripts; kana (hiragana + katakana) is what separates Japanese
  * from Chinese inside the shared Han block, and is therefore its own
  * counter.
  */
object ScriptProfiles {
  val scripts: Seq[(String, Seq[(Int, Int)])] = Seq(
    // CJK Unified Ideographs + Extension A
    "han" -> Seq((0x4E00, 0x9FFF), (0x3400, 0x4DBF)),
    // Hiragana + Katakana (incl. the U+30FC prolonged-sound mark)
    "kana" -> Seq((0x3040, 0x309F), (0x30A0, 0x30FF)),
    // Hangul syllables + Jamo
    "hangul" -> Seq((0xAC00, 0xD7A3), (0x1100, 0x11FF)),
    // Thai block (assigned letters/marks/digits)
    "thai" -> Seq((0x0E01, 0x0E5B)),
    "latin" -> Seq(('A'.toInt, 'Z'.toInt), ('a'.toInt, 'z'.toInt)))

  val index: Map[String, Int] = scripts.map(_._1).zipWithIndex.toMap

  /** Position of the trailing total-non-whitespace counter in the
    * `script_counts` output array (1-based for `element_at`: nScripts+1).
    */
  val nScripts: Int = scripts.size

  /** `[\x{lo}-\x{hi}...]` character class for the DuckDB oracle (RE2
    * parses `\x{...}` exactly like Java regex, so the same literal also
    * drives the Spark-side regexp twin asserted in the spec).
    */
  def classLiteral(script: String): String =
    scripts.toMap.apply(script)
      .map { case (lo, hi) => f"\\x{$lo%04X}-\\x{$hi%04X}" }
      .mkString("[", "", "]")

  // flat (lo, hi, scriptIdx) table sorted by lo, for the decode loop
  private[functions] val flat: Array[(Int, Int, Int)] =
    scripts.zipWithIndex
      .flatMap { case ((_, rs), i) => rs.map { case (lo, hi) => (lo, hi, i) } }
      .sortBy(_._1).toArray
}

/** Script-profile character counts of a string in ONE pass: returns
  * `array<long>` of length |scripts| + 1 — element i = number of code
  * points in script i's ranges ([[ScriptProfiles.scripts]] order), last
  * element = total NON-WHITESPACE code points (the ratio denominator;
  * whitespace per the tokenizer's [[graft.functions.WsClass]]).
  *
  * The regexp twin (`regexp_count` per script + a whitespace strip for
  * the denominator) costs one full regex pass per script per row; this
  * is a single UTF-8 decode loop with a 9-entry range scan per code
  * point, inside whole-stage codegen. Counting is by CODE POINT, not
  * UTF-16 unit, so supplementary characters (emoji) count once — same as
  * DuckDB's `length()`/RE2 semantics.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"script_counts expects string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"

  override protected def nullSafeEval(input: Any): Any =
    ScriptCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  private val n = ScriptProfiles.nScripts
  private val flat = ScriptProfiles.flat

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f' || cp == 0x0B

  def compute(s: UTF8String): ArrayData = {
    val counts = new Array[Long](n + 1)
    val bytes = s.getBytes
    val len = bytes.length
    var i = 0
    while (i < len) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      // standard UTF-8 decode, DEFENSIVE: Spark UTF8String is not
      // guaranteed valid UTF-8 (a binary→string cast is a byte copy), so
      // an invalid lead byte or a truncated tail must degrade — each bad
      // byte counts as one replacement code point and the loop resyncs —
      // never read past the buffer (a cleaning pipeline's whole point is
      // surviving dirty text)
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < len) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); i += 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < len) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); i += 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < len) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); i += 4
      } else {
        cp = 0xFFFD; i += 1
      }
      if (!isWs(cp)) {
        counts(n) += 1
        var r = 0
        while (r < flat.length) {
          val (lo, hi, idx) = flat(r)
          if (cp >= lo) {
            if (cp <= hi) { counts(idx) += 1; r = flat.length }
            else r += 1
          } else r = flat.length // sorted by lo: nothing further can match
        }
      }
    }
    new GenericArrayData(counts)
  }
}
