package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 60-bit perceptual-hash-shaped fingerprint over a binary payload — the
  * image near-dup signature (mm14). The real pHash recipe is: decode,
  * downscale to a coarse grid, one bit per cell = cell intensity above
  * the global mean. This expression runs EXACTLY that recipe with the
  * repo's documented stub-decode stand-in (the mm2/mm4 contract: no
  * codec libraries in this container, plumbing real): the "grid" is the
  * payload's byte stream split into 60 equal-width segments, a cell's
  * intensity is its mean byte value, and bit s = 1 iff segment s's mean
  * exceeds the whole payload's mean. For genuine images a production
  * deployment swaps the byte stream for the decoded luma plane inside
  * this same compute — the banding, verification, capping, and oracle
  * machinery downstream are signature-agnostic.
  *
  * Deterministic and INTEGER-EXACT, so a SQL oracle reproduces it
  * bit-for-bit: segment boundaries are `j*60/L` (byte j of L, the
  * standard equal-partition inverse map), and the mean comparison is
  * cross-multiplied (`segSum*L > totalSum*segLen`) — no floating point
  * anywhere. Bits pack little-endian by segment index (`1L << s`),
  * matching the dd5 SimHash layout so the pigeonhole band machinery
  * applies unchanged.
  *
  * Nullability contract: payloads under 60 bytes return NULL (a "grid"
  * cell would be empty — such payloads carry no perceptual signature;
  * route them to exact-hash dedup instead), as do payloads over
  * [[PHash60.MaxBytes]] (the cross-multiplication is proven overflow-free
  * only below it: segSum*L <= 255*L^2 < 2^63 requires L < ~1.9e8; the
  * conservative bound leaves 20% margin).
  */
case class PHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"phash60 expects binary, got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash60"

  override protected def nullSafeEval(input: Any): Any =
    PHash60.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute() returns a boxed java.lang.Long (null = no signature);
    // unbox behind an explicit null check so codegen stays primitive on
    // the hot path
    val boxed = ctx.freshName("phashBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $boxed = graft.functions.PHash60.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PHash60 =
    copy(child = newChild)
}

object PHash60 {

  val Segments = 60
  /** segSum*L <= 255*L^2 must stay under 2^63 ⇒ L < sqrt(2^63/255) ≈ 1.9e8. */
  val MaxBytes: Int = 150_000_000

  /** Boxed so null can signal "no signature" (under 60 bytes / over the
    * overflow bound) through both eval and codegen.
    */
  def compute(b: Array[Byte]): java.lang.Long = {
    val L = b.length
    if (L < Segments || L > MaxBytes) return null
    val segSum = new Array[Long](Segments)
    val segLen = new Array[Long](Segments)
    var total = 0L
    var j = 0
    while (j < L) {
      // segment of byte j: floor(j*60/L) — j*60 fits a long far below 2^63
      val s = (j.toLong * Segments / L).toInt
      val v = (b(j) & 0xFF).toLong
      segSum(s) += v
      segLen(s) += 1
      total += v
      j += 1
    }
    var sig = 0L
    var s = 0
    while (s < Segments) {
      // mean_seg > mean_all  ⟺  segSum*L > total*segLen (integer-exact)
      if (segSum(s) * L > total * segLen(s)) sig |= 1L << s
      s += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
