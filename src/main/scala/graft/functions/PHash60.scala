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
  *
  * `perceptual = true` (registered as `phash60p`, mm14's production
  * signature since r19): a payload carrying a real image magic
  * (PNG/JPEG/GIF/BMP) is DECODED with the JDK's pure-Java ImageIO
  * readers — the same deterministic decode mm2's `decodeAssets` uses —
  * and the 60-segment compute runs over the row-major integer LUMA
  * plane (ITU-R BT.601: `(299R + 587G + 114B) / 1000`, integer-exact)
  * instead of the compressed byte stream. This is what makes the
  * operator live up to its name: a re-encoded copy of the same picture
  * (different compression ⇒ different bytes, different md5) has the
  * SAME pixels, hence the same luma stream, hence Hamming distance 0.
  * Fallback to the byte-stream compute is taken when the payload bears
  * no image magic, the decode fails (corrupt/exotic stream — NonFatal
  * caught, never kills the task), the decoded plane is under 60 pixels,
  * or the plane exceeds the overflow bound (decompression-bomb guard:
  * w×h > MaxBytes falls back BEFORE allocating the plane). On a UTF-8
  * prose corpus the decode branch is provably dead (0x89/0xFF cannot
  * start UTF-8; the ASCII GIF/BMP magics never decode from prose — the
  * mm2 argument), so the SQL oracle's byte-stream re-derivation remains
  * bit-exact there; the decode branch is gated on real crafted images
  * in MultimodalSpec.
  */
case class PHash60(child: Expression, perceptual: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"phash60 expects binary, got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = if (perceptual) "phash60p" else "phash60"

  private def fn: String = if (perceptual) "computePerceptual" else "compute"

  override protected def nullSafeEval(input: Any): Any =
    if (perceptual) PHash60.computePerceptual(input.asInstanceOf[Array[Byte]])
    else PHash60.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute()/computePerceptual() return a boxed java.lang.Long
    // (null = no signature); unbox behind an explicit null check so
    // codegen stays primitive on the hot path
    val boxed = ctx.freshName("phashBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $boxed = graft.functions.PHash60.$fn($c);
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

  /** Image magics the perceptual path attempts to decode — a superset of
    * mm2's (adds BMP, which ImageIO reads/writes losslessly and which
    * the re-encode spec uses as the second container). Magic-bearing
    * bytes that FAIL decode fall through to the byte-stream compute, so
    * a prose doc that happens to open with an ASCII magic ("GIF89a",
    * "BM") still hashes exactly as the oracle's byte-stream
    * re-derivation — the same differential argument mm2 pins.
    */
  private def hasImageMagic(b: Array[Byte]): Boolean =
    (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') ||
    (b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
      b(2) == 0xFF.toByte) ||
    (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') ||
    (b.length >= 2 && b(0) == 'B' && b(1) == 'M')

  /** Perceptual variant (see class scaladoc): decoded-luma grid for
    * payloads that really decode, byte-stream fallback otherwise. The
    * decode is the JDK's deterministic pure-Java ImageIO path (no
    * native codecs), so the signature remains a pure function of the
    * payload bytes — mm14 stays hash-gatable with this in the plan.
    */
  def computePerceptual(b: Array[Byte]): java.lang.Long = {
    if (b.length >= 2 && hasImageMagic(b) && b.length <= MaxBytes) {
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        // decompression-bomb guard + overflow bound BEFORE allocation;
        // under-60-pixel planes carry no grid signature — both fall back
        // to the byte stream rather than returning null, so tiny-but-real
        // images still dedup (exactly, via their encoded bytes)
        if (w.toLong * h >= Segments && w.toLong * h <= MaxBytes) {
          val luma = new Array[Byte](w * h)
          var y = 0
          var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val argb = img.getRGB(x, y)
              val r = (argb >>> 16) & 0xFF
              val g = (argb >>> 8) & 0xFF
              val bl = argb & 0xFF
              // BT.601 integer luma — exact, no floating point
              luma(i) = ((299 * r + 587 * g + 114 * bl) / 1000).toByte
              x += 1; i += 1
            }
            y += 1
          }
          return compute(luma)
        }
      }
    }
    compute(b)
  }
}
