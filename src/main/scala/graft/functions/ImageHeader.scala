package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header decode from a binary payload — format,
  * pixel dimensions and channel count parsed from the actual bytes per
  * the PUBLIC format specifications (PNG: RFC 2083 / ISO 15948 §11.2.2
  * IHDR; JPEG: ITU-T T.81 §B.2.2 SOFn frame header; GIF: GIF89a spec §18
  * logical screen descriptor). No codec library involved: dimensions live
  * in fixed header fields, so a training-data pipeline can audit/filter
  * 100 TB of image payloads by size without ever running a decoder.
  *
  * Output: struct(format, width, height, channels, orientation). A
  * recognized magic with a truncated/absent dimension header keeps the
  * format but yields null dimensions (knowing "a corrupt PNG" beats
  * "unknown"); bytes with no known magic are ("unknown", null, null,
  * null, null). GIF is palette-indexed, so channels is null there (the
  * real count needs the color table).
  *
  * `orientation` is the EXIF orientation tag (0x0112 in the APP1 TIFF
  * IFD0, values 1–8 per the EXIF spec; null when absent — PNG/GIF and
  * EXIF-less JPEGs). width/height are ALWAYS the stored SOF dimensions:
  * for a camera-rotated image (orientation 5–8) the displayed axes are
  * swapped, and that policy belongs to the consumer (a resize pipeline
  * swaps, a storage auditor doesn't) — the expression reports both facts
  * and editorializes neither. Dimensions come from the FIRST SOFn marker,
  * baseline (C0/C1) and progressive (C2) alike — both carry the same
  * frame-header layout, and the walker skips APP1/EXIF segments like any
  * other marker on the way there. Pure per-row expression work inside
  * whole-stage codegen — no UDF, no shuffle, usable in any projection.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_header expects binary, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("orientation", IntegerType, nullable = true)))

  override def prettyName: String = "image_header"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeader.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageHeader {

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Any, h: Any, ch: Any, o: Any = null): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, ch, o))

  /** EXIF orientation (tag 0x0112, SHORT, 1–8) from an APP1 payload
    * spanning b[start, end): "Exif\0\0" + TIFF header (byte order, 42,
    * IFD0 offset) + IFD0 entries. Returns null on anything malformed —
    * the fuzz property requires degrade-never-throw, so every read is
    * bounds-checked against the segment, not just the buffer.
    */
  private def exifOrientation(b: Array[Byte], start: Int, end: Int): Any = {
    if (start + 6 > end) return null
    if (!(b(start) == 'E' && b(start + 1) == 'x' && b(start + 2) == 'i' &&
        b(start + 3) == 'f' && b(start + 4) == 0 && b(start + 5) == 0)) return null
    val t = start + 6 // TIFF header origin — IFD offsets are relative to it
    if (t + 8 > end) return null
    val le = b(t) == 'I' && b(t + 1) == 'I'
    val be = b(t) == 'M' && b(t + 1) == 'M'
    if (!le && !be) return null
    def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def u32(i: Int): Long =
      if (le) (u16(i) | (u16(i + 2).toLong << 16)) & 0xFFFFFFFFL
      else ((u16(i).toLong << 16) | u16(i + 2)) & 0xFFFFFFFFL
    if (u16(t + 2) != 42) return null
    val ifd0 = u32(t + 4)
    if (ifd0 < 8 || t + ifd0 + 2 > end) return null
    val d = (t + ifd0).toInt
    val count = u16(d)
    var e = 0
    while (e < count) {
      val entry = d + 2 + e * 12
      if (entry + 12 > end) return null
      if (u16(entry) == 0x0112) {
        // SHORT count 1: the value sits inline in the first two bytes of
        // the 4-byte value field
        if (u16(entry + 2) != 3 || u32(entry + 4) != 1L) return null
        val v = u16(entry + 8)
        return if (v >= 1 && v <= 8) v else null
      }
      e += 1
    }
    null
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // ---- PNG: 8-byte signature, then the IHDR chunk (always first):
    // length(4) "IHDR"(4) width(4,BE) height(4,BE) depth(1) colorType(1)
    if (n >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))) {
      val ihdr = n >= 26 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
      if (!ihdr) return row("png", null, null, null)
      val channels: Any = u8(b, 25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // RGBA
        case _ => null
      }
      return row("png", be32(b, 16), be32(b, 20), channels)
    }
    // ---- JPEG: FFD8, then marker segments; dimensions are in the first
    // SOFn frame header (markers C0–CF minus the non-frame C4/C8/CC —
    // progressive C2 included: same layout as baseline C0):
    // marker(2) length(2,BE incl. itself) precision(1) height(2) width(2)
    // components(1). APP1/EXIF segments encountered on the way are mined
    // for the orientation tag, then skipped like any other segment.
    if (n >= 2 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var orientation: Any = null
      var i = 2
      while (i + 3 < n) {
        if (u8(b, i) != 0xFF) return row("jpeg", null, null, null, orientation) // corrupt
        var j = i
        while (j + 1 < n && u8(b, j + 1) == 0xFF) j += 1 // fill bytes
        // a fill-byte run reaching end-of-input is a truncated stream —
        // degrade, don't read past the buffer
        if (j + 1 >= n) return row("jpeg", null, null, null, orientation)
        val m = u8(b, j + 1)
        if (m == 0xD9 || m == 0xDA) // EOI / SOS: no SOF seen
          return row("jpeg", null, null, null, orientation)
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i = j + 2 // standalone
        else {
          if (j + 3 >= n) return row("jpeg", null, null, null, orientation)
          val segLen = be16(b, j + 2)
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (j + 9 >= n) return row("jpeg", null, null, null, orientation)
            return row("jpeg", be16(b, j + 7), be16(b, j + 5), u8(b, j + 9), orientation)
          }
          if (segLen < 2) return row("jpeg", null, null, null, orientation) // corrupt
          if (m == 0xE1 && orientation == null)
            orientation = exifOrientation(b, j + 4, math.min(n, j + 2 + segLen))
          i = j + 2 + segLen
        }
      }
      return row("jpeg", null, null, null, orientation)
    }
    // ---- GIF: "GIF87a"/"GIF89a", then the logical screen descriptor:
    // width(2,LE) height(2,LE). Palette-indexed ⇒ channels unknown here.
    if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8), null)
    row("unknown", null, null, null)
  }
}
