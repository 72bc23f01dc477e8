package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real MP4/ISO-BMFF video-container header decode from a binary payload —
  * major brand, movie timescale and duration parsed from the actual box
  * bytes per the PUBLIC format specification (ISO/IEC 14496-12 "ISO base
  * media file format": §4.2 box structure, §4.3 `ftyp`, §8.2.2 `mvhd`).
  * The video twin of [[ImageHeader]]/[[WavHeader]], completing the
  * image/audio/video modality triple: a training-data pipeline can audit
  * and filter 100 TB of video payloads by duration without touching a
  * codec — duration is a fixed header field of the `mvhd` box.
  *
  * Output: struct(format, major_brand, timescale, duration_units,
  * duration_ms). Classification is the `ftyp` magic at byte offset 4
  * (the first box of every conforming file); a classified file whose box
  * walk finds no parseable `moov`/`mvhd` keeps format "mp4" with null
  * fields ("a corrupt mp4" beats "unknown", the [[WavHeader]] posture).
  * `major_brand` is bytes 8–11 when all four are printable ASCII
  * (0x20–0x7E per the spec's four-character-code alphabet), else null.
  * The walk honors 64-bit `largesize` boxes (size==1) and
  * to-end-of-file boxes (size==0); any box whose declared extent
  * overruns the buffer ends the walk. `mvhd` is read in both versions
  * (v0: 32-bit timescale/duration at +12/+16; v1: 64-bit duration at
  * +20/+24 — §8.2.2.2). duration_ms = duration · 1000 / timescale in
  * exact long floor arithmetic — engine-portable, no floating point.
  * Pure per-row expression inside whole-stage codegen — no UDF, no
  * shuffle.
  */
case class Mp4Header(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"mp4_header expects binary, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType, nullable = true),
    StructField("timescale", IntegerType, nullable = true),
    StructField("duration_units", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  override def prettyName: String = "mp4_header"

  override protected def nullSafeEval(input: Any): Any =
    Mp4Header.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Header.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Mp4Header =
    copy(child = newChild)
}

object Mp4Header {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def row(fmt: String, brand: Any, ts: Any, dur: Any,
      durMs: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
      brand, ts, dur, durMs))

  /** Walk the boxes in b[from, to) looking for `boxType`; returns the
    * payload offset (past the 8- or 16-byte header) and payload end, or
    * null. Boxes overrunning the buffer end the walk (nothing parseable
    * can follow a corrupt extent).
    */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      boxType: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      // size==1: 64-bit largesize follows the type; size==0: to end
      val (hdr, size) =
        if (size32 == 1L && i + 16 <= to) (16, be64(b, i + 8))
        else if (size32 == 0L) (8, (to - i).toLong)
        else (8, size32)
      if (size < hdr || size > to - i) return None
      if (tag(b, i + 4, boxType)) return Some((i + hdr, i + size.toInt))
      i += size.toInt
    }
    None
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // first box must be ftyp: size(4,BE) 'ftyp' major_brand(4) …  (§4.3)
    if (n < 12 || !tag(b, 4, "ftyp"))
      return row("unknown", null, null, null, null)
    var printable = true
    var k = 8
    while (k < 12) { if (u8(b, k) < 0x20 || u8(b, k) > 0x7E) printable = false; k += 1 }
    val brand: Any =
      if (printable) UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 8, 12))
      else null
    var timescale: Any = null
    var duration: Any = null
    for {
      (mFrom, mTo) <- findBox(b, 0, n, "moov")
      (p, end)     <- findBox(b, mFrom, mTo, "mvhd")
      if end - p >= 1
    } {
      val version = u8(b, p)
      // v0: creation(4) modification(4) timescale(4) duration(4)
      // v1: creation(8) modification(8) timescale(4) duration(8)
      if (version == 0 && end - p >= 20) {
        val ts = be32(b, p + 12)
        timescale = if (ts <= Int.MaxValue) ts.toInt else null
        duration = be32(b, p + 16)
      } else if (version == 1 && end - p >= 32) {
        val ts = be32(b, p + 20)
        timescale = if (ts <= Int.MaxValue) ts.toInt else null
        duration = be64(b, p + 24)
      }
    }
    val durMs: Any = (duration, timescale) match {
      case (d: Long, ts: Int) if ts > 0 => d * 1000L / ts
      case _                            => null
    }
    row("mp4", brand, timescale, duration, durMs)
  }
}
