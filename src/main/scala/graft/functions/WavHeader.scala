package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real WAV/RIFF audio-container header decode from a binary payload —
  * channel count, sample rate, bit depth and PCM data size parsed from
  * the actual bytes per the PUBLIC format specification (RIFF: Microsoft
  * Multimedia Programming Interface spec 1.0 §2; WAVE `fmt ` chunk:
  * WAVEFORMAT/WAVEFORMATEX layout). The audio twin of
  * [[ImageHeader]]: a training-data pipeline can audit/filter 100 TB of
  * audio payloads by duration and sample rate without running a decoder
  * — duration needs only `data`-chunk size and byte rate, both fixed
  * header fields.
  *
  * Output: struct(format, channels, sample_rate, bits_per_sample,
  * data_bytes, duration_ms). A RIFF/WAVE magic with a truncated or
  * absent `fmt `/`data` chunk keeps format "wav" but yields nulls for
  * whatever is missing ("a corrupt wav" beats "unknown"); any other
  * bytes are ("unknown", null, …). The chunk walk honors the spec's
  * word alignment (odd-sized chunks are padded to even offsets).
  * duration_ms = data_bytes · 1000 / byte_rate in exact long floor
  * arithmetic — engine-portable, no floating point. Pure per-row
  * expression inside whole-stage codegen — no UDF, no shuffle.
  */
case class WavHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"wav_header expects binary, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("data_bytes", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  override def prettyName: String = "wav_header"

  override protected def nullSafeEval(input: Any): Any =
    WavHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavHeader.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WavHeader =
    copy(child = newChild)
}

object WavHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def row(fmt: String, ch: Any, sr: Any, bits: Any,
      dataBytes: Any, durMs: Any): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), ch, sr, bits, dataBytes, durMs))

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // RIFF(4) riffSize(4,LE) WAVE(4), then chunks: id(4) size(4,LE) data…
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return row("unknown", null, null, null, null, null)
    var channels: Any = null
    var sampleRate: Any = null
    var bits: Any = null
    var byteRate = 0L
    var dataBytes: Any = null
    var i = 12
    while (i + 8 <= n && (channels == null || dataBytes == null)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
        // audioFormat(2) channels(2) sampleRate(4) byteRate(4)
        // blockAlign(2) bitsPerSample(2) — all little-endian
        channels = le16(b, i + 10)
        // the spec field is unsigned 32-bit; a value past Int.MaxValue is
        // a corrupt header — degrade to null, never a wrapped negative
        val sr = le32(b, i + 12)
        sampleRate = if (sr <= Int.MaxValue) sr.toInt else null
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        // the declared size counts even when the payload is truncated —
        // the header is the contract a 100 TB audit reads
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte; a chunk
      // whose declared extent overruns the buffer ends the walk (nothing
      // parseable can follow) — and can't overflow the cursor
      val step = size + (size & 1L)
      if (step > n - i - 8) i = n else i += 8 + step.toInt
    }
    val durMs: Any = dataBytes match {
      case d: Long if byteRate > 0 => d * 1000L / byteRate
      case _                       => null
    }
    row("wav", channels, sampleRate, bits, dataBytes, durMs)
  }
}
