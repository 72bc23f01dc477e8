package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real TAR (USTAR) archive-header walk from a binary payload — the
  * CONTAINER format beside the per-asset headers
  * ([[ImageHeader]]/[[WavHeader]]/[[Mp4Header]]/[[NpyHeader]]): large
  * multimodal training sets ship as tar shards of samples (the
  * WebDataset convention — a shard is a plain `.tar` whose members
  * `000123.jpg`, `000123.txt`, `000123.json` form one sample), and a
  * 100 TB shard audit (member counts, payload mass, corrupt-shard
  * detection) reads ONLY the 512-byte headers, skipping every payload.
  * Parsed per the PUBLIC POSIX.1-1988/USTAR layout (name 100, size 12
  * octal at offset 124, typeflag at 156, `ustar` magic at 257; content
  * rounded up to 512-byte blocks; two zero blocks end the archive).
  *
  * Output: struct(format, n_members, n_files, total_payload,
  * first_name). Classification = the `ustar` magic in the FIRST block
  * (both the POSIX `ustar\0` and the legacy GNU `ustar ` spellings); a
  * classified archive whose later blocks are corrupt keeps format "tar"
  * with the members counted up to the corruption (the walk stops at the
  * first unparseable header — corrupt-beats-unknown, bounded). Pure
  * per-row expression inside whole-stage codegen — no UDF, no shuffle.
  */
case class TarMembers(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"tar_members expects binary, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_members", IntegerType, nullable = true),
    StructField("n_files", IntegerType, nullable = true),
    StructField("total_payload", LongType, nullable = true),
    StructField("first_name", StringType, nullable = true)))

  override def prettyName: String = "tar_members"

  override protected def nullSafeEval(input: Any): Any =
    TarMembers.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TarMembers.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TarMembers =
    copy(child = newChild)
}

object TarMembers {

  private def row(fmt: String, n: Any, nf: Any, tp: Any, fn: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), n, nf, tp, fn))

  /** `ustar` magic at offset 257 of a header block: POSIX `ustar\0` or
    * the legacy GNU `ustar ` (space) spelling.
    */
  private def ustarAt(b: Array[Byte], off: Int): Boolean =
    off + 263 <= b.length &&
      b(off + 257) == 'u' && b(off + 258) == 's' && b(off + 259) == 't' &&
      b(off + 260) == 'a' && b(off + 261) == 'r'

  /** Parse the NUL/space-terminated octal field at [off, off+len). */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { if (seen) return v }
      else return -1L
      i += 1
    }
    if (seen) v else -1L
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 512 || !ustarAt(b, 0))
      return row("unknown", null, null, null, null)
    var members = 0
    var files = 0
    var payload = 0L
    var firstName: Any = null
    var off = 0
    var done = false
    while (!done && off + 512 <= n) {
      if (b(off) == 0) done = true // zero block: end-of-archive marker
      else if (!ustarAt(b, off)) done = true // corrupt header: stop, keep counts
      else {
        val size = octal(b, off + 124, 12)
        if (size < 0) done = true
        else {
          members += 1
          val typeflag = b(off + 156)
          // '0' and NUL are regular files (POSIX); others (dirs, links,
          // pax headers) count as members only
          if (typeflag == '0' || typeflag == 0) {
            files += 1
            payload += size
          }
          if (firstName == null) {
            var end = off
            while (end < off + 100 && b(end) != 0) end += 1
            firstName = UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(b, off, end))
          }
          val blocks = (size + 511L) / 512L
          val step = 512L + blocks * 512L
          if (step > n - off) done = true else off += step.toInt
        }
      }
    }
    row("tar", members, files, payload, firstName)
  }
}
