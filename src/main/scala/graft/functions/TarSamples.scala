package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebDataset SAMPLE ASSEMBLY inside one tar shard: walk the USTAR
  * members (the [[TarMembers]] header rules — same magic test, octal
  * parse, 512-block rounding, zero-block termination, corrupt-header
  * stop) and group the FILE members by basename stem (the WebDataset
  * contract: `000123.jpg`/`000123.txt`/`000123.json` ARE one sample),
  * emitting one struct per sample: stem, part count, sorted
  * comma-joined extension inventory, and the `.txt` payload's
  * (md5, bytes) so the verdict row hash-gates the shard's bytes
  * end-to-end (the mm11 posture).
  *
  * This is the SHUFFLE-FREE twin of the un-tarred store's assembly
  * (`Multimodal.sampleAssembly`): file-per-modality layouts pay a
  * stem-group exchange because parts of one sample are separate
  * catalog entries, while a WebDataset shard holds a sample's parts
  * ADJACENT in one member stream — so the whole assembly runs inside
  * this per-row expression on a map-only `binaryFile` scan, and
  * parallelism is shard COUNT (the layout ships thousands of shards).
  * Member payloads are digested in place; a member whose declared
  * payload overruns the shard ends the walk un-emitted (its bytes
  * cannot be hashed), matching the parser's corrupt-stop posture.
  *
  * SCOPE: POSIX.1-1988 USTAR members only — the format graft's own
  * shard writer emits. A PAX extended header (typeflag 'x'/'g',
  * Python tarfile's default since 3.8) or GNU long-name member
  * ('L'/'K') can carry a name longer than the 100-byte USTAR name
  * field, so assembling the REMAINING members against their truncated
  * header names could silently mis-group stems. A shard containing
  * such a member is OUT OF SCOPE as a whole and the result is NULL —
  * not the samples walked before the stop, which r15's posture
  * emitted and the r15 advisor correctly called a plausible partial
  * set nothing marked as partial. NULL is the explicit signal; the
  * mm12 consumer turns it into a raise_error naming the shard, so an
  * out-of-scope shard can never pass as an assembled one.
  * [[TarMembers]] keeps walking because it REPORTS typeflags rather
  * than grouping by name. (Corrupt bytes — bad magic/octal, payload
  * overrun — keep the partial-stop posture shared with TarMembers:
  * that is byte damage mid-shard, where the walked prefix is the
  * recoverable content; format out-of-scope is a property of the
  * WHOLE shard.)
  * Duplicate txt parts in one stem keep the max (md5, bytes) — the
  * same tie rule as the un-tarred aggregation's max(when(...)).
  */
case class TarSamples(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"tar_samples expects binary, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("stem", StringType, nullable = false),
    StructField("n_parts", LongType, nullable = false),
    StructField("exts", StringType, nullable = false),
    StructField("txt_md5", StringType, nullable = true),
    StructField("txt_bytes", LongType, nullable = true))), containsNull = false)

  override def prettyName: String = "tar_samples"

  // NULL marks an out-of-scope (PAX/GNU) shard even when the input
  // bytes are non-null — see the SCOPE scaladoc.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TarSamples.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarSamples.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TarSamples =
    copy(child = newChild)
}

object TarSamples {

  private final class Sample {
    var nParts = 0L
    val exts = new java.util.TreeSet[String]()
    var txtMd5: String = null
    var txtBytes: Long = -1L
    var hasTxt = false
  }

  private def ustarAt(b: Array[Byte], off: Int): Boolean =
    off + 263 <= b.length &&
      b(off + 257) == 'u' && b(off + 258) == 's' && b(off + 259) == 't' &&
      b(off + 260) == 'a' && b(off + 261) == 'r'

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

  def compute(b: Array[Byte]): ArrayData = {
    val n = b.length
    val samples = new java.util.LinkedHashMap[String, Sample]()
    if (n >= 512 && ustarAt(b, 0)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var off = 0
      var done = false
      while (!done && off + 512 <= n) {
        if (b(off) == 0) done = true
        else if (!ustarAt(b, off)) done = true
        else {
          val size = octal(b, off + 124, 12)
          if (size < 0) done = true
          else {
            val blocks = (size + 511L) / 512L
            val step = 512L + blocks * 512L
            val typeflag = b(off + 156)
            if (step > n - off) done = true // payload overruns: un-hashable
            // PAX ('x'/'g') / GNU longname ('L'/'K') members can carry
            // names wider than the 100-byte USTAR field — the WHOLE
            // shard is out of this assembler's scope: return NULL, the
            // explicit signal, never a plausible partial sample set
            // (see scaladoc SCOPE)
            else if (typeflag == 'x' || typeflag == 'g' ||
                     typeflag == 'L' || typeflag == 'K') return null
            else {
              if (typeflag == '0' || typeflag == 0) {
                var end = off
                while (end < off + 100 && b(end) != 0) end += 1
                val name = new String(b, off, end - off,
                  java.nio.charset.StandardCharsets.UTF_8)
                val dot = name.lastIndexOf('.')
                val stem = if (dot < 0) name else name.substring(0, dot)
                val ext = if (dot < 0) "" else name.substring(dot + 1)
                val s = samples.computeIfAbsent(stem, _ => new Sample)
                s.nParts += 1
                s.exts.add(ext)
                if (ext == "txt") {
                  md.reset()
                  md.update(b, off + 512, size.toInt)
                  val hex = md.digest().map("%02x".format(_)).mkString
                  if (!s.hasTxt || hex.compareTo(s.txtMd5) > 0) s.txtMd5 = hex
                  if (!s.hasTxt || size > s.txtBytes) s.txtBytes = size
                  s.hasTxt = true
                }
              }
              off += step.toInt
            }
          }
        }
      }
    }
    val out = new Array[Any](samples.size())
    var i = 0
    val it = samples.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.getValue
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey),
        s.nParts,
        UTF8String.fromString(String.join(",", s.exts)),
        if (s.hasTxt) UTF8String.fromString(s.txtMd5) else null,
        if (s.hasTxt) s.txtBytes else null))
      i += 1
    }
    new GenericArrayData(out)
  }
}
