package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real NPY (NumPy array file) header decode from a binary payload — the
  * TENSOR-asset format beside [[ImageHeader]]/[[WavHeader]]/[[Mp4Header]]:
  * embedding dumps, activation caches and preprocessed feature files ship
  * as `.npy`, and a 100 TB tensor audit (drop wrong-dtype files, bucket
  * by shape, count elements) reads only the header. Parsed per the PUBLIC
  * spec (numpy/lib/format.py, "NPY format" NEP 1): magic `\\x93NUMPY`,
  * major.minor version, little-endian header length (uint16 for 1.x,
  * uint32 for 2.x+), then the ASCII dict literal
  * `{'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }`.
  *
  * Output: struct(format, version, dtype, fortran_order, shape, n_elems).
  * A valid magic with a truncated or malformed header dict keeps format
  * "npy" with null fields (the corrupt-beats-unknown posture); the shape
  * tuple parses `()` (0-d scalar ⇒ n_elems 1), `(n,)` and `(a, b, …)`;
  * n_elems is the exact long product. Pure per-row expression inside
  * whole-stage codegen — no UDF, no shuffle.
  */
case class NpyHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"npy_header expects binary, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("version", StringType, nullable = true),
    StructField("dtype", StringType, nullable = true),
    StructField("fortran_order", BooleanType, nullable = true),
    StructField("shape", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("n_elems", LongType, nullable = true)))

  override def prettyName: String = "npy_header"

  override protected def nullSafeEval(input: Any): Any =
    NpyHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NpyHeader.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NpyHeader =
    copy(child = newChild)
}

object NpyHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private def row(fmt: String, ver: Any, dtype: Any, fortran: Any,
      shape: Any, n: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
      ver, dtype, fortran, shape, n))

  /** Extract the single-quoted string value following `key` in the header
    * dict, or null. The spec writes the dict with repr() so keys and
    * string values are single-quoted ASCII.
    */
  private def quotedValue(hdr: String, key: String): String = {
    val k = hdr.indexOf(s"'$key':")
    if (k < 0) return null
    // the value must START with a quote (spaces aside): a structured
    // descr like [('a', '<i4'), ...] is not a simple dtype, and grabbing
    // its first quoted token would mis-report field name "a" as the
    // dtype — corrupt-beats-unknown says report null instead
    var i = k + key.length + 3
    while (i < hdr.length && hdr.charAt(i) == ' ') i += 1
    if (i >= hdr.length || hdr.charAt(i) != '\'') return null
    val open = i
    val close = hdr.indexOf('\'', open + 1)
    if (close < 0) return null
    hdr.substring(open + 1, close)
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    // magic: \x93NUMPY major minor  (format.py: MAGIC_PREFIX + 2 bytes)
    if (n < 10 || u8(b, 0) != 0x93 || b(1) != 'N' || b(2) != 'U' ||
        b(3) != 'M' || b(4) != 'P' || b(5) != 'Y')
      return row("unknown", null, null, null, null, null)
    val major = u8(b, 6)
    val minor = u8(b, 7)
    val ver = UTF8String.fromString(s"$major.$minor")
    // header length: uint16 LE for 1.x, uint32 LE for 2.x+ (NEP 1)
    val (hdrStart, hdrLen) =
      if (major == 1) (10, (u8(b, 8) | (u8(b, 9) << 8)).toLong)
      else if (n >= 12)
        (12, (u8(b, 8) | (u8(b, 9) << 8) | (u8(b, 10) << 16)).toLong |
          (u8(b, 11).toLong << 24))
      else return row("npy", ver, null, null, null, null)
    if (hdrLen <= 0 || hdrStart + hdrLen > n)
      return row("npy", ver, null, null, null, null)
    // the dict is ASCII by spec (repr of a python dict of ASCII values)
    val hdr = new String(b, hdrStart, hdrLen.toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val descr = quotedValue(hdr, "descr")
    val fortran: Any = {
      val k = hdr.indexOf("'fortran_order':")
      if (k < 0) null
      else {
        val rest = hdr.substring(k + 16).dropWhile(_ == ' ')
        if (rest.startsWith("True")) true
        else if (rest.startsWith("False")) false
        else null
      }
    }
    val shape: Any = {
      val k = hdr.indexOf("'shape':")
      if (k < 0) null
      else {
        val open = hdr.indexOf('(', k)
        val close = if (open < 0) -1 else hdr.indexOf(')', open)
        if (open < 0 || close < 0) null
        else {
          val inner = hdr.substring(open + 1, close).trim
          try {
            val dims =
              if (inner.isEmpty) Array.empty[Long]
              else inner.split(',').map(_.trim).filter(_.nonEmpty)
                .map(java.lang.Long.parseLong)
            new GenericArrayData(dims.map(Long.box))
          } catch { case _: NumberFormatException => null }
        }
      }
    }
    val nElems: Any = shape match {
      case a: GenericArrayData =>
        var p = 1L
        var i = 0
        while (i < a.numElements()) { p *= a.getLong(i); i += 1 }
        p // 0-d () ⇒ 1 (a numpy scalar holds one element)
      case _ => null
    }
    row("npy", ver,
      if (descr == null) null else UTF8String.fromString(descr),
      fortran, shape, nElems)
  }
}
