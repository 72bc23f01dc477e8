package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array in ONE pass: per-bit majority vote of
  * each token's 60-bit md5 prefix ([[graft.functions.md5Bits]] over 15 hex
  * chars — `('0x' || substring(md5(t), 1, 15))::BIGINT` in DuckDB).
  *
  * 60 bits, not 64, deliberately: the md5-prefix hash is what makes the
  * signature ENGINE-PORTABLE (a SQL oracle regenerates it and the dd5
  * near-dup pair set hash-matches instead of being rows-only), and 15 hex
  * chars is the widest prefix that stays positive in a signed 64-bit
  * integer in both engines — a 16-char prefix overflows DuckDB's BIGINT
  * cast. 60 bits splits evenly into five 12-bit pigeonhole blocks for the
  * radius-3 banding in [[graft.operators.Dedup.simhashCandidates]].
  *
  * Each token is hashed once and votes into 60 counters — O(tokens × 60)
  * bit-ops. Codegen-friendly: a single static call, no boxing,
  * participates in whole-stage codegen.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** Signature width — five 12-bit blocks for the radius-3 pigeonhole. */
  final val Bits = 60

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = graft.functions.md5Bits(tokens.getUTF8String(i).getBytes, 15)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
