package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE pass: per-bit majority vote of
  * each token's xxhash64 (seed 42, identical to the SQL `xxhash64`
  * function, so signatures match the previous HOF formulation bit-for-bit).
  *
  * This replaces a nested `aggregate` HOF that re-folded the token array 64
  * times per row (and re-hashed every token 64 times). Here each token is
  * hashed once and votes into 64 counters — O(tokens × 64) bit-ops instead
  * of O(tokens × 64) full xxhash64 evaluations. Codegen-friendly: a single
  * static call, no boxing, participates in whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Seed matching Spark SQL's single-argument `xxhash64`. */
  private final val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
