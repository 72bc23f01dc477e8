package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) clustering key: interleave the low `bits` bits of
  * two non-negative long dimensions — `zorder_key(x, y, bits)` — the
  * multi-dimensional data-layout technique lakehouse table formats
  * expose as OPTIMIZE ZORDER BY. Writing a table
  * `repartitionByRange(zkey).sortWithinPartitions(zkey)` clusters rows
  * so that ANY aligned zkey range of size 4^k is exactly a 2^k × 2^k
  * quadtree tile: BOTH dimensions are bounded inside every such chunk,
  * so file-level min/max stats prune scans filtered on EITHER dimension
  * — where a single-column sort bounds one dimension and leaves the
  * other spanning the full domain. At 100 TB this is the difference
  * between two independent predicates both skipping files and one of
  * them always reading everything (q54's oracle-verified stats table
  * states the tile bound as data).
  *
  * Pure bit arithmetic (codegen'd, no allocation): bit i of `x` lands
  * at position 2i, bit i of `y` at 2i+1. `bits` is a plan-shape
  * constant (≤ 31 keeps the key in the positive long range). NULL in
  * either dimension ⇒ NULL key (the null group survives to the layout
  * stats rather than colliding with tile 0).
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"zorder_key bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKey.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Morton interleave of the low `bits` bits: x→even, y→odd positions. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((x >>> i) & 1L) << (2 * i)
      r |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }
}
