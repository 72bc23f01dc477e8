package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered (i < j) pair combinations of an array<struct<id, n>> posting
  * list, as array<struct<doc_a, na, doc_b, nb>> — with a SKEW CAP.
  *
  * The HOF formulation (`flatten(transform(ds, (a,i) => transform(slice(...`)
  * allocated one lambda dispatch + struct per emitted pair, interpreted —
  * the hottest stage of the n-gram Jaccard query. This is a tight two-loop
  * native expression.
  *
  * `maxBucket` bounds emission against adversarial skew: a list longer
  * than the cap (a megacluster — e.g. millions of byte-identical vectors
  * landing in one LSH bucket) emits a STAR over its minimum element
  * (`(ds[0], ds[i])` for i ≥ 1 — n−1 pairs) instead of all n(n−1)/2
  * combinations. The star preserves exactly what a dedup pipeline needs
  * from a hot bucket — every member stays connected to the cluster for
  * the downstream connected-components collapse — while turning the one
  * quadratic emission site into linear work. Below the cap (every benign
  * corpus; the caller's maxDf/bucket geometry keeps real lists far
  * smaller) output is byte-identical to the uncapped combination set, so
  * oracle hashes are unaffected. Callers that pre-bound their lists
  * (dd3's maxDf ≤ 50) use the 1-arg form (cap = Int.MaxValue).
  *
  * The input list must already be sorted by id (the caller's `sort_array`)
  * so i < j implies doc_a < doc_b — and so the star's hub is the MINIMUM
  * id, deterministically.
  */
case class PairCombs(child: Expression, maxBucket: Int = Int.MaxValue)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      if (maxBucket >= 2) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pair_combs: maxBucket must be >= 2, got $maxBucket")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pair_combs expects array<struct<long, long>>, got $other")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("na", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false),
      StructField("nb", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "pair_combs"

  override protected def nullSafeEval(input: Any): Any =
    PairCombs.compute(input.asInstanceOf[ArrayData], maxBucket)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairCombs.compute($c, $maxBucket)")

  override protected def withNewChildInternal(newChild: Expression): PairCombs =
    copy(child = newChild)
}

object PairCombs {
  def compute(ds: ArrayData, maxBucket: Int): ArrayData = {
    val n = ds.numElements()
    if (n > maxBucket) return computeStar(ds)
    // Fail LOUDLY on megaclusters instead of a negative allocation: the
    // pair count is computed in Long (for n >= 46341 the Int product
    // n(n−1)/2 already wraps) and must fit one array. A bucket that large
    // means the corpus carries a megacluster of identical items:
    // pre-collapse exact duplicates (dd1/dd2) or cap the bucket before
    // pair emission (the 2-arg form).
    val pairs = n.toLong * (n - 1) / 2
    require(pairs <= Int.MaxValue,
      s"pair_combs: posting list of $n elements would emit $pairs pairs; " +
        "pre-dedup exact duplicates or cap the bucket size")
    val out = new Array[Any](pairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ds.getStruct(i, 2)
      val da = a.getLong(0)
      val na = a.getLong(1)
      var j = i + 1
      while (j < n) {
        val b = ds.getStruct(j, 2)
        out(k) = InternalRow(da, na, b.getLong(0), b.getLong(1))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Overflow path: hub-and-spoke pairs over the sorted list's minimum
    * element — n−1 pairs, linear in the bucket.
    */
  private def computeStar(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val hub = ds.getStruct(0, 2)
    val da = hub.getLong(0)
    val na = hub.getLong(1)
    val out = new Array[Any](n - 1)
    var i = 1
    while (i < n) {
      val b = ds.getStruct(i, 2)
      out(i - 1) = InternalRow(da, na, b.getLong(0), b.getLong(1))
      i += 1
    }
    new GenericArrayData(out)
  }
}
