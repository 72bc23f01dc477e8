package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH bucket ids for a vector: `nBands` independent
  * bands of `nPlanes` sign bits each, returned as array<long> (position =
  * band id).
  *
  * The Column-level formulation inlined nBands × nPlanes hyperplanes as
  * 64-element array LITERALS into the plan — ~100 giant constants per
  * reference, bloating analysis/codegen by seconds of fixed cost per query
  * (twice, for self-join branches). Here the plane matrix is generated
  * deterministically from (nBands, nPlanes, dim, seed) and CACHED per
  * executor; the plan carries only the four scalars.
  *
  * Plane generation replicates the previous driver-side
  * `Random(seed + band)` Gaussian sequence exactly (plane-major, then
  * dim-major), so bucket ids — and therefore ANN results and measured
  * recalls — are bit-identical to the literal-based formulation.
  */
case class RhpBuckets(
    child: Expression, nBands: Int, nPlanes: Int, dim: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_buckets"

  override protected def nullSafeEval(input: Any): Any =
    RhpBuckets.compute(input.asInstanceOf[ArrayData], nBands, nPlanes, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RhpBuckets.compute($c, $nBands, $nPlanes, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RhpBuckets =
    copy(child = newChild)
}

object RhpBuckets {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Double]]]()

  /** band-major matrix: planes(band * nPlanes + p)(d). Shared with
    * [[RhpProbes]] so a single-band bucket and the probe sequence are
    * computed against the IDENTICAL hyperplanes.
    */
  private[functions] def planes(nBands: Int, nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBands, nPlanes, dim, seed), _ => {
      val out = Array.ofDim[Array[Double]](nBands * nPlanes)
      var b = 0
      while (b < nBands) {
        val r = new scala.util.Random(seed + b)
        var p = 0
        while (p < nPlanes) {
          val v = new Array[Double](dim)
          var d = 0
          while (d < dim) { v(d) = r.nextGaussian(); d += 1 }
          out(b * nPlanes + p) = v
          p += 1
        }
        b += 1
      }
      out
    })

  def compute(vec: ArrayData, nBands: Int, nPlanes: Int, dim: Int, seed: Long): ArrayData = {
    val ps = planes(nBands, nPlanes, dim, seed)
    val n = math.min(vec.numElements(), dim)
    val buckets = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val plane = ps(b * nPlanes + p)
        var s = 0.0
        var d = 0
        while (d < n) { s += vec.getDouble(d) * plane(d); d += 1 }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      buckets(b) = bucket
      b += 1
    }
    new GenericArrayData(buckets)
  }
}
