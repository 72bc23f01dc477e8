package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Query-directed multi-probe sequence for single-band random-hyperplane
  * LSH (Lv et al., "Multi-Probe LSH", VLDB 2007, restricted to
  * perturbation sets of size ≤ 2): the `nProbe` cell ids a query should
  * inspect, most-likely first.
  *
  * The base cell is the vector's own sign-bit bucket (identical planes —
  * and therefore identical cells — as `rhp_buckets(vec, 1, nPlanes, dim,
  * seed)`, via the shared plane cache). Each further probe flips the
  * sign bits with the SMALLEST hyperplane margins |dot(vec, plane)| — the
  * bits most likely to differ for a true near neighbor. Candidate flip
  * sets of size ≤ 2 are ranked by their summed margin, ascending.
  *
  * This is the memory-optimal ANN index shape (IVF-style): ONE index
  * entry per corpus vector (vs. `nBands` entries for the OR-amplified
  * multi-band variant), with recall bought at query time by probing more
  * cells instead of at indexing time by storing more copies.
  */
case class RhpProbes(
    child: Expression, nPlanes: Int, dim: Int, seed: Long, nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_probes"

  override protected def nullSafeEval(input: Any): Any =
    RhpProbes.compute(input.asInstanceOf[ArrayData], nPlanes, dim, seed, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RhpProbes.compute($c, $nPlanes, $dim, ${seed}L, $nProbe)")

  override protected def withNewChildInternal(newChild: Expression): RhpProbes =
    copy(child = newChild)
}

object RhpProbes {
  def compute(vec: ArrayData, nPlanes: Int, dim: Int, seed: Long, nProbe: Int): ArrayData = {
    val ps = RhpBuckets.planes(1, nPlanes, dim, seed)
    val n = math.min(vec.numElements(), dim)
    val margins = new Array[Double](nPlanes)
    var base = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = ps(p)
      var s = 0.0
      var d = 0
      while (d < n) { s += vec.getDouble(d) * plane(d); d += 1 }
      margins(p) = math.abs(s)
      if (s >= 0) base |= (1L << p)
      p += 1
    }
    // flip masks of size <= 2 ranked by summed |margin| (base first, score
    // 0). Ties break on the MASK, not generation order — (score, mask) is
    // a total order a SQL oracle can reproduce with ORDER BY score, mask
    // (a stable sort's generation-order tie-break is invisible to SQL).
    val cand = scala.collection.mutable.ArrayBuffer[(Double, Long)]((0.0, 0L))
    var i = 0
    while (i < nPlanes) {
      cand += ((margins(i), 1L << i))
      var j = i + 1
      while (j < nPlanes) {
        cand += ((margins(i) + margins(j), (1L << i) | (1L << j)))
        j += 1
      }
      i += 1
    }
    val probes = cand.sortBy(c => (c._1, c._2)).take(nProbe).map(c => base ^ c._2).toArray
    new GenericArrayData(probes)
  }
}
