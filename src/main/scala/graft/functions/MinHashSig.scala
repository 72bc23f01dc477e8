package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of a shingle array in ONE pass:
  * each shingle is hashed once (`xxhash64` seed 42, reduced into the 31-bit
  * domain mod P = 2^31 − 1) and k running minima of the universal hashes
  * `(a_i·h + b_i) mod P` are kept.
  *
  * Bit-identical to the previous HOF formulation
  * (`transform(sequence(0,k-1), i -> array_min(transform(hs, ...)))`):
  * same (a_i, b_i) drawn from `scala.util.Random(i)`, same accumulation.
  * That formulation ran k=32 nested INTERPRETED lambdas per row — the
  * dominant cost of the MinHash/LSH query; this is a tight two-loop static
  * call inside whole-stage codegen.
  *
  * Overflow posture (ANSI-safe): both operands of `a·h + b` are < 2^31, so
  * the product stays < 2^62 — no long overflow, and genuinely the universal
  * hash it claims (no silent wrap mod 2^64 before the mod).
  *
  * Empty input ⇒ empty array, mirroring the old
  * `when(size(hs) > 0, sig).otherwise(array())` guard. A NULL element is
  * hashed exactly as the HOF would: Spark's `xxhash64(NULL)` returns the
  * seed (42), so the element contributes `(a_i·42 + b_i) mod P` to the
  * minima — the bit-identical claim holds for null-containing arrays too
  * (the pipeline's `word_shingles` emits containsNull=false, but the
  * function is registered for general SQL use).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig: k must be >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31 − 1 (prime) — the universal-hash modulus. */
  final val P = 2147483647L

  /** Seed matching Spark SQL's single-argument `xxhash64`. */
  private final val Seed = 42L

  private val permCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]

  /** The (a_i, b_i) pairs for permutation i, drawn from Random(i) exactly
    * as the previous column formulation did — signatures stay bit-stable
    * across the refactor (and across JVMs: scala.util.Random is a seeded
    * LCG with fixed semantics).
    */
  private[graft] def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.getOrElseUpdate(k, {
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        val r = new scala.util.Random(i)
        as(i) = r.nextInt((P - 1).toInt).toLong + 1L
        bs(i) = r.nextInt(P.toInt).toLong
        i += 1
      }
      (as, bs)
    })

  private val Empty = new GenericArrayData(Array.empty[Long])

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return Empty
    val (as, bs) = perms(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      // xxhash64(NULL) = seed in Spark SQL — reproduce it, don't skip, so
      // the signature stays bit-identical to the HOF formulation for
      // null-containing arrays as well
      val h =
        if (shingles.isNullAt(i)) Seed % P
        else {
          val raw = XxHash64Function.hash(shingles.getUTF8String(i), StringType, Seed)
          val mod = raw % P
          if (mod < 0) mod + P else mod
        }
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
