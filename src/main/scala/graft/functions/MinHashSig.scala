package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of a shingle array in ONE pass:
  * each shingle is hashed once into the 31-bit domain mod P = 2^31 − 1 and
  * k running minima of the universal hashes `(a_i·h + b_i) mod P` are kept.
  *
  * ENGINE-PORTABLE by construction: the base hash is the 52-bit md5 prefix
  * ([[graft.functions.md5Bits]] — `('0x' || substring(md5(s),1,13))::BIGINT`
  * in DuckDB) mod P, and the (a_i, b_i) coefficients are md5 draws from the
  * fixed key strings "mh-a:i" / "mh-b:i" — so a SQL oracle regenerates the
  * identical signatures and the dd4 candidate SET is hash-checked, not just
  * recall-gated (the previous xxhash64/`Random(i)` derivation was
  * Spark/JVM-only). One tight two-loop static call inside whole-stage
  * codegen; md5 over a ~20-byte shingle is a fixed two-block digest.
  *
  * Overflow posture (ANSI-safe): both operands of `a·h + b` are < 2^31, so
  * the product stays < 2^62 — no long overflow, and genuinely the universal
  * hash it claims (no silent wrap mod 2^64 before the mod).
  *
  * Empty input ⇒ empty array, mirroring the
  * `when(size(hs) > 0, sig).otherwise(array())` guard of the HOF
  * formulation it replaced. A NULL element hashes as the empty string
  * (deterministic, though `word_shingles` emits containsNull=false).
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

  private val permCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]

  /** The (a_i, b_i) pair for permutation i: md5 draws from the key strings
    * "mh-a:i" (mod P−1, +1 ⇒ a ∈ [1, P−1]) and "mh-b:i" (mod P ⇒
    * b ∈ [0, P−1]) — the derivation a DuckDB oracle repeats verbatim over
    * `range(k)`. Must never drift from [[graft.operators.Dedup]]'s dd4
    * oracle SQL.
    */
  private[graft] def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.getOrElseUpdate(k, {
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        as(i) = graft.functions.md5Bits(s"mh-a:$i", 13) % (P - 1) + 1L
        bs(i) = graft.functions.md5Bits(s"mh-b:$i", 13) % P
        i += 1
      }
      (as, bs)
    })

  /** Base shingle hash: 52-bit md5 prefix mod P (md5 of the UTF-8 bytes —
    * what both engines' `md5()` digests). NULL hashes as "".
    */
  private[graft] def baseHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    graft.functions.md5Bits(
      if (s == null) Array.empty[Byte] else s.getBytes, 13) % P

  private val Empty = new GenericArrayData(Array.empty[Long])

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return Empty
    val (as, bs) = perms(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = baseHash(if (shingles.isNullAt(i)) null else shingles.getUTF8String(i))
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
