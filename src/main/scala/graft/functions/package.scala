package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by every operator.
  *
  * The `d*` aggregates exist for oracle parity: summing doubles is
  * partition-order dependent, so a Spark sum and a DuckDB sum of the same
  * column can differ in the last ulps and break a hash compare. Casting each
  * value to DECIMAL(38,6) first makes the aggregation exact (and therefore
  * order-independent); the final cast back to double + round(6) then yields
  * bit-identical results in both engines. At 100 TB this costs one decimal
  * conversion per row inside the hash-aggregate — still map-side combined,
  * still a single shuffle.
  */
package object functions {
  private val Exact: DecimalType = DecimalType(38, 6)

  /** Order-independent (exact) sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Exact)).cast("double")

  /** Exact sum rounded to 6 decimals — safe to hash across engines. */
  def dsumr(c: Column): Column = r6(dsum(c))

  /** Exact average rounded to 6 decimals. Matches
    * `round(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)/COUNT(x), 6)`.
    */
  def davg(c: Column): Column = r6(dsum(c) / count(c))

  /** Round a double to 6 decimals the way DuckDB rounds doubles:
    * `std::round(x * 1e6) / 1e6` — the tie-break happens on the double
    * product, not on the decimal string. Spark's `round(c, 6)` instead
    * converts through BigDecimal's shortest string representation and
    * HALF_UPs THAT, which disagrees on knife-edge values (e.g. 41/640 =
    * 0.0640625 exactly as a decimal string, but ×1e6 = 64062.49999… as a
    * double: Spark said .064063, DuckDB .064062 — one real mismatch per
    * ~10^5 rows at sf0.1). Multiplying first makes both engines execute
    * the same double ops; `round(y)` at scale 0 then agrees with
    * std::round for every representable y, ties included.
    */
  def r6(c: Column): Column = round(c * lit(1e6)) / lit(1e6)

  /** Full English weekday name ("Monday".."Sunday"); Spark's datetime
    * patterns use Locale.US, matching DuckDB `dayname()` / `strftime("%A")`
    * (reference semantics: assignment1.ipynb:193, app.py:43).
    */
  def weekdayName(ts: Column): Column = date_format(ts, "EEEE")

  /** Monday=1..Sunday=7, for the reference's custom categorical sort
    * (assignment1.ipynb:376–384).
    */
  def weekdayRank(day: Column): Column =
    when(day === "Monday", 1)
      .when(day === "Tuesday", 2)
      .when(day === "Wednesday", 3)
      .when(day === "Thursday", 4)
      .when(day === "Friday", 5)
      .when(day === "Saturday", 6)
      .when(day === "Sunday", 7)

  /** Epoch seconds (floor) as long — matches DuckDB
    * `CAST(floor(epoch(ts)) AS BIGINT)`.
    */
  def epochSeconds(ts: Column): Column =
    floor(ts.cast("timestamp").cast("double")).cast("long")

  /** Whitespace character class shared VERBATIM by Spark (Java regex) and
    * the DuckDB oracles (RE2). Deliberately NOT `\s`: Java's `\s` includes
    * `\x0B` (vertical tab) but RE2's does not, so the same `\s+` pattern
    * tokenizes differently in the two engines. Both engines parse the
    * `\t \n \r \f \x0B` escapes identically, so spelling the class out
    * makes one string the single source of truth.
    */
  val WsClass: String = "[ \\t\\n\\r\\f\\x0B]"

  /** Whitespace tokenizer shared by the text operators: split on RUNS of
    * whitespace (tabs, newlines, multiple spaces — a single-space split
    * minted fake empty tokens for all of these), then drop the empty
    * tokens leading/trailing whitespace runs leave behind. NO `trim()`:
    * Spark's trim strips only ASCII space while DuckDB's also strips
    * unicode spaces (NBSP — found by the adversarial-corpus differential
    * run: a leading U+00A0 survived the engine and vanished in the
    * oracle), and the empty-token filter already covers everything trim
    * was there for — a `+`-quantified split leaves at most one leading
    * and one trailing empty, both removed. A whitespace-only document
    * therefore has ZERO tokens — callers dividing by the token count
    * guard with `nullif`. A NULL document (a web dump's deleted page)
    * ALSO tokenizes to zero tokens (r14, forced by the adversarial
    * asset corpus — the first corpus planting NULL text): without the
    * coalesce, tokens(NULL) is NULL and every downstream consumer
    * invents its own NULL story — a typed packer died on a NULL token
    * count (sa9), a NULL simhash grouped a doc with ITSELF through the
    * band keys while its signature read as garbage 0 from a
    * non-nullable struct slot (dd5), and td26 emitted NULL where its
    * contract says a word-free doc reports zeros. One contract, one
    * place, both twins. Matches [[tokensSql]] exactly.
    */
  def tokens(text: Column): Column =
    array_remove(split(coalesce(text, lit("")), WsClass + "+"), "")

  /** The DuckDB twin of [[tokens]], generated from the same [[WsClass]]
    * (DuckDB standard string literals pass the backslashes through to RE2
    * unprocessed, so the pattern text is byte-identical).
    */
  def tokensSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(coalesce($textExpr, ''), '$WsClass+'), x -> x != '')"

  /** ASCII-only case fold for HASH-BEARING paths (fingerprints, dedup
    * keys, URL hosts): `translate` over the 26 ASCII letters, identical
    * byte-for-byte in both engines. NOT `lower()`: full-Unicode case
    * mapping differs between Java (e.g. U+0130 'İ' → "i̇", TWO chars)
    * and DuckDB's utf8proc — found by the adversarial-corpus
    * differential run as an engine↔oracle hash divergence. The
    * documented contract is therefore ASCII case-insensitivity with
    * non-ASCII bytes preserved exactly — conservative for dedup (never
    * merges on locale-dependent folds).
    */
  val AsciiUpper: String = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  val AsciiLower: String = "abcdefghijklmnopqrstuvwxyz"
  def asciiLower(c: Column): Column = translate(c, AsciiUpper, AsciiLower)
  def asciiLowerSql(e: String): String =
    s"translate($e, '$AsciiUpper', '$AsciiLower')"

  /** Deterministic salted uniform draw in [0,1): the first 13 hex chars
    * (52 bits — exact in a double) of md5("salt:id"), divided by 2^52.
    * The ONE source of truth for every hash-randomized sampler (sa4
    * importance sampling, sa5 mixture rebalancing) and its oracle twin —
    * the constants (hash width, divisor, salt-concat shape) must never
    * drift between the Spark expression and the SQL, or between samplers.
    */
  def saltedUniform(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52

  /** The DuckDB twin of [[saltedUniform]], generated from the same
    * constants.
    */
  def saltedUniformSql(salt: String, idExpr: String): String =
    s"('0x' || substring(md5('$salt:' || CAST($idExpr AS VARCHAR)), 1, 13))::BIGINT" +
      " / CAST(4503599627370496 AS DOUBLE)"

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM twin of the SQL `('0x' || substring(md5(key), 1, nHex))::BIGINT`
    * pattern: the numeric value of the first `nHex` (≤ 15) hex chars of
    * md5(key)'s lowercase hex digest — the engine-portable hash every
    * DERIVED CONSTANT (LSH hyperplane components, MinHash permutation
    * coefficients) is drawn from, so a DuckDB oracle can regenerate the
    * identical constants from the same key strings. md5 hashes the UTF-8
    * bytes in both engines; ≤ 15 hex chars = ≤ 60 bits keeps the value
    * positive in a signed 64-bit integer.
    */
  def md5Bits(key: String, nHex: Int): Long = {
    require(nHex >= 1 && nHex <= 15, s"md5Bits: nHex must be in [1,15], got $nHex")
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** [[md5Bits]] over raw bytes (the per-ROW variant for native
    * expressions hashing UTF8String contents — same digest as Spark SQL's
    * `md5()` / DuckDB's `md5()` on the equivalent string).
    */
  def md5Bits(key: Array[Byte], nHex: Int): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(key)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Deterministic uniform CONSTANT in [0,1): 52-bit md5 prefix (exact in
    * a double) / 2^52 — the key-string twin of [[saltedUniform]], shared
    * by plane/permutation generators and their oracle SQL.
    */
  def md5Unit52(key: String): Double = md5Bits(key, 13) / 4503599627370496.0
}
