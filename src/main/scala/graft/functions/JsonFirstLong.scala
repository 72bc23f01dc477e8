package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `json_first_long(props, key)` — the engine-portable JSON long
  * extraction contract the adversarial-events replay forced (q24):
  * return the value of the FIRST top-level occurrence of `key` as a
  * long, and NULL for everything else. "Everything else" is precise:
  *
  *  - the document is not STRICT RFC 8259 JSON (single quotes, unquoted
  *    field names, trailing garbage, NaN literals, not JSON at all) — a
  *    full-document strict parse decides, not a prefix scan;
  *  - the key is absent at the top level (nested occurrences never
  *    count — the `$.key` path contract);
  *  - the value is not an INTEGER NUMBER TOKEN: JSON strings ("69"),
  *    decimals (12.5), exponent forms (1e3), objects, arrays, booleans
  *    and nulls are all NULL — no cross-type coercion, because coercion
  *    is where engines diverge (Spark's string→long and DuckDB's
  *    TRY_CAST disagree on '12.5', '1e3', even '0x10');
  *  - the integer overflows a signed 64-bit long.
  *
  * Duplicate keys: FIRST occurrence wins — the `get_json_object` /
  * DuckDB `json_extract` convention (Spark's `from_json` takes the
  * LAST, the divergence that killed the from_json formulation). The
  * rest of the document is STILL fully validated after the first hit:
  * `{"k": 1, oops}` is invalid, not 1.
  *
  * Why none of Spark's builtins work: `from_json` is lenient (accepts
  * single quotes) and last-key; `get_json_object` is lenient AND
  * renders string values unquoted, so `"69"` becomes indistinguishable
  * from `69`. Jackson's FACTORY DEFAULTS are exactly RFC-strict — it is
  * Spark's own JSON options that switch the leniency on — so this
  * expression is a plain default-Jackson streaming parse: one pass, no
  * tree, no allocation beyond the parser.
  *
  * The DuckDB twin (generated beside the engine form in Analytics):
  * `CASE WHEN json_valid(props) AND regexp_matches(CAST(json_extract(
  * props, '$.key') AS VARCHAR), '^-?[0-9]+$') THEN TRY_CAST(... AS
  * BIGINT) END` — yyjson's validity matches strict Jackson on every
  * planted class, the raw-text integer regex reproduces the
  * integer-token-only rule (a JSON string renders quoted, a decimal
  * keeps its point), and TRY_CAST of a pure-integer rendering is exact
  * with NULL on long overflow, matching the overflow rule.
  */
case class JsonFirstLong(child: Expression, key: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_first_long expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_first_long"

  override protected def nullSafeEval(input: Any): Any =
    JsonFirstLong.compute(input.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonFirstLongKey", key, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.functions.JsonFirstLong.compute($c, $keyRef);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonFirstLong =
    copy(child = newChild)
}

object JsonFirstLong {
  // Factory DEFAULTS = RFC 8259 strict (Spark's readers opt IN to the
  // leniency features; we opt into none). Shared, thread-safe. One
  // constraint is RAISED rather than defaulted: Jackson 2.15 caps
  // nesting depth at 1000 while yyjson (the oracle's validator) has no
  // such cap — a 1001-deep document would read invalid here and valid
  // there. 100k nesting levels of garbage still parse in microseconds,
  // so the wide limit costs nothing and keeps the twins aligned.
  //
  // KNOWN residual divergence (documented, unexercised): a LONE
  // SURROGATE escape ("\ud800" unpaired) is accepted by Jackson and
  // rejected by yyjson's validator — a document that is only invalid by
  // that rule reads NULL oracle-side and parses engine-side. Detecting
  // it engine-side needs a second raw-text scan; deferred until a fuzz
  // round plants one.
  private val factory: JsonFactory = {
    val f = new JsonFactory()
    f.setStreamReadConstraints(
      com.fasterxml.jackson.core.StreamReadConstraints.builder()
        .maxNestingDepth(100000).build())
    f
  }

  /** Boxed so codegen/eval can see the NULL verdict. */
  def compute(s: UTF8String, key: String): java.lang.Long = {
    val text = s.toString
    var result: java.lang.Long = null
    var seen = false
    val parser: JsonParser =
      try factory.createParser(text)
      catch { case _: Exception => return null }
    try {
      if (parser.nextToken() != JsonToken.START_OBJECT) {
        // a bare scalar/array can be VALID JSON but has no $.key — still
        // must parse cleanly to the end to be "valid with null k"; any
        // parse error is the same NULL, so just bail to NULL either way
        while (parser.nextToken() != null) {}
        return null
      }
      var depth = 1
      while (depth > 0) {
        val t = parser.nextToken()
        if (t == null) return null // truncated document
        t match {
          case JsonToken.FIELD_NAME =>
            val hit = depth == 1 && !seen && parser.currentName() == key
            val v = parser.nextToken()
            if (v == null) return null
            v match {
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
                parser.skipChildren()
              case _ => ()
            }
            if (hit) {
              seen = true
              if (v == JsonToken.VALUE_NUMBER_INT)
                result =
                  try java.lang.Long.valueOf(parser.getLongValue)
                  catch { case _: Exception => null } // > 64-bit integer
            }
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
          case _ => ()
        }
      }
      // trailing garbage after the document = invalid
      if (parser.nextToken() != null) return null
      result
    } catch {
      case _: Exception => null // any strict-parse violation = NULL
    } finally parser.close()
  }
}
