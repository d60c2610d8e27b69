package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass schema-on-read JSON object reader: `map<string,string>` from
  * the top-level keys of a JSON object, where each value is the RAW JSON
  * token text (strings keep their quotes, objects/arrays keep their
  * braces). One tokenizer pass per row replaces the per-key-per-use
  * `get_json_object` re-parse the dynamic renderers paid before (measured
  * 30-34 s/query at sf0.1; see BENCH.md) AND preserves the information the
  * reference renderer switches on — the actual JSON value type
  * (/root/reference/transformer/transformer.go:34-52): a JSON *string*
  * "89799" is distinguishable from the number 89799 because the raw token
  * keeps its quotes.
  *
  * Null result for anything that is not a JSON object (malformed payloads
  * route to the dead-letter path, transformer.go:26-28). Duplicate keys:
  * both entries are kept in document order; Spark's map lookup returns the
  * first — corpus payloads never carry duplicates.
  */
case class JsonKvRaw(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_kv_raw expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextJson.jsonKvRaw(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextJson.jsonKvRaw($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override def prettyName: String = "json_kv_raw"

  override protected def withNewChildInternal(newChild: Expression): JsonKvRaw =
    copy(child = newChild)
}

/** Decode a raw JSON *string* token (quoted, possibly escaped) to its value;
  * any other token passes through unchanged. The companion of [[JsonKvRaw]]
  * for rendering SQL literals from raw tokens.
  */
case class JsonUnquote(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_unquote expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextJson.jsonUnquote(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextJson.jsonUnquote($c)")

  override def prettyName: String = "json_unquote"

  override protected def withNewChildInternal(newChild: Expression): JsonUnquote =
    copy(child = newChild)
}

/** Split a raw JSON *array* token into its elements' raw tokens (one pass,
  * same tokenizer as [[JsonKvRaw]]); null for anything that is not a
  * well-formed JSON array. The companion for flattening nested array
  * values into child-table rows at runtime.
  */
case class JsonArrRaw(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_arr_raw expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextJson.jsonArrRaw(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextJson.jsonArrRaw($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override def prettyName: String = "json_arr_raw"

  override protected def withNewChildInternal(newChild: Expression): JsonArrRaw =
    copy(child = newChild)
}

/** The byte-level tokenizer. UTF-8 safe: every structural character is
  * ASCII and multi-byte sequences only use bytes >= 0x80, so byte-wise
  * scanning never mis-detects structure inside multi-byte characters.
  * Static methods so generated code stays inside whole-stage codegen.
  */
object TextJson {

  /** Max bracket nesting inside one raw value token; deeper input is
    * rejected as malformed (standard parser practice — Jackson caps at
    * 1000). Bounds the per-token kind-stack allocation in scanValue.
    */
  private val maxNestingDepth = 512

  /** Parse a JSON object's top level into (decoded key, raw value) pairs.
    * Returns null unless the input is a syntactically well-formed object.
    */
  def jsonKvRaw(s: UTF8String): MapData = {
    val b = s.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i = skipWs(b, i + 1, n)
    val keys = new java.util.ArrayList[AnyRef](8)
    val vals = new java.util.ArrayList[AnyRef](8)
    // 64-bit bloom of key hashes: a clear bit proves the key is NEW, so
    // the common no-duplicate case never pays the O(k) indexOf scan
    // (which made wide-document parsing O(k²) per payload — r3 ADVICE);
    // a set bit (real dup or hash collision) falls back to the exact scan
    var keyBloom = 0L
    if (i < n && b(i) == '}') {
      if (skipWs(b, i + 1, n) != n) return null
      return mapOf(keys, vals)
    }
    while (true) {
      if (i >= n || b(i) != '"') return null
      val keyEnd = scanString(b, i, n)
      if (keyEnd < 0) return null
      val key = decodeString(b, i + 1, keyEnd - 1)
      if (key == null) return null
      i = skipWs(b, keyEnd, n)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1, n)
      val valEnd = scanValue(b, i, n)
      if (valEnd < 0) return null
      // duplicate keys: LAST occurrence wins with a single entry — the
      // reference decodes into a Go map (encoding/json overwrites), and a
      // dup-keyed MapData would leak the key twice through map_keys into
      // rendered column lists
      val keyBit = 1L << (key.hashCode & 63)
      val dup = if ((keyBloom & keyBit) == 0L) -1 else keys.indexOf(key)
      keyBloom |= keyBit
      val tok = UTF8String.fromBytes(b, i, valEnd - i)
      if (dup >= 0) vals.set(dup, tok) else { keys.add(key); vals.add(tok) }
      i = skipWs(b, valEnd, n)
      if (i >= n) return null
      if (b(i) == '}') {
        if (skipWs(b, i + 1, n) != n) return null
        return mapOf(keys, vals)
      }
      if (b(i) != ',') return null
      i = skipWs(b, i + 1, n)
    }
    null // unreachable
  }

  /** Parse a JSON array's top level into raw element tokens. Returns null
    * unless the input is a syntactically well-formed array.
    */
  def jsonArrRaw(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '[') return null
    i = skipWs(b, i + 1, n)
    val elems = new java.util.ArrayList[AnyRef](8)
    if (i < n && b(i) == ']') {
      if (skipWs(b, i + 1, n) != n) return null
      return new GenericArrayData(elems.toArray)
    }
    while (true) {
      val valEnd = scanValue(b, i, n)
      if (valEnd < 0) return null
      elems.add(UTF8String.fromBytes(b, i, valEnd - i))
      i = skipWs(b, valEnd, n)
      if (i >= n) return null
      if (b(i) == ']') {
        if (skipWs(b, i + 1, n) != n) return null
        return new GenericArrayData(elems.toArray)
      }
      if (b(i) != ',') return null
      i = skipWs(b, i + 1, n)
    }
    null // unreachable
  }

  /** Raw JSON string token -> decoded value; passthrough otherwise. */
  def jsonUnquote(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    if (n < 2 || b(0) != '"' || b(n - 1) != '"') return s
    val d = decodeString(b, 1, n - 1)
    if (d == null) s else d
  }

  private def mapOf(keys: java.util.ArrayList[AnyRef],
                    vals: java.util.ArrayList[AnyRef]): MapData =
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray))

  private def skipWs(b: Array[Byte], from: Int, n: Int): Int = {
    var i = from
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  /** From an opening quote at `i`, return the index just past the closing
    * quote, or -1 if unterminated.
    */
  private def scanString(b: Array[Byte], i0: Int, n: Int): Int = {
    var i = i0 + 1
    while (i < n) {
      val c = b(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** From a value's first byte, return the index just past the value. */
  private def scanValue(b: Array[Byte], i0: Int, n: Int): Int = {
    if (i0 >= n) return -1
    b(i0) match {
      case '"' => scanString(b, i0, n)
      case '{' | '[' =>
        // bracket-KIND stack (not a shared depth counter): '{]' / '[}'
        // must be rejected at tokenization, or a mismatched nested token
        // would flow downstream as "syntactically well-formed". One byte
        // per open bracket, starting small (corpus payloads nest 1-3
        // deep; a 512B array per nested token would be hot-path churn)
        // and doubling up to the cap; nesting past the cap is
        // malformed-by-policy (Jackson-style depth limit), returned as
        // -1 like other bad input.
        var stack = new Array[Byte](16)
        var depth = 0
        var i = i0
        while (i < n) {
          b(i) match {
            case '"' =>
              val e = scanString(b, i, n)
              if (e < 0) return -1
              i = e
            case c @ ('{' | '[') =>
              if (depth == maxNestingDepth) return -1
              if (depth == stack.length)
                stack = java.util.Arrays.copyOf(stack,
                  math.min(stack.length * 2, maxNestingDepth))
              stack(depth) = c; depth += 1; i += 1
            case c @ ('}' | ']') =>
              depth -= 1
              if (depth < 0) return -1
              val open = stack(depth)
              if ((c == '}' && open != '{') || (c == ']' && open != '[')) return -1
              i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ =>
        // primitive: scan to the next structural delimiter, then validate
        // against the JSON grammar (true|false|null|number; leading zeros
        // tolerated) — an unvalidated run would otherwise flow BARE into
        // rendered SQL via sqlLiteralRaw's number branch
        var i = i0
        while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
        if (i == i0 || !validPrimitive(b, i0, i)) -1 else i
    }
  }

  private def validPrimitive(b: Array[Byte], from: Int, to: Int): Boolean = {
    def eq(s: String): Boolean =
      to - from == s.length && s.indices.forall(j => b(from + j) == s.charAt(j))
    if (eq("true") || eq("false") || eq("null")) return true
    // -?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?
    var i = from
    def digits(): Boolean = {
      val d0 = i
      while (i < to && b(i) >= '0' && b(i) <= '9') i += 1
      i > d0
    }
    if (i < to && b(i) == '-') i += 1
    if (!digits()) return false
    if (i < to && b(i) == '.') { i += 1; if (!digits()) return false }
    if (i < to && (b(i) == 'e' || b(i) == 'E')) {
      i += 1
      if (i < to && (b(i) == '+' || b(i) == '-')) i += 1
      if (!digits()) return false
    }
    i == to
  }

  /** Decode the bytes of a JSON string BODY (exclusive of quotes), handling
    * the standard escapes. Returns null on a malformed escape.
    */
  private def decodeString(b: Array[Byte], from: Int, to: Int): UTF8String = {
    var hasEscape = false
    var i = from
    while (i < to && !hasEscape) { if (b(i) == '\\') hasEscape = true; i += 1 }
    if (!hasEscape) return UTF8String.fromBytes(b, from, to - from)
    val sb = new java.lang.StringBuilder(to - from)
    val raw = new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '\\') {
        if (j + 1 >= raw.length) return null
        raw.charAt(j + 1) match {
          case '"' => sb.append('"'); j += 2
          case '\\' => sb.append('\\'); j += 2
          case '/' => sb.append('/'); j += 2
          case 'b' => sb.append('\b'); j += 2
          case 'f' => sb.append('\f'); j += 2
          case 'n' => sb.append('\n'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'u' =>
            if (j + 6 > raw.length) return null
            try {
              sb.append(Integer.parseInt(raw.substring(j + 2, j + 6), 16).toChar)
            } catch { case _: NumberFormatException => return null }
            j += 6
          case _ => return null
        }
      } else { sb.append(c); j += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
