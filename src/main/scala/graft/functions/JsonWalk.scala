package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JSON_VALUE / JSON_QUERY / JSON_KEYS over JSON-text columns, matching the
  * reference's nested-column semantics exactly:
  *
  *  - Path grammar is a transcription of NestedPathFinder.parseJsonPath
  *    (processing/src/main/java/org/apache/druid/segment/nested/
  *    NestedPathFinder.java:139-247): `$` root (`$.` ≡ `$`), `.field`,
  *    `['field']` (backslash-escaped quotes kept verbatim, no unescaping),
  *    `[n]` with negative n addressing from the end
  *    (NestedPathArrayElement.java:42-68). Slice/union syntax (`[0:2]`,
  *    `[0,1]`), consecutive dots, `[` after `.`, bare `$a`, and
  *    unterminated quotes/brackets throw IllegalArgumentException — the
  *    reference rejects them as QueryInterruptedException (qaJsonCols
  *    func_json_value.02 A073-A076, func_json_query.03 A106-A109).
  *  - find: walk the tree; a missing key, JSON null, an index into a
  *    non-array, or a field of a non-object all yield SQL NULL
  *    (NestedPathFinder.find:42-53 over Java maps where JSON null is a
  *    Java null).
  *  - JSON_VALUE (JsonValueExprMacro, NestedDataExpressions.java:470-481):
  *    primitives AND primitive arrays (no container elements — the empty
  *    array included) pass through; objects and container-bearing arrays
  *    → NULL (func_json_value.01 A042-A047: `{}` → NULL, `[]` NOT NULL;
  *    .02 A086: `$.a_empty_array` non-null on populated rows). Scalars
  *    render unquoted with booleans coerced 1/0 (ExprEval.bestEffortOf —
  *    .03 A127: a_bool → 1); primitive arrays render as compact JSON with
  *    the same element coercion (the reference returns ARRAY<LONG> [1,0]
  *    for boolean arrays). A NEGATIVE array index yields NULL — the SQL
  *    layer plans literal-path JSON_VALUE onto NestedFieldVirtualColumn,
  *    which materializes non-negative element fields only (.02 A077-A079
  *    vs json_query's A110-A112 walking the macro).
  *  - JSON_QUERY (JsonQueryExprMacro:593-611): the subtree at the path as
  *    compact JSON — objects/arrays verbatim, scalar strings KEEP their
  *    quotes, booleans stay true/false; JSON null / missing → NULL.
  *    Negative indexes address from the end.
  *  - JSON_KEYS (NestedPathFinder.findKeys:62-77): object → field names,
  *    array → "0".."n-1", scalar/missing → NULL; empty containers → [].
  *
  * Facade caveat (shared with the rest of the JSON surface): the reference
  * operates on typed COMPLEX<json> columns; this engine's expression layer
  * operates on JSON text, so an unparseable input string is itself a
  * root-level scalar (func_json_value.01 A006: json_value('ABCD','$') =
  * 'ABCD') and a string value that spells valid JSON is indistinguishable
  * from a document. At ingest scale, JSON shreds to native columns
  * (Ingest.shredJson); this walker is the expression-level path, one
  * Jackson parse per call, invoked via StaticInvoke (no UDF boundary,
  * null-propagating on both arguments).
  */
object JsonWalk {
  private val mapper = new ObjectMapper()

  private sealed trait Part
  private final case class Field(name: String) extends Part
  private final case class Elem(idx: Int) extends Part

  private def bad(path: String, reason: String): Nothing =
    throw new IllegalArgumentException(
      s"json path [$path] is invalid: $reason")

  /** NestedPathFinder.parseJsonPath transcription (same accept/reject set). */
  private def parse(path: String): List[Part] = {
    if (path == null || path.isEmpty) return Nil
    if (!path.startsWith("$")) bad(path, "it must start with '$'")
    if (path.length == 1) return Nil
    val parts = scala.collection.mutable.ListBuffer.empty[Part]
    var partMark = -1
    var dotMark = -1
    var arrayMark = -1
    var quoteMark = -1
    var i = 1
    while (i < path.length) {
      val c = path.charAt(i)
      if (c == '.' && arrayMark < 0 && quoteMark < 0) {
        if (dotMark == i - 1) bad(path, s"'.' at invalid position $i")
        if (dotMark >= 0) parts += Field(path.substring(partMark, i))
        dotMark = i
        partMark = i + 1
      } else if (c == '[' && arrayMark < 0 && quoteMark < 0) {
        if (dotMark == i - 1) bad(path, s"'[' at invalid position $i")
        if (dotMark >= 0 && i > 1) {
          parts += Field(path.substring(partMark, i))
          dotMark = -1
        }
        arrayMark = i
        partMark = i + 1
      } else if (c == ']' && arrayMark >= 0 && quoteMark < 0) {
        val maybeNumber = path.substring(partMark, i)
        val idx =
          try maybeNumber.toInt
          catch {
            case _: NumberFormatException =>
              bad(path, s"array specifier [$maybeNumber] should be a number")
          }
        parts += Elem(idx)
        dotMark = -1
        arrayMark = -1
        partMark = i + 1
      } else if (dotMark == -1 && arrayMark == -1) {
        bad(path, "path parts must be separated with '.'")
      } else if (c == '\'' && quoteMark < 0) {
        if (arrayMark != i - 1)
          bad(path, "single-quote (') must be immediately after '['")
        quoteMark = i
        partMark = i + 1
      } else if (c == '\'' && quoteMark >= 0 && path.charAt(i - 1) != '\\') {
        if (i + 1 >= path.length)
          bad(path, "unterminated single-quote (')")
        if (path.charAt(i + 1) != ']') {
          if (arrayMark < 0)
            bad(path, "closing single-quote (') must immediately precede ']'")
          // else: quote inside an un-closed bracket — keep scanning
        } else {
          parts += Field(path.substring(partMark, i))
          dotMark = -1
          quoteMark = -1
          i += 1 // eat the closing ']'
          partMark = i + 1
          arrayMark = -1
        }
      }
      i += 1
    }
    if (partMark < path.length) {
      if (quoteMark != -1) bad(path, "unterminated single-quote (')")
      if (arrayMark != -1) bad(path, "unterminated '['")
      parts += Field(path.substring(partMark))
    }
    parts.toList
  }

  /** null for missing / JSON-null / type-mismatched steps. */
  private def find(root: JsonNode, parts: List[Part]): JsonNode = {
    var cur = root
    var rest = parts
    while (rest.nonEmpty && cur != null) {
      val next = rest.head match {
        case Field(name) if cur.isObject => cur.get(name)
        case Elem(idx) if cur.isArray =>
          val n = cur.size()
          val adj = if (idx < 0) n + idx else idx
          if (adj >= 0 && adj < n) cur.get(adj) else null
        case _ => null
      }
      cur = if (next != null && next.isNull) null else next
      rest = rest.tail
    }
    cur
  }

  private def parseDoc(json: UTF8String): JsonNode =
    try {
      val n = mapper.readTree(json.toString)
      if (n != null && n.isMissingNode) null else n // blank text → raw string
    } catch { case _: Exception => null }

  private def isPrimitiveArray(n: JsonNode): Boolean = {
    var i = 0
    while (i < n.size()) {
      if (n.get(i).isContainerNode) return false
      i += 1
    }
    true
  }

  /** Scalar coercion shared by JSON_VALUE's scalar and array paths:
    * booleans → 1/0 (ExprEval long), strings unquoted, numbers verbatim.
    */
  private def scalarText(n: JsonNode): String =
    if (n.isBoolean) { if (n.asBoolean()) "1" else "0" } else n.asText()

  def value(json: UTF8String, path: UTF8String): UTF8String =
    valueImpl(json, path, negIndexNull = true)

  /** The NATIVE expression macro (JsonValueExprMacro) resolves negative
    * array indexes via NestedPathArrayElement end-addressing — only the SQL
    * layer's literal-path planning onto NestedFieldVirtualColumn nulls them
    * (func_json_value.02 A077-A079 vs json_query's A110-A112), so native
    * queries ride this guard-free variant.
    */
  def valueNative(json: UTF8String, path: UTF8String): UTF8String =
    valueImpl(json, path, negIndexNull = false)

  private def valueImpl(json: UTF8String, path: UTF8String,
                        negIndexNull: Boolean): UTF8String = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    // literal-path JSON_VALUE plans onto the nested-field virtual column,
    // which has no negative element fields
    if (negIndexNull &&
        parts.exists { case Elem(i) => i < 0; case _ => false }) return null
    val root = parseDoc(json)
    if (root == null || root.isNull) {
      // unparseable text is itself a root-level string scalar
      return if (parts.isEmpty && !(root != null && root.isNull)) json
      else null
    }
    val at = find(root, parts)
    if (at == null) null
    else if (at.isContainerNode) {
      if (at.isArray && isPrimitiveArray(at)) {
        val sb = new java.lang.StringBuilder("[")
        var i = 0
        while (i < at.size()) {
          if (i > 0) sb.append(',')
          val e = at.get(i)
          if (e.isNull) sb.append("null")
          else if (e.isTextual) sb.append(e.toString) // keep quotes inside arrays
          else sb.append(scalarText(e))
          i += 1
        }
        UTF8String.fromString(sb.append(']').toString)
      } else null
    } else UTF8String.fromString(scalarText(at))
  }

  /** JSON_VALUE … RETURNING VARCHAR ARRAY element coercion — the reference
    * plans the array-RETURNING form onto a STRING_ARRAY expected type whose
    * element cast is String.valueOf (qaArray ingest_dynamic_rollup_false.02
    * E00: `a_mixed = json_value(a_nested, '$[6]' RETURNING varchar array)`
    * matches all rows), so booleans keep `true`/`false` here — UNLIKE the
    * untyped facade's bestEffort long coercion (booleans 1/0), which the
    * numeric array targets still ride. Same path grammar and SQL-layer
    * negative-index guard as [[value]]; non-array / nested-array targets
    * and JSON null → SQL NULL.
    */
  def valueStrArray(json: UTF8String, path: UTF8String): ArrayData = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    if (parts.exists { case Elem(i) => i < 0; case _ => false }) return null
    val root = parseDoc(json)
    if (root == null || root.isNull) return null
    val at = find(root, parts)
    if (at == null || !at.isArray || !isPrimitiveArray(at)) return null
    val out = new Array[Any](at.size())
    var i = 0
    while (i < at.size()) {
      val e = at.get(i)
      out(i) = if (e.isNull) null else UTF8String.fromString(e.asText())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** JSON_VALUE over an AUTO-TYPED nested column (CalciteNestedDataQueryTest
    * `all_auto`/`arrays` semantics): the SQL layer reads the SPECIALIZED
    * field column, so a SINGLE-element primitive array unwraps to its
    * scalar (SUM(JSON_VALUE(obj,'$.c')) counts the [100] row as 100 —
    * testSumPathWithArrays), a multi-element array is NULL (no scalar
    * cast), and negative indexes resolve from the end
    * (testJsonPathNegativeIndex) — unlike the v4-format [[value]] walk,
    * which passes primitive arrays through as text and nulls negative
    * indexes. The facade dispatches on the table's druid.autojson tag.
    */
  def valueTyped(json: UTF8String, path: UTF8String): UTF8String = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) {
      return if (parts.isEmpty && !(root != null && root.isNull)) json
      else null
    }
    val at = find(root, parts)
    if (at == null) null
    else if (at.isContainerNode) {
      if (at.isArray && at.size() == 1 && !at.get(0).isContainerNode &&
          !at.get(0).isNull)
        UTF8String.fromString(scalarText(at.get(0)))
      else null
    } else UTF8String.fromString(scalarText(at))
  }

  /** RETURNING <type> ARRAY over an auto-typed nested column: a scalar
    * target WRAPS into its single-element array (the field column is
    * ARRAY-typed, scalar rows are 1-element arrays —
    * testCountPathWithArraysReturning counts 'hello' and 12.3), primitive
    * arrays pass through, objects/nested arrays NULL.
    */
  def valueStrArrayTyped(json: UTF8String, path: UTF8String): ArrayData = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) return null
    val at = find(root, parts)
    if (at == null) return null
    if (at.isArray && isPrimitiveArray(at)) {
      val out = new Array[Any](at.size())
      var i = 0
      while (i < at.size()) {
        val e = at.get(i)
        out(i) = if (e.isNull) null else UTF8String.fromString(e.asText())
        i += 1
      }
      new GenericArrayData(out)
    } else if (!at.isContainerNode)
      new GenericArrayData(Array[Any](UTF8String.fromString(at.asText())))
    else null
  }

  /** The auto-typed walk rendered as JSON array TEXT (the numeric
    * RETURNING … ARRAY variants from_json this): primitive arrays keep
    * their compact text, scalars wrap as `[scalar]`, containers NULL.
    */
  def valueArrayJson(json: UTF8String, path: UTF8String): UTF8String = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) return null
    val at = find(root, parts)
    if (at == null) null
    else if (at.isArray && isPrimitiveArray(at))
      UTF8String.fromString(at.toString)
    else if (!at.isContainerNode)
      UTF8String.fromString("[" + at.toString + "]")
    else null
  }

  def query(json: UTF8String, path: UTF8String): UTF8String = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) {
      // raw string scalar at the root: serialize with quotes like the
      // reference's COMPLEX<json> rendering of a string value
      return if (parts.isEmpty && !(root != null && root.isNull))
        UTF8String.fromString(textNodeJson(json.toString))
      else null
    }
    val at = find(root, parts)
    if (at == null) null else UTF8String.fromString(at.toString)
  }

  private def textNodeJson(s: String): String =
    com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString

  /** JSON_QUERY_ARRAY (JsonQueryArrayExprMacro,
    * NestedDataExpressions.java:651-731): find the subtree with the SAME
    * path grammar as json_query (quoted fields, negative indexes, loud
    * slice/union rejection), then: a JSON array yields its ELEMENTS (each
    * rendered as the facade's element text — containers as compact JSON,
    * strings unquoted, other scalars verbatim); a scalar or object WRAPS
    * into a single-element array (ExprEval.asArray = new Object[]{value});
    * missing / JSON null → SQL NULL.
    */
  def queryArray(json: UTF8String, path: UTF8String): ArrayData = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) {
      // raw text at the root is itself a string scalar → 1-element wrap
      return if (parts.isEmpty && !(root != null && root.isNull))
        new GenericArrayData(Array[Any](json))
      else null
    }
    val at = find(root, parts)
    if (at == null) return null
    def elemText(n: JsonNode): UTF8String =
      UTF8String.fromString(
        if (n.isContainerNode) n.toString
        else if (n.isTextual) n.asText()
        else n.asText())
    if (at.isArray) {
      val out = new Array[Any](at.size())
      var i = 0
      while (i < at.size()) {
        out(i) = if (at.get(i).isNull) null else elemText(at.get(i))
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[Any](elemText(at)))
  }

  def keys(json: UTF8String, path: UTF8String): ArrayData = {
    if (json == null || path == null) return null
    val parts = parse(path.toString)
    val root = parseDoc(json)
    if (root == null || root.isNull) return null
    val at = find(root, parts)
    if (at == null) return null
    if (at.isObject) {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val it = at.fieldNames()
      while (it.hasNext) out += UTF8String.fromString(it.next())
      new GenericArrayData(out.toArray)
    } else if (at.isArray) {
      new GenericArrayData(
        Array.tabulate[Any](at.size())(i => UTF8String.fromString(i.toString)))
    } else null
  }
}
