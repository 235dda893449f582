package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JSON_PATHS: enumerate the literal (leaf) field paths of a JSON document,
  * matching the reference's StructuredDataProcessor traversal
  * (processing/src/main/java/org/apache/druid/segment/nested/
  * StructuredDataProcessor.java:61-144 driven by
  * NestedDataExpressions.JsonPathsExprMacro:743):
  *
  *  - scalar values (including null literals) are leaves;
  *  - objects recurse per entry — an EMPTY object contributes nothing;
  *  - an array whose elements are all non-containers (a "primitive array",
  *    including the EMPTY array) is itself ONE leaf
  *    (JsonPathsExprMacro.processArrayField: bestEffortArray isPrimitiveArray
  *    → literal); an array containing any object/array recurses per element
  *    with `[i]` path parts;
  *  - a root-level scalar, NULL, or unparseable input yields ["$"]
  *    (processFields: non-container raw → one literal field at the root).
  *
  * Pinned by quidem qaJsonCols funcs_and_sql_func_json_paths.01 A001/A033/
  * A044: json_paths(__time) = [$]; deep c1 enumerates nested object, array
  * index, and empty-container leaves. Keys render as plain `.name` segments
  * (the gate fixtures use identifier-safe keys).
  *
  * Called via StaticInvoke from the SQL function registry — one parse per
  * row, no codegen fallback for the tree walk.
  */
object JsonPathsUtil {
  private val mapper = new ObjectMapper()

  private def isPrimitiveArray(n: JsonNode): Boolean = {
    var i = 0
    while (i < n.size()) {
      if (n.get(i).isContainerNode) return false
      i += 1
    }
    true
  }

  def paths(json: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def leaf(path: String): Unit =
      out += UTF8String.fromString(if (path.isEmpty) "$" else "$" + path)
    def walk(n: JsonNode, path: String): Unit =
      if (n.isObject) {
        val it = n.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          walk(e.getValue, path + "." + e.getKey)
        }
      } else if (n.isArray) {
        if (isPrimitiveArray(n)) leaf(path)
        else {
          var i = 0
          while (i < n.size()) { walk(n.get(i), path + "[" + i + "]"); i += 1 }
        }
      } else leaf(path)
    val root: JsonNode =
      if (json == null) null
      else
        try mapper.readTree(json.toString)
        catch { case _: Exception => null }
    if (root == null) leaf("") else walk(root, "")
    new GenericArrayData(out.toArray)
  }
}
