package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** JSON_MERGE (reference JsonMergeExprMacro,
  * processing/src/main/java/org/apache/druid/query/expression/
  * NestedDataExpressions.java:105-170): Jackson updating-reader semantics —
  * recursive OBJECT merge with later arguments winning, arrays and scalars
  * replaced wholesale; any NULL argument nulls the whole result. json4s
  * `merge` implements the same recursion; the variadic SQL form folds
  * pairwise (sequential later-wins merging is associative).
  *
  * Invoked via StaticInvoke (codegen'd call site, no UDF boundary).
  */
object JsonMergeUtil {

  def merge(a: UTF8String, b: UTF8String): UTF8String = {
    if (a == null || b == null) return null
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // malformed input THROWS, like the reference's parse_json-strict
    // argument handling (a macro-level error, not a NULL)
    val merged = JsonMethods.parse(a.toString) merge JsonMethods.parse(b.toString)
    UTF8String.fromString(JsonMethods.compact(JsonMethods.render(merged)))
  }
}
