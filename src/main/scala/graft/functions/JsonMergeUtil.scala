package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** JSON_MERGE (reference JsonMergeExprMacro,
  * processing/src/main/java/org/apache/druid/query/expression/
  * NestedDataExpressions.java:140-185): SHALLOW merge — top-level
  * `Map.putAll` for object+object (later argument wins per top-level key,
  * nested objects are replaced wholesale, NOT recursively merged),
  * top-level `List.addAll` for array+array (concatenation, duplicates
  * kept), and an error when an object meets an array (or either side is a
  * scalar). Any NULL argument (SQL NULL or JSON `null`) nulls the whole
  * result; malformed input THROWS, like the reference's strict argument
  * handling (a macro-level error, not a NULL). The variadic SQL form folds
  * pairwise left-to-right, matching the reference's accumulate loop.
  *
  * Invoked via StaticInvoke (codegen'd call site, no UDF boundary).
  */
object JsonMergeUtil {

  private def mapper = org.json4s.jackson.JsonMethods.mapper

  def merge(a: UTF8String, b: UTF8String): UTF8String = {
    if (a == null || b == null) return null
    val left = mapper.readValue(a.toString, classOf[Object])
    val right = mapper.readValue(b.toString, classOf[Object])
    if (left == null || right == null) return null
    val merged: Object = (left, right) match {
      case (lm: java.util.Map[_, _], rm: java.util.Map[_, _]) =>
        val out = new java.util.LinkedHashMap[Any, Any](
          lm.asInstanceOf[java.util.Map[Any, Any]])
        out.putAll(rm.asInstanceOf[java.util.Map[Any, Any]])
        out
      case (ll: java.util.List[_], rl: java.util.List[_]) =>
        val out = new java.util.ArrayList[Any](
          ll.asInstanceOf[java.util.List[Any]])
        out.addAll(rl.asInstanceOf[java.util.List[Any]])
        out
      case (_: java.util.Map[_, _], other) =>
        throw new IllegalArgumentException(
          s"json_merge: bad input [$other], expected object but got array")
      case (_: java.util.List[_], other) =>
        throw new IllegalArgumentException(
          s"json_merge: bad input [$other], expected array but got object")
      case _ =>
        throw new IllegalArgumentException(
          "json_merge: arguments must be JSON objects or arrays")
    }
    UTF8String.fromString(mapper.writeValueAsString(merged))
  }
}
