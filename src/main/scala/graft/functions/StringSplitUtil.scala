package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Java `String.split(regex)` (limit 0) semantics for STRING_TO_ARRAY /
  * STRING_TO_MV — reference `StringToArrayFunction`
  * (processing/src/main/java/org/apache/druid/math/expr/Function.java:3582):
  * trailing empty strings are DROPPED, which Spark's `split` cannot
  * reproduce (Spark treats limit 0 as "no limit" and keeps them — verified
  * live: `split('a,b,,', ',')` → 4 elements). Null input string → NULL
  * array; null delimiter → split on the empty regex (per character), per
  * the reference's `split != null ? split : ""`.
  */
object StringSplitUtil {

  // regexes are almost always literal per-query constants; cache compiled
  // patterns so the per-row cost is the split itself (bounded: worst case a
  // few distinct delimiters per query)
  private val patterns = new ConcurrentHashMap[String, Pattern]()
  private def pattern(r: String): Pattern = {
    val hit = patterns.get(r)
    if (hit != null) hit
    else {
      if (patterns.size > 1024) patterns.clear()
      patterns.computeIfAbsent(r, Pattern.compile(_))
    }
  }

  def javaSplit(s: UTF8String, r: UTF8String): ArrayData = {
    if (s == null) return null
    val parts = pattern(if (r == null) "" else r.toString).split(s.toString)
    new GenericArrayData(parts.map(UTF8String.fromString(_): Any))
  }
}
