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
  // patterns so the per-row cost is the split itself. Two-generation
  // rotation instead of a full clear: when the hot map fills, it becomes
  // the warm generation and lookups fall back to it before recompiling —
  // a workload with >1024 live delimiters degrades to at most one extra
  // map probe, never a thundering-herd recompile of its whole working set.
  @volatile private var warm = new ConcurrentHashMap[String, Pattern]()
  @volatile private var patterns = new ConcurrentHashMap[String, Pattern]()
  private def pattern(r: String): Pattern = {
    val hit = patterns.get(r)
    if (hit != null) return hit
    if (patterns.size > 1024) synchronized {
      if (patterns.size > 1024) { warm = patterns
        patterns = new ConcurrentHashMap[String, Pattern]() }
    }
    val old = warm.get(r)
    if (old != null) { patterns.putIfAbsent(r, old); old }
    else patterns.computeIfAbsent(r, Pattern.compile(_))
  }

  def javaSplit(s: UTF8String, r: UTF8String): ArrayData = {
    if (s == null) return null
    val parts = pattern(if (r == null) "" else r.toString).split(s.toString)
    new GenericArrayData(parts.map(UTF8String.fromString(_): Any))
  }
}
