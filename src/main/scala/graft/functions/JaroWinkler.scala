package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Standard Jaro-Winkler similarity (Winkler boost 0.1, prefix cap 4,
  * boost threshold 0.7) — a string-similarity primitive for fuzzy
  * deduplication that Spark lacks. Implemented as a native Catalyst
  * expression WITH code generation (`doGenCode` emits a static call into
  * [[JaroWinklerImpl]]), the extension shape the engine prefers over UDFs:
  * null handling, casts, and the call all stay inside whole-stage codegen.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a.toString(), $b.toString())")

  override def prettyName: String = "jaro_winkler_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JaroWinklerImpl {
  /** Standard two-pass Jaro + Winkler prefix boost. */
  def similarity(s1: String, s2: String): Double = {
    val len1 = s1.length; val len2 = s2.length
    // empty operands score 0 even against each other (DuckDB-compatible)
    if (len1 == 0 || len2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val matchDistance = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val start = math.max(0, i - matchDistance)
      val end = math.min(i + matchDistance + 1, len2)
      var j = start
      var found = false
      while (j < end && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / len1 + m / len2 + (m - transpositions / 2) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      while (prefix < math.min(4, math.min(len1, len2)) &&
        s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      jaro + 0.1 * prefix * (1.0 - jaro)
    }
  }

  def jaroWinkler(a: Column, b: Column): Column =
    toCol(JaroWinklerSimilarity(toExpr(a), toExpr(b)))
}
