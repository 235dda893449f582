package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF-8-safe byte-budget truncation — the reference's
  * maxBytesPerString handling on string first/last aggregators
  * (processing `query/aggregation/firstlast/StringFirstLastUtils.java`):
  * keep at most `maxBytes` bytes, never splitting a code point.
  *
  * Used by the SQL `EARLIEST(expr, maxBytes)` / `LATEST(expr, maxBytes)`
  * 2-arg numeric-literal form (reference
  * `sql/.../aggregation/builtin/EarliestLatestAnySqlAggregator.java`,
  * where a numeric second argument is maxBytesPerString, NOT an ordering
  * column).
  */
case class ChopUtf8(child: Expression, maxBytes: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxBytes > 0, s"maxBytesPerString must be positive: $maxBytes")

  // maxBytesPerString only applies to string aggregations in the reference;
  // a non-string input is an analysis-time error here
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"maxBytesPerString applies to string inputs, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes <= maxBytes) s
    else {
      val b = s.getBytes
      var end = maxBytes
      // back off while the cut lands on a UTF-8 continuation byte
      while (end > 0 && (b(end) & 0xC0) == 0x80) end -= 1
      UTF8String.fromBytes(b, 0, end)
    }
  }

  override protected def withNewChildInternal(c: Expression): ChopUtf8 =
    copy(child = c)
}
