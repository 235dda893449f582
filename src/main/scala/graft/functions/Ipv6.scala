package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** IPV6_MATCH(ip, 'subnet/prefix') — the reference's
  * `IPv6AddressMatchExprMacro` (query/expression/IPv6AddressMatchExprMacro
  * .java): true when the string IPv6 address falls inside the literal
  * subnet. The subnet is parsed once at plan time; per-row work is a
  * hand-rolled literal parser (no InetAddress — that could fall through to
  * DNS resolution on malformed values) plus a masked byte compare.
  * Malformed addresses yield false, like the reference.
  */
object Ipv6 {

  /** Parse an IPv6 literal (hex groups, one optional `::`) to 16 bytes;
    * null when malformed. Embedded IPv4 ("::ffff:1.2.3.4") unsupported,
    * matching the reference macro's hextet-form expectation.
    */
  def parse(s: String): Array[Byte] = {
    if (s == null || s.isEmpty || s.indexOf(':') < 0) return null
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null // one '::' max
    val (headStr, tailStr) =
      if (dc >= 0) (s.substring(0, dc), s.substring(dc + 2)) else (s, "")
    def groups(part: String): Array[String] =
      if (part.isEmpty) Array.empty else part.split(":", -1)
    val head = groups(headStr)
    val tail = groups(tailStr)
    val missing = 8 - head.length - tail.length
    if (dc < 0 && head.length != 8) return null
    if (dc >= 0 && missing < 1) return null
    val all = head ++ Array.fill(if (dc >= 0) missing else 0)("0") ++ tail
    if (all.length != 8) return null
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      val g = all(i)
      if (g.isEmpty || g.length > 4 ||
        !g.forall(c => Character.digit(c, 16) >= 0)) return null
      val v = Integer.parseInt(g, 16)
      out(2 * i) = (v >> 8).toByte
      out(2 * i + 1) = v.toByte
      i += 1
    }
    out
  }

  /** True when the first `bits` bits of `addr` equal those of `base`. */
  def prefixMatch(addr: Array[Byte], base: Array[Byte], bits: Int): Boolean = {
    var i = 0
    var remaining = bits
    while (remaining >= 8) {
      if (addr(i) != base(i)) return false
      i += 1; remaining -= 8
    }
    if (remaining == 0) true
    else {
      val mask = (0xFF << (8 - remaining)) & 0xFF
      (addr(i) & mask) == (base(i) & mask)
    }
  }
}

case class Ipv6Match(child: Expression, subnet: String)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  private val (base, bits) = {
    val Array(b, n) = subnet.split("/")
    val parsed = Ipv6.parse(b)
    require(parsed != null, s"bad IPv6 subnet literal: $subnet")
    val prefix = n.toInt
    require(prefix >= 0 && prefix <= 128, s"bad IPv6 prefix length: $n")
    (parsed, prefix)
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val addr = Ipv6.parse(v.asInstanceOf[UTF8String].toString)
      addr != null && Ipv6.prefixMatch(addr, base, bits)
    }
  }
  override protected def withNewChildInternal(c: Expression): Ipv6Match =
    copy(child = c)
}

object Ipv6Match {
  def ipv6Match(ip: Column, subnet: String): Column =
    toCol(Ipv6Match(toExpr(ip), subnet))
}
