package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf wire-format field extraction — the analog of the reference's
  * protobuf input format (`extensions-core/protobuf-extensions/.../
  * ProtobufInputFormat.java`, which flattens messages into rows via
  * descriptors). The protobuf-java runtime is not in this image, so the
  * decoder is implemented directly against the public wire-format spec
  * (https://protobuf.dev/programming-guides/encoding/): varint, 64-bit,
  * length-delimited, and 32-bit wire types, schema supplied as
  * (fieldNumber, type) by the caller instead of a compiled descriptor.
  *
  * Decoding is a per-row scalar over a binary column — the Spark-shaped
  * equivalent of the reference's row-flattening: `select(protoVarint(bytes,
  * 1), protoString(bytes, 2), …)` turns a message column into typed
  * columns, after which everything else is ordinary relational work.
  * Expressions are CodegenFallback (a hand-rolled byte scan per call), fine
  * off the hot aggregate path; a doGenCode loop is the upgrade path if
  * message decode ever dominates a profile.
  */
object ProtobufWire {

  /** Scan `bytes` for field `fieldNo`, returning (wireType, value) of the
    * LAST occurrence (protobuf semantics: later singular fields win).
    * Varints decode as Long; fixed64/fixed32 as raw bits; length-delimited
    * as the byte slice.
    */
  def findField(bytes: Array[Byte], fieldNo: Int): Option[(Int, Any)] =
    findAll(bytes, fieldNo).lastOption

  /** All occurrences of `fieldNo` in document order — repeated-field
    * iteration (descriptor messages are built almost entirely from
    * repeated fields).
    */
  def findAll(bytes: Array[Byte], fieldNo: Int): Seq[(Int, Any)] = {
    var i = 0
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Any)]
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while ({
        val b = bytes(i); i += 1
        acc |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      acc
    }
    while (i < bytes.length) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val value: Any = wire match {
        case 0 => varint()
        case 1 =>
          val v = java.nio.ByteBuffer.wrap(bytes, i, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          i += 8; v
        case 2 =>
          val len = varint().toInt
          val slice = java.util.Arrays.copyOfRange(bytes, i, i + len)
          i += len; slice
        case 5 =>
          val v = java.nio.ByteBuffer.wrap(bytes, i, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          i += 4; v
        case other =>
          throw new IllegalArgumentException(s"unsupported wire type $other")
      }
      if (field == fieldNo) found += ((wire, value))
    }
    found.toSeq
  }

  // ------------------------------------------------------------ encoder ----
  // Fixture/export-side counterpart (the reference's extension both parses
  // and, in tests, builds messages). Values: Long/Int/Boolean → varint,
  // Double → fixed64, Float → fixed32, String/Array[Byte] → length-delimited.

  def encode(fields: Seq[(Int, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def putVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    fields.foreach { case (no, value) =>
      value match {
        case null => // absent field
        case v: Long    => putVarint((no.toLong << 3) | 0); putVarint(v)
        case v: Int     => putVarint((no.toLong << 3) | 0); putVarint(v.toLong)
        case v: Boolean => putVarint((no.toLong << 3) | 0); putVarint(if (v) 1 else 0)
        case v: Double =>
          putVarint((no.toLong << 3) | 1)
          val bb = java.nio.ByteBuffer.allocate(8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v)
          out.write(bb.array())
        case v: Float =>
          putVarint((no.toLong << 3) | 5)
          val bb = java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(v)
          out.write(bb.array())
        case v: String =>
          val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          putVarint((no.toLong << 3) | 2); putVarint(b.length.toLong); out.write(b)
        case v: Array[Byte] =>
          putVarint((no.toLong << 3) | 2); putVarint(v.length.toLong); out.write(v)
        case other => throw new IllegalArgumentException(
          s"unsupported protobuf encode type: ${other.getClass}")
      }
    }
    out.toByteArray
  }

  /** Column API: decode field `fieldNo` of a protobuf message column as the
    * given kind ("varint" → LONG, "double", "float", "string", "bytes").
    */
  def protoField(message: Column, fieldNo: Int, kind: String): Column =
    toCol(ProtoField(toExpr(message), fieldNo, kind))

  def protoVarint(message: Column, fieldNo: Int): Column =
    protoField(message, fieldNo, "varint")
  def protoString(message: Column, fieldNo: Int): Column =
    protoField(message, fieldNo, "string")
  def protoDouble(message: Column, fieldNo: Int): Column =
    protoField(message, fieldNo, "double")
}

/** Scalar expression: extract one field from a protobuf wire-format binary
  * column. NULL for absent fields or NULL input.
  */
case class ProtoField(child: Expression, fieldNo: Int, kind: String)
  extends Expression with CodegenFallback
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = kind match {
    case "varint"  => LongType
    case "zigzag"  => LongType   // sint32/sint64
    case "bool"    => BooleanType
    case "double"  => DoubleType
    case "float"   => FloatType
    case "fixed64" => LongType   // fixed64/sfixed64 raw bits
    case "fixed32" => IntegerType
    case "string"  => StringType
    case "bytes"   => BinaryType
    case other => throw new IllegalArgumentException(s"bad proto kind: $other")
  }
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ProtobufWire.findField(v.asInstanceOf[Array[Byte]], fieldNo) match {
      case None => null
      case Some((wire, value)) => (kind, wire) match {
        case ("varint", 0) => value.asInstanceOf[Long]
        case ("zigzag", 0) =>
          val v = value.asInstanceOf[Long]; (v >>> 1) ^ -(v & 1)
        case ("bool", 0) => value.asInstanceOf[Long] != 0
        case ("double", 1) =>
          java.lang.Double.longBitsToDouble(value.asInstanceOf[Long])
        case ("fixed64", 1) => value.asInstanceOf[Long]
        case ("float", 5) =>
          java.lang.Float.intBitsToFloat(value.asInstanceOf[Int])
        case ("fixed32", 5) => value.asInstanceOf[Int]
        case ("string", 2) =>
          UTF8String.fromBytes(value.asInstanceOf[Array[Byte]])
        case ("bytes", 2) => value
        case (k, w) => throw new IllegalArgumentException(
          s"field $fieldNo has wire type $w, not decodable as $k")
      }
    }
  }
  override def prettyName: String = "proto_field"
  override protected def withNewChildInternal(c: Expression): ProtoField =
    copy(child = c)
}
