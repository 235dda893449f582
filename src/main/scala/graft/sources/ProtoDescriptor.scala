package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.ProtobufWire

/** Compiled protobuf descriptor-set support — the analog of the reference's
  * descriptor-file decoder (`extensions-core/protobuf-extensions/src/main/
  * java/org/apache/druid/data/input/protobuf/FileBasedProtobufBytesDecoder
  * .java`, which loads a `protoc --descriptor_set_out` file and flattens
  * messages by name). A `FileDescriptorSet` is itself a protobuf wire-format
  * message (`google/protobuf/descriptor.proto`, public), so it is parsed
  * with the same `ProtobufWire` scanner used for data rows — no protobuf
  * runtime needed:
  *
  *   FileDescriptorSet   { repeated FileDescriptorProto file = 1; }
  *   FileDescriptorProto { name = 1; package = 2;
  *                         repeated DescriptorProto message_type = 4; }
  *   DescriptorProto     { name = 1; repeated FieldDescriptorProto field = 2;
  *                         repeated DescriptorProto nested_type = 3; }
  *   FieldDescriptorProto{ name = 1; number = 3; type = 5; }
  */
object ProtoDescriptor {

  /** One message field: flatten-target name, wire field number, and the
    * ProtoField decode kind its declared type maps to.
    */
  final case class FieldSpec(name: String, number: Int, kind: String)

  final case class MessageSpec(fullName: String, fields: Seq[FieldSpec])

  /** FieldDescriptorProto.Type → ProtoField kind (descriptor.proto enum;
    * groups (10) are proto2-legacy and unsupported, nested messages decode
    * as their serialized bytes for a second-level flatten).
    */
  private val typeKind: Map[Long, String] = Map(
    1L -> "double", 2L -> "float",
    3L -> "varint", 4L -> "varint", 5L -> "varint",   // int64/uint64/int32
    6L -> "fixed64", 7L -> "fixed32",
    8L -> "bool", 9L -> "string",
    11L -> "bytes", 12L -> "bytes",                   // message, bytes
    13L -> "varint", 14L -> "varint",                 // uint32, enum
    15L -> "fixed32", 16L -> "fixed64",               // sfixed32/64
    17L -> "zigzag", 18L -> "zigzag")                 // sint32/64

  private def str(b: Array[Byte], no: Int): Option[String] =
    ProtobufWire.findField(b, no).map {
      case (2, v: Array[Byte]) =>
        new String(v, java.nio.charset.StandardCharsets.UTF_8)
      case (w, _) => throw new IllegalArgumentException(
        s"descriptor field $no: expected string, wire type $w")
    }

  private def long(b: Array[Byte], no: Int): Option[Long] =
    ProtobufWire.findField(b, no).map {
      case (0, v: Long) => v
      case (w, _) => throw new IllegalArgumentException(
        s"descriptor field $no: expected varint, wire type $w")
    }

  private def messages(b: Array[Byte], no: Int): Seq[Array[Byte]] =
    ProtobufWire.findAll(b, no).map {
      case (2, v: Array[Byte]) => v
      case (w, _) => throw new IllegalArgumentException(
        s"descriptor field $no: expected message, wire type $w")
    }

  private def parseField(b: Array[Byte]): FieldSpec = {
    val name = str(b, 1).getOrElse(
      throw new IllegalArgumentException("field descriptor without a name"))
    val number = long(b, 3).getOrElse(
      throw new IllegalArgumentException(s"field $name without a number")).toInt
    val tpe = long(b, 5).getOrElse(9L) // absent type: treat as string
    val kind = typeKind.getOrElse(tpe, throw new IllegalArgumentException(
      s"field $name: unsupported descriptor type $tpe"))
    FieldSpec(name, number, kind)
  }

  private def parseMessage(b: Array[Byte], prefix: String): Seq[MessageSpec] = {
    val name = str(b, 1).getOrElse(
      throw new IllegalArgumentException("message descriptor without a name"))
    val full = if (prefix.isEmpty) name else s"$prefix.$name"
    val spec = MessageSpec(full, messages(b, 2).map(parseField))
    spec +: messages(b, 3).flatMap(parseMessage(_, full))
  }

  /** Parse a compiled descriptor set (the bytes of a `protoc
    * --descriptor_set_out` file) into message specs keyed by
    * package-qualified name, nested messages included.
    */
  def parseFileDescriptorSet(bytes: Array[Byte]): Seq[MessageSpec] =
    messages(bytes, 1).flatMap { file =>
      val pkg = str(file, 2).getOrElse("")
      messages(file, 4).flatMap(parseMessage(_, pkg))
    }

  /** Schema lookup by full or simple message name, like the reference's
    * `protoMessageType` config (simple-name match must be unique).
    */
  def schemaFor(descriptorSet: Array[Byte], messageName: String): Seq[FieldSpec] = {
    val all = parseFileDescriptorSet(descriptorSet)
    val hit = all.filter(m =>
      m.fullName == messageName || m.fullName.endsWith(s".$messageName"))
    hit match {
      case Seq(one) => one.fields
      case Seq() => throw new IllegalArgumentException(
        s"message $messageName not in descriptor set " +
          s"(has: ${all.map(_.fullName).mkString(", ")})")
      case many => throw new IllegalArgumentException(
        s"message $messageName is ambiguous: ${many.map(_.fullName).mkString(", ")}")
    }
  }

  /** Flatten a wire-format binary column into one typed column per
    * descriptor field — the Spark shape of the reference's row flattening
    * (`ProtobufInputFormat` → `ProtobufReader.flatten`). Decoding stays a
    * per-row projection: at scale this is a map-side-only stage with no
    * shuffle, exactly like any other parquet-column projection.
    */
  def flattenColumns(message: Column, fields: Seq[FieldSpec]): Seq[Column] =
    fields.map(f => ProtobufWire.protoField(message, f.number, f.kind).as(f.name))

  def flatten(df: DataFrame, messageCol: String,
      descriptorSet: Array[Byte], messageName: String): DataFrame =
    df.select(flattenColumns(df.col(messageCol),
      schemaFor(descriptorSet, messageName)): _*)

  // ----------------------------------------------------- fixture builder ----
  // Test-side counterpart: build a descriptor set without protoc (the
  // reference's tests ship pre-compiled .desc files; this image has no
  // protoc, so specs encode the descriptor with the same wire encoder).

  def buildDescriptorSet(pkg: String, message: String,
      fields: Seq[(String, Int, Long)]): Array[Byte] = {
    val fieldMsgs = fields.map { case (name, number, tpe) =>
      2 -> ProtobufWire.encode(Seq(
        1 -> name, 3 -> number.toLong, 5 -> tpe)): (Int, Any)
    }
    val msg = ProtobufWire.encode((1 -> (message: Any)) +: fieldMsgs)
    val file = ProtobufWire.encode(Seq(
      1 -> s"${message.toLowerCase}.proto", 2 -> pkg, 4 -> msg))
    ProtobufWire.encode(Seq(1 -> file))
  }
}
