package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Input sources beyond the file formats Spark reads natively — the
  * reference's InputSource/InputFormat surface re-expressed on Spark's
  * connector APIs.
  */
object Sources {

  /** Delimited text input with multi-value cells (reference
    * `data/input/impl/DelimitedInputFormat.java` — `listDelimiter` splits a
    * cell like `a^Ab^Ac` (ctrl-A separated) into a multi-value dimension). Columns
    * named in `mvColumns` become `ARRAY&lt;STRING&gt;`, the engine's MVD
    * convention, so filters match any element and group-bys explode.
    */
  def delimited(spark: SparkSession, path: String,
                sep: String = "\t", listDelimiter: String = "\u0001",
                mvColumns: Seq[String] = Nil, header: Boolean = true,
                schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read
      .option("header", header.toString).option("sep", sep)
    val base = schema.fold(reader.option("inferSchema", "true"))(reader.schema)
      .csv(path)
    mvColumns.foldLeft(base) { (df, c) =>
      df.withColumn(c, org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col(c),
        java.util.regex.Pattern.quote(listDelimiter)))
    }
  }

  /** HTTP(S) input source (reference
    * `data/input/impl/HttpInputSource.java`: a list of URIs fetched and
    * parsed as one dataset, with optional basic auth). The fetch fans out
    * across executors — one URI per task — so a thousand-file ingest pulls
    * in parallel instead of streaming through the driver; the returned
    * line dataset feeds any text input format
    * (`spark.read.json(ds)` / `.csv(ds)`).
    */
  def httpLines(spark: SparkSession, uris: Seq[String],
                basicAuth: Option[(String, String)] = None,
                headers: Map[String, String] = Map.empty,
                timeoutMs: Int = 30000)
      : org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val auth = basicAuth.map { case (u, p) =>
      "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8"))
    }
    spark.sparkContext
      .parallelize(uris, math.max(1, uris.size))
      .flatMap { u =>
        val conn = java.net.URI.create(u).toURL.openConnection()
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        auth.foreach(conn.setRequestProperty("Authorization", _))
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val in = conn.getInputStream
        // materialize the split eagerly so the stream can close with the task
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      }
      .toDS()
  }

  /** SQL/JDBC input source (reference
    * `server/.../metadata/input/SqlInputSource.java`: ingest the result of
    * a SQL query against an external RDBMS). Spark's JDBC reader already
    * handles dialects, pushdown, and fetch batching; this wrapper adds the
    * one thing that matters at scale — a partitioned read, so N executors
    * each pull a key-range slice in parallel instead of one connection
    * streaming the whole table through a single task.
    *
    * @param bounds optional (column, lower, upper, numPartitions) range
    *               partitioning; unpartitioned single-connection read when
    *               absent (fine for dimension-sized tables only)
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           bounds: Option[(String, Long, Long, Int)] = None,
           props: java.util.Properties = new java.util.Properties)
      : DataFrame =
    bounds match {
      case Some((column, lo, hi, n)) =>
        spark.read.jdbc(url, table, column, lo, hi, n, props)
      case None => spark.read.jdbc(url, table, props)
    }

  // ------------------------------------------------------------- Avro ----
  // The reference's Avro input format (`extensions-core/avro-extensions`,
  // AvroOCFInputFormat for object-container files). The spark-avro
  // DataSource jar is not in this image, but the Avro core + mapred jars
  // are — so the read path is built directly on the public Avro APIs:
  // schema from the OCF header, parallel record reads via the Hadoop
  // AvroKeyInputFormat (block-splittable, so one big file still fans out
  // across executors).

  /** Catalyst type for an Avro schema (nullable unions unwrapped). */
  private[sources] def catalystType(s: Schema): (DataType, Boolean) =
    s.getType match {
      case Schema.Type.UNION =>
        // the common [null, T] nullable-union shape
        val nonNull = s.getTypes.asScala
          .filter(_.getType != Schema.Type.NULL).toSeq
        require(nonNull.length == 1, s"unsupported Avro union: $s")
        (catalystType(nonNull.head)._1, true)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.LONG    => (LongType, false)
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type: $other")
    }

  private[sources] def structFor(avro: Schema): StructType =
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = catalystType(f.schema())
      StructField(f.name(), dt, nullable)
    })

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (x, _) => x
  }

  /** Read an Avro object-container file (or a directory/glob of them) as a
    * DataFrame. The schema comes from the first file's OCF header; records
    * are read in parallel through `AvroKeyInputFormat`, which splits on
    * Avro block boundaries — the same scan parallelism as any other file
    * format.
    */
  def avro(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val p = new org.apache.hadoop.fs.Path(path)
    val firstFile =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".avro")).sortBy(_.getName).head
      else p
    // schema from the container header (driver-side, reads a few KB)
    val in = new org.apache.avro.mapred.FsInput(firstFile, conf)
    val reader = new org.apache.avro.file.DataFileReader(
      in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    val schema = structFor(avroSchema)
    val fieldTypes = schema.fields.map(_.dataType)

    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[GenericRecord]],
      classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
      classOf[org.apache.hadoop.io.NullWritable])
    val rows = rdd.map { case (key, _) =>
      val rec = key.datum()
      Row.fromSeq(fieldTypes.indices.map(i =>
        convert(rec.get(i), fieldTypes(i))))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write a DataFrame as Avro object-container files, one per partition —
    * the fixture-side counterpart of [[avro]] (and the OCF export path).
    * Built on the same public Avro APIs; supports the primitive types of
    * [[catalystType]] with nullable fields as [null, T] unions.
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchemaJson(schema)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fs0 = org.apache.hadoop.fs.FileSystem.get(conf.value)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val fs = org.apache.hadoop.fs.FileSystem.get(conf.value)
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$path/part-$idx.avro"))
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](
          avroSchema))
      writer.create(avroSchema, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        row.schema.fields.indices.foreach { i =>
          rec.put(i, row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x
          })
        }
        writer.append(rec); n += 1
      }
      writer.close()
      Iterator.single(n)
    }.count()
    ()
  }

  /** Avro schema JSON for a Catalyst struct (primitives only). */
  private[sources] def avroSchemaJson(schema: StructType): String = {
    def typeJson(dt: DataType): String = dt match {
      case StringType  => "\"string\""
      case LongType    => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType  => "\"double\""
      case FloatType   => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType  => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"unsupported Avro write type: $other (convert timestamps to long first)")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${typeJson(f.dataType)}]"""
        else typeJson(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(",")
    s"""{"type": "record", "name": "graft_record", "fields": [$fields]}"""
  }
}
