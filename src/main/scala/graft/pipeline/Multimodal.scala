package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * Codec status in this environment, probed not assumed: the JDK bundles
  * `javax.imageio` readers (PNG/JPEG/GIF/BMP/TIFF — see
  * [[availableImageCodecs]]) and `javax.sound.sampled` file readers
  * (WAVE/AU/AIFF — see [[availableAudioCodecs]]), so the IMAGE
  * ([[decodeImageFeatures]]) and AUDIO ([[decodeAudioFeatures]]) decode
  * paths are REAL decodes through real codecs. Video codecs are genuinely
  * absent, so frame sampling remains a clearly-marked deterministic stub
  * with the production schema / batch shape / partition-parallel
  * execution.
  *
  * At 100 TB the pattern is: binary payloads stay in parquet (or are
  * path-references into object storage), decode/feature-extract runs
  * partition-parallel right after the pruned scan, and only the (small)
  * feature vectors shuffle.
  */
object Multimodal {

  /** Image formats the JVM can actually decode (javax.imageio registry). */
  def availableImageCodecs: Seq[String] =
    javax.imageio.ImageIO.getReaderFormatNames.toSeq
      .map(_.toLowerCase).distinct.sorted

  /** REAL image decode via the JDK's bundled imageio codecs: per-partition
    * `mapPartitions` (codec scanner init amortizes across the partition),
    * per-image width/height + exact per-channel means from the decoded
    * raster. Undecodable payloads yield NULL feature columns instead of
    * failing the batch, like the reference's input-format error rows.
    */
  def decodeImageFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val img =
          // NonFatal, not just IOException: codec internals throw unchecked
          // exceptions (bad color profiles, truncated bodies behind a valid
          // magic number) and the error contract is a NULL row, not a dead job
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          org.apache.spark.sql.Row(id, null, null, null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          org.apache.spark.sql.Row(id, w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }(enc)
  }

  /** Fixture-side counterpart: a deterministic synthetic PNG (the channel
    * values are closed-form in (x, y, id), so an oracle can recompute the
    * decoded means arithmetically — proving the encode→PNG→decode loop is
    * lossless through a real codec).
    */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + id) % 256).toInt
        val g = ((y * 17 + id) % 256).toInt
        val b = ((x + y + id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Audio container formats the JVM can actually parse
    * (javax.sound.sampled registry — WAVE/AU/AIFF on a stock JDK).
    */
  def availableAudioCodecs: Seq[String] =
    javax.sound.sampled.AudioSystem.getAudioFileTypes.toSeq
      .map(_.toString.toLowerCase).distinct.sorted

  /** REAL audio decode via the JDK's bundled sampled-audio codecs:
    * per-partition `mapPartitions`, container header → (sample_rate,
    * channels, bits, frames, duration), then a full PCM pass for
    * mean-absolute amplitude, RMS, and peak over 16-bit little-endian
    * samples. Unparseable payloads yield NULL feature columns instead of
    * failing the batch (same error contract as the image path).
    */
  def decodeAudioFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true),
      StructField("mean_abs", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("peak", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val decoded =
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
              else {
                val bytes = in.readAllBytes()
                val nSamples = bytes.length / 2
                // AU's legal unknown-data-size header makes getFrameLength
                // report NOT_SPECIFIED (-1); derive the frame count from
                // the decoded bytes instead of emitting a negative duration
                val nFrames = in.getFrameLength match {
                  case n if n >= 0 => n
                  case _ => nSamples.toLong / math.max(1, fmt.getChannels)
                }
                var sumAbs = 0L; var sumSq = 0.0; var peak = 0
                var i = 0
                while (i < nSamples) {
                  val lo = bytes(2 * i) & 0xff
                  val hi = bytes(2 * i + 1).toInt
                  val s = (hi << 8) | lo
                  val a = math.abs(s)
                  sumAbs += a; sumSq += s.toDouble * s
                  if (a > peak) peak = a
                  i += 1
                }
                val n = math.max(nSamples, 1)
                Some((fmt.getSampleRate.toDouble, fmt.getChannels,
                  fmt.getSampleSizeInBits, nFrames,
                  nFrames / fmt.getSampleRate.toDouble,
                  sumAbs.toDouble / n, math.sqrt(sumSq / n), peak))
              }
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((sr, ch, bits, nf, dur, ma, rms, pk)) =>
            org.apache.spark.sql.Row(id, sr, ch, bits, nf, dur, ma, rms, pk)
          case None =>
            org.apache.spark.sql.Row(id, null, null, null, null, null, null,
              null, null)
        }
      }
    }(enc)
  }

  /** Fixture-side counterpart of [[syntheticPng]] for audio: a 16-bit mono
    * PCM WAV whose sample values are closed-form in (i, id) —
    * `s_i = ((i*37 + id*11) % 2048) - 1024` — so an oracle can recompute
    * the decoded mean-abs/RMS/peak arithmetically, proving the
    * encode→WAV→decode loop is lossless through a real codec.
    */
  def syntheticWav(id: Long, nFrames: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((i.toLong * 37 + id * 11) % 2048) - 1024).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Schema of a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Build an asset table from any source df (here: text payloads stand in
    * for media bytes — the container has no codecs).
    */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
               mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      map(lit("orig_len"), length(col(payloadCol)).cast("string")).as("meta"))

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (per-partition, vectorized batches). This deterministic fake derives a
    * fixed-size "feature vector" from payload bytes so the downstream
    * plumbing (schema, partitioning, joins on features) is fully exercised.
    * Replace the body with a real codec UDF/mapInArrow at deployment.
    */
  def stubDecodeFeatures(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(1000L)).cast("double") / lit(1000.0)))

  /** Feature-extraction pass: payload metadata + stubbed feature vector.
    * Everything except the stub is the real production shape.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 8): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("checksum"),
      stubDecodeFeatures(col("payload"), dim).as("features"))

  /** REAL video frame sampling through a real bundled codec: multi-frame
    * GIF is the one video-like container the stock JDK can both write and
    * read (`javax.imageio`'s GIF plugin exposes `getNumImages`/`read(i)`),
    * so frame extraction here is an actual decode, not byte slicing.
    * Per-partition `mapPartitions`; every `stride`-th frame is decoded and
    * reduced to (frame_no, width, height, per-channel means) — the
    * decode-then-feature shape of real video sampling, where only the small
    * per-frame features ever shuffle. Undecodable payloads contribute zero
    * frames instead of failing the batch (same error contract as the image
    * path). Swap the ImageIO reader for an FFmpeg binding at deployment —
    * the schema, sampling and partition-parallel shape stay identical.
    */
  def sampleVideoFrames(assets: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        try {
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) { in.close(); Iterator.empty }
          else {
            val reader = readers.next()
            try {
              reader.setInput(in)
              val n = reader.getNumImages(true)
              (0 until n by stride).iterator.map { f =>
                val img = reader.read(f)
                val w = img.getWidth; val h = img.getHeight
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val np = w.toLong * h
                org.apache.spark.sql.Row(id, f.toLong, w, h,
                  sr.toDouble / np, sg.toDouble / np, sb.toDouble / np)
              }.toVector
            } finally { reader.dispose(); in.close() }
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }(enc)
  }

  /** Fixture-side counterpart of [[syntheticPng]]/[[syntheticWav]] for
    * video: a deterministic ANIMATED GIF whose every frame is two solid
    * half-frames with closed-form colors in (frame, id) — an exact 2-entry
    * palette per frame, so the lossy-looking GIF quantizer is exact and an
    * oracle can recompute the decoded per-frame channel means
    * arithmetically. Left `w/2` columns get color A(f,id), the rest color
    * B(f,id):
    * A = ((f*29+id)%256, (f*47+id*3)%256, (f*71+id*7)%256),
    * B = ((f*13+id*5)%256, (f*59+id)%256, (f*23+id*9)%256).
    */
  def syntheticGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val ar = ((f * 29 + id) % 256).toInt
      val ag = ((f * 47 + id * 3) % 256).toInt
      val ab = ((f * 71 + id * 7) % 256).toInt
      val br = ((f * 13 + id * 5) % 256).toInt
      val bg = ((f * 59 + id) % 256).toInt
      val bb = ((f * 23 + id * 9) % 256).toInt
      // explicit 2-color indexed model — the GIF palette holds exactly our
      // colors, so decode returns them bit-exact
      val cm = new java.awt.image.IndexColorModel(8, 2,
        Array(ar.toByte, br.toByte), Array(ag.toByte, bg.toByte),
        Array(ab.toByte, bb.toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, if (x < w / 2) 0 else 1); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Batched decode via `mapPartitions` — the Scala analog of the
    * mapInPandas/mapInArrow batch contract: the decoder receives an
    * ITERATOR of rows per partition, so codec/model initialization happens
    * once per partition and payloads stream through without materializing
    * the partition. The "decode" body is a deterministic stub (no codecs in
    * this container — replace with the real library call at deployment);
    * the signature, schema and batch shape are the production ones.
    *
    * @return (asset_id, features ARRAY<DOUBLE>, resized BINARY) where
    *         resized keeps every `resizeStride`-th payload byte (the
    *         downsample/resize stand-in)
    */
  def decodePartitionBatched(assets: DataFrame, dim: Int = 8,
                             resizeStride: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = false),
      StructField("resized", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      // per-partition one-time init (a real decoder loads its codec here)
      val seed = 0x9E3779B97F4A7C15L
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val feats = Array.tabulate(dim) { i =>
          var h = seed ^ i
          var j = 0
          while (j < payload.length) { h = h * 31 + payload(j); j += 1 }
          math.floorMod(h, 1000L).toDouble / 1000.0
        }
        val resized = Array.tabulate(
          (payload.length + resizeStride - 1) / resizeStride)(i =>
          payload(i * resizeStride))
        org.apache.spark.sql.Row(id, feats, resized)
      }
    }(enc)
  }
}
