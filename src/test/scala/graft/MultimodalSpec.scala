package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, MapType}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Multimodal binary-column plumbing: asset schema, feature extraction
  * shape, frame sampling fanout. Image decode is REAL (JDK imageio PNG
  * codec); audio/video decode remain documented stubs (no codecs in this
  * container) with everything around them real.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private lazy val assets =
    Multimodal.toAssets(Tables.load(spark, dir, "documents"), "doc_id", "text",
      "text/plain")

  test("asset table has the binary+metadata schema") {
    spark.sparkContext.setLogLevel("ERROR")
    val s = assets.schema
    assert(s("payload").dataType == BinaryType)
    assert(s("meta").dataType.isInstanceOf[MapType])
    assert(assets.count() == 500)
  }

  test("feature extraction emits fixed-dim vectors with stable checksums") {
    val f = Multimodal.extractFeatures(assets, dim = 8)
    assert(f.filter(size(col("features")) =!= 8).count() == 0)
    // deterministic: same payload → same checksum and features on re-run
    val a = f.orderBy("asset_id").collect()
    val b = Multimodal.extractFeatures(assets, dim = 8).orderBy("asset_id").collect()
    assert(a.sameElements(b) || a.zip(b).forall { case (x, y) => x == y })
    // features are in [0, 1)
    val bad = f.select(explode(col("features")).as("v"))
      .filter(col("v") < 0 || col("v") >= 1).count()
    assert(bad == 0)
  }

  test("video frame sampling decodes every stride-th GIF frame through a real codec") {
    import spark.implicits._
    // 4 assets, 5 frames each, 10x6 px: the closed-form two-color frames
    // round-trip exactly through the GIF palette
    val vids = (0L until 4L).map(id =>
      (id, Multimodal.syntheticGif(id, 10, 6, 5))).toDF("asset_id", "payload")
    val all = Multimodal.sampleVideoFrames(vids, stride = 1)
    assert(all.count() == 4 * 5)
    assert(all.columns.toSeq == Seq("asset_id", "frame_no", "width", "height",
      "mean_r", "mean_g", "mean_b"))
    // stride 2 keeps frames 0,2,4
    val sampled = Multimodal.sampleVideoFrames(vids, stride = 2)
    assert(sampled.count() == 4 * 3)
    assert(sampled.select("frame_no").distinct().orderBy("frame_no")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L))
    // decoded means equal the closed-form colors: left 5 cols = A, right 5 = B
    val r = all.filter(col("asset_id") === 2L && col("frame_no") === 3L).head()
    val id = 2L; val f = 3L
    def m(a: Long, b: Long) = (5 * a + 5 * b) / 10.0
    assert(r.getInt(2) == 10 && r.getInt(3) == 6)
    assert(r.getDouble(4) == m((f * 29 + id) % 256, (f * 13 + id * 5) % 256))
    assert(r.getDouble(5) == m((f * 47 + id * 3) % 256, (f * 59 + id) % 256))
    assert(r.getDouble(6) == m((f * 71 + id * 7) % 256, (f * 23 + id * 9) % 256))
    // garbage payloads contribute zero frames, not a dead job
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
    assert(Multimodal.sampleVideoFrames(bad).count() == 0)
  }

  test("partition-batched decode is deterministic and partition-insensitive") {
    val a = Multimodal.decodePartitionBatched(assets.repartition(7))
      .orderBy("asset_id").collect()
    val b = Multimodal.decodePartitionBatched(assets.coalesce(1))
      .orderBy("asset_id").collect()
    assert(a.length == b.length && a.length == assets.count())
    // same rows regardless of partitioning (per-partition init must not
    // leak into per-row results)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getSeq[Double](1) == y.getSeq[Double](1))
      assert(x.getAs[Array[Byte]](2).sameElements(y.getAs[Array[Byte]](2)))
    }
    // resize stride 4 keeps ~1/4 of the bytes
    val orig = assets.orderBy("asset_id").head.getAs[Array[Byte]]("payload").length
    val resized = a.head.getAs[Array[Byte]](2).length
    assert(math.abs(resized - orig / 4.0) <= 1)
  }

  test("JDK image codecs are actually present and decode real PNGs") {
    val codecs = Multimodal.availableImageCodecs
    assert(codecs.contains("png") && codecs.contains("jpeg"),
      s"expected JDK imageio codecs, got $codecs")
    // encode→decode round trip through the real codec: closed-form channels
    val png = Multimodal.syntheticPng(5L, 20, 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 20 && img.getHeight == 16)
    assert((img.getRGB(3, 7) & 0xffffff) ==
      ((((3 * 31 + 5) % 256) << 16) | (((7 * 17 + 5) % 256) << 8) | ((3 + 7 + 5) % 256)))
    // the distributed decode path: exact means, null row for junk bytes
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticPng(1L, 4, 2)),
        (2L, "not a png".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeImageFeatures(df).orderBy("asset_id").collect()
    assert(out(0).getInt(1) == 4 && out(0).getInt(2) == 2)
    val expR = (0 until 4).map(x => (x * 31 + 1) % 256).sum / 4.0
    assert(out(0).getDouble(3) == expR)
    assert(out(1).isNullAt(1) && out(1).isNullAt(3))
  }

  test("JDK audio codecs are actually present and decode real WAVs") {
    val codecs = Multimodal.availableAudioCodecs
    assert(codecs.contains("wave"), s"expected JDK sampled-audio codecs, got $codecs")
    // encode→decode round trip through the real codec: header + closed-form
    // amplitude features
    import spark.implicits._
    val df = Seq((7L, Multimodal.syntheticWav(7L, 480)),
        (8L, "not a wav".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeAudioFeatures(df).orderBy("asset_id").collect()
    assert(out(0).getDouble(1) == 8000.0)        // sample_rate
    assert(out(0).getInt(2) == 1)                // channels
    assert(out(0).getInt(3) == 16)               // bits
    assert(out(0).getLong(4) == 480L)            // n_frames
    val samples = (0 until 480).map(i => ((i * 37 + 7 * 11) % 2048) - 1024)
    assert(out(0).getDouble(6) == samples.map(math.abs).sum / 480.0) // mean_abs
    assert(out(0).getInt(8) == samples.map(math.abs).max)            // peak
    assert(out(1).isNullAt(1) && out(1).isNullAt(6)) // junk → null row
  }
}
