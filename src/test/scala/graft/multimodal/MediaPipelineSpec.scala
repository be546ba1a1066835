package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "hello media world"), (2L, "x"), (3L, "longer payload body"))
      .toDF("doc_id", "text")
  }

  test("payload column is binary with correct byte length") {
    val media = MediaPipeline.withPayload(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val lens = media.select(col("doc_id"), length(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lens(1L) == 17 && lens(2L) == 1)
  }

  test("decode runs per-partition and yields deterministic features") {
    val features = MediaPipeline.decode(spark,
      MediaPipeline.withPayload(docs))
    val rows = features.collect().map(f => f.doc_id -> f).toMap
    assert(rows(1L).media_bytes == 17)
    assert(rows.values.forall(f => f.width >= 16 && f.height >= 16))
    assert(rows.values.forall(_.feature.length == 8))
    // determinism across runs
    val again = MediaPipeline.decode(spark,
      MediaPipeline.withPayload(docs)).collect().map(f => f.doc_id -> f).toMap
    assert(rows(3L).feature.toSeq == again(3L).feature.toSeq)
    assert(rows(3L).n_frames == again(3L).n_frames)
  }

  test("decode uses real header dims for media payloads, stub otherwise") {
    import spark.implicits._
    val mixed = Seq(
      MediaPipeline.MediaRow(10L, MediaCodec.pngBytes(320, 200, Array[Byte](1, 2))),
      MediaPipeline.MediaRow(11L, MediaCodec.jpegBytes(640, 480, Array.emptyByteArray)),
      MediaPipeline.MediaRow(12L, "not media".getBytes("UTF-8"))).toDF()
    val rows = MediaPipeline.decode(spark, mixed)
      .collect().map(f => f.doc_id -> f).toMap
    assert(rows(10L).format == "png" && rows(10L).width == 320 &&
      rows(10L).height == 200 && rows(10L).media_bytes == 35)
    assert(rows(11L).format == "jpeg" && rows(11L).width == 640 &&
      rows(11L).height == 480)
    assert(rows(12L).format == "unknown") // stub fallback keeps working
    assert(rows.values.forall(_.feature.length == 8))
  }

  test("frame sampling emits every-k indices bounded by n_frames") {
    val features = MediaPipeline.decode(spark,
      MediaPipeline.withPayload(docs))
    val sampled = MediaPipeline.sampleFrameIndices(features, everyK = 4)
      .collect()
    sampled.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val idx = r.getAs[scala.collection.Seq[Int]]("sampled_frames")
      assert(idx.head == 0 && idx.forall(i => i >= 0 && i < n))
      assert(idx.toSeq == idx.toSeq.sorted)
    }
  }

  test("resize fits within the box, preserves aspect, never upscales") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val features = MediaPipeline.decode(spark,
      MediaPipeline.withPayload(docs))
    val before = features.collect().map(f => f.doc_id -> f).toMap
    val resized = MediaPipeline.resize(features, maxW = 64, maxH = 64)
      .collect()
    assert(resized.nonEmpty)
    resized.foreach { f =>
      val orig = before(f.doc_id)
      assert(f.width <= 64 && f.height <= 64)
      assert(f.width <= orig.width && f.height <= orig.height) // no upscale
      if (orig.width > 64 || orig.height > 64) {
        // aspect preserved within integer rounding: the drift bound is
        // ~half a pixel on the SMALLER output dimension
        val ratioBefore = orig.width.toDouble / orig.height
        val ratioAfter = f.width.toDouble / f.height
        val tol = math.max(0.1, 1.0 / math.min(f.width, f.height))
        assert(math.abs(ratioBefore - ratioAfter) / ratioBefore <= tol,
          s"aspect drift for doc ${f.doc_id}: $ratioBefore -> $ratioAfter")
      } else assert(f.width == orig.width && f.height == orig.height)
      assert(f.feature.sameElements(orig.feature)) // features untouched
    }
  }
}
