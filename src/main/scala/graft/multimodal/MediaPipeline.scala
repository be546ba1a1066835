package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, and a partition-batched
  * decode / feature-extract stage.
  *
  * The metadata half of the decode is REAL since round 7: payloads whose
  * bytes carry a PNG/JPEG/GIF container header get their dimensions
  * parsed by [[MediaCodec]] (pure JVM — IHDR / SOF walk / screen
  * descriptor). Since round 9 the PIXEL half is real too for the PNG
  * subset the fixtures ship ([[pixelStats]]: zlib IDAT inflate, all
  * five scanline filters, nearest-neighbor resample — all pure JVM),
  * plus GIF frames (LZW) and WAV samples (PCM16); round 10 adds
  * baseline JPEG ([[JpegCodec]]: DCT/Huffman both directions), so all
  * four container formats decode real pixels/samples. Only the feature
  * kernel remains a clearly-marked DETERMINISTIC STUB (`decodeStub` —
  * no embedding model in the container); the Spark-side plumbing is
  * real and tested: the
  * binary column schema, the typed mapPartitions batch shape (the Scala
  * analog of mapInPandas: one iterator per partition, amortizing
  * per-batch decoder init), partition sizing, and the downstream
  * feature schema.
  *
  * Scale: decode is embarrassingly parallel per partition; the expensive
  * decoder handle is created once per partition, not per row — the exact
  * pattern a real codec (JNI / FFI) needs. Output features are fixed-width
  * arrays, so downstream similarity ops reuse the VectorOps path.
  */
object MediaPipeline {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      media_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Attach the opaque payload column (here: utf-8 text bytes stand in
    * for real media bytes). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** DETERMINISTIC STUB for the media decode. A real deployment replaces
    * this body with the codec call; the signature — bytes in, typed
    * features out — is the contract the pipeline tests. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var h = 1125899906842597L // FNV-ish deterministic fold over the bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 16 + math.floorMod(h, 640).toInt
    val height = 16 + math.floorMod(h >> 16, 480).toInt
    val frames = 1 + math.floorMod(h >> 32, 32).toInt
    val feat = Array.tabulate(8)(j =>
      (math.floorMod(h >> (j * 7), 1000) / 1000.0f))
    (width, height, frames, feat)
  }

  /** The decode stage: typed mapPartitions — per-partition decoder init,
    * then a pure iterator map (no per-row setup, no collect). Payloads
    * with a recognized container header (PNG/JPEG/GIF) get REAL decoded
    * dimensions; anything else falls back to the deterministic stub
    * with format "unknown". The feature vector always comes from the
    * stub fold — honest, since no pixel decode happens either way. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition: init the (stub) feature kernel once
      val featureKernel = decodeStub _
      rows.map { r =>
        val (sw, sh, frames, feat) = featureKernel(r.payload)
        MediaCodec.parseDims(r.payload) match {
          case Some(d) => MediaFeatures(r.doc_id, d.format,
            r.payload.length, d.width, d.height, 1, feat)
          case None => MediaFeatures(r.doc_id, "unknown",
            r.payload.length, sw, sh, frames, feat)
        }
      }
    }
  }

  /** Resize stage: fit-within-box with aspect ratio preserved. The
    * geometry (the part a pipeline must get right) is real; only the
    * pixel resample is behind the stub boundary. Feature vectors are
    * re-scaled deterministically so downstream similarity stays stable
    * under resize — the invariant a real embedding model provides. */
  def resize(features: Dataset[MediaFeatures], maxW: Int,
      maxH: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      if (scale >= 1.0) f
      else f.copy(
        width = math.max(1, math.round(f.width * scale).toInt),
        height = math.max(1, math.round(f.height * scale).toInt))
    }
  }

  final case class PixelStats(doc_id: Long, width: Int, height: Int,
      mean_intensity: Double, resized_mean: Double)

  /** REAL pixel stage (round 9; JPEG added round 10): payloads that are
    * 8-bit grayscale PNGs are fully decoded — zlib inflate + all five
    * scanline filters reversed ([[MediaCodec.decodeGray]]) — and
    * baseline grayscale JPEGs likewise (Huffman entropy decode +
    * dequantize + IDCT, [[JpegCodec.decodeGray]]); the stats are
    * computed on the RECONSTRUCTED pixels: mean intensity over the full
    * image, and mean intensity after a real nearest-neighbor resample
    * to 16×16 ([[MediaCodec.resizeGrayNearest]]). Rows whose payload is
    * neither are dropped (flatMap) — this stage is the pixel path; the
    * metadata path ([[decode]]) keeps every row. The
    * `media_pixel_stats` / `jpeg_pixel_stats` gates build
    * spec-conformant containers from a formula, so a decode bug
    * anywhere (chunk walk, inflate, any filter, the Huffman tables,
    * the IDCT, the resample arithmetic) breaks the DuckDB hash. Same
    * mapPartitions batch shape as [[decode]]: decoder state per
    * partition, pure iterator map, no collect. */
  def pixelStats(spark: SparkSession, media: DataFrame): Dataset[PixelStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      def mean(p: Array[Byte]): Double = {
        var s = 0L; var i = 0
        while (i < p.length) { s += p(i) & 0xFF; i += 1 }
        s.toDouble / p.length
      }
      rows.flatMap { r =>
        MediaCodec.decodeGray(r.payload)
          .orElse(JpegCodec.decodeGray(r.payload))
          .map { case (w, h, px) =>
            PixelStats(r.doc_id, w, h, mean(px),
              mean(MediaCodec.resizeGrayNearest(px, w, h, 16, 16)))
          }
      }
    }
  }

  /** Frame sampling plan: deterministic every-k frame indices per row —
    * the plumbing a video pipeline needs before decode fan-out. */
  def sampleFrameIndices(features: Dataset[MediaFeatures],
      everyK: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.toDF().select(col("doc_id"), col("n_frames"),
      sequence(lit(0), col("n_frames") - 1, lit(everyK))
        .as("sampled_frames"))
  }

  final case class AudioStats(doc_id: Long, sample_rate: Int,
      n_samples: Int, duration_ms: Double, rms: Double, peak: Int,
      zero_crossings: Int)

  /** REAL audio stage (round 9): payloads that are mono 16-bit PCM WAV
    * are fully decoded — RIFF chunk walk, little-endian samples
    * ([[AudioCodec.decodeWavPcm16]]) — and signal features computed on
    * the RECONSTRUCTED samples (duration, RMS, peak, zero crossings;
    * exact-parity arithmetic documented at
    * [[AudioCodec.signalStats]]). Non-decodable payloads are dropped
    * (flatMap), same contract as [[pixelStats]]. Scale: per-partition
    * decode, no per-row setup, no collect — features are fixed-width,
    * so a 100 TB audio corpus shuffles stats, never waveforms. */
  def audioStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        AudioCodec.decodeWavPcm16(r.payload).map { case (rate, samples) =>
          val st = AudioCodec.signalStats(rate, samples)
          AudioStats(r.doc_id, rate, st.nSamples, st.durationMs, st.rms,
            st.peak, st.zeroCrossings)
        }
      }
    }
  }

  final case class FrameStats(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, mean_intensity: Double)

  /** REAL video stage (round 9): multi-frame GIF payloads are fully
    * decoded — LZW code stream and all ([[GifCodec.decodeFrames]]) —
    * then every-k frame sampling runs on the REAL decoded frames
    * (indices 0, k, 2k, … — the schedule [[sampleFrameIndices]] plans)
    * and mean intensity is computed per sampled frame: exact integer
    * sum, one double division, the same parity recipe as
    * [[pixelStats]]. One output row per (doc, sampled frame). The
    * frame fan-out happens AFTER decode inside the partition, so the
    * shuffle carries per-frame stats, never pixels. */
  def frameStats(spark: SparkSession, media: DataFrame,
      everyK: Int): Dataset[FrameStats] = {
    require(everyK > 0, s"bad sampling stride $everyK")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      def mean(p: Array[Byte]): Double = {
        var s = 0L; var i = 0
        while (i < p.length) { s += p(i) & 0xFF; i += 1 }
        s.toDouble / p.length
      }
      rows.flatMap { r =>
        GifCodec.decodeFrames(r.payload).toSeq.flatMap {
          case (w, h, frames) =>
            (0 until frames.length by everyK).map(f =>
              FrameStats(r.doc_id, f, w, h, mean(frames(f))))
        }
      }
    }
  }
}
