package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaRow, MediaCodec}

/** Multimodal plumbing: binary columns survive the pipeline opaquely, the
  * mapPartitions decode stage has the right batch shape, image rows are
  * REAL PNGs decoded by javax.imageio, and frame sampling follows the
  * codec's law. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("media table carries opaque binary payloads with typed metadata") {
    val media = MultimodalOps.mediaTable(spark, sf)
    val row = media.filter($"media_id" === 1).head()
    assert(row.media_type == "audio")
    assert(row.bytes.length == row.n_bytes)
    // bytes round-trip untouched (opacity: no codec ran)
    assert(new String(row.bytes, "UTF-8").nonEmpty)
  }

  test("image rows are real PNGs; javax.imageio decodes real dimensions") {
    val media = MultimodalOps.mediaTable(spark, sf)
    val img = media.filter($"media_type" === "image").head()
    assert(MediaCodec.isPng(img.bytes), "image payload is not a PNG container")
    // decode independently of MediaCodec: the JDK codec sees a real image
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img.bytes))
    assert(decoded != null)
    // dims follow the fixture law: first two text codepoints × 4
    val doc = graft.Tables.documents(spark, sf)
      .filter($"doc_id" === img.media_id).select("text").as[String].head()
    assert(decoded.getWidth == 4 * doc.codePointAt(0))
    assert(decoded.getHeight == 4 * doc.codePointAt(doc.offsetByCodePoints(0, 1)))
    // and the feature stage reports exactly what the real decode saw
    val f = MultimodalOps.extractFeatures(media)
      .filter($"media_id" === img.media_id).head()
    assert((f.width, f.height) == (decoded.getWidth, decoded.getHeight))
  }

  test("extractFeatures runs one decode per row inside mapPartitions") {
    val media = MultimodalOps.mediaTable(spark, sf).repartition(4)
    val feats = MultimodalOps.extractFeatures(media)
    assert(feats.count() == media.count())
    val f = feats.filter($"media_id" === 0).head()
    val m = media.filter($"media_id" === 0).head()
    val (w, h, frames) = MediaCodec.decode(m.media_type, m.bytes)
    assert((f.width, f.height, f.n_frames) == (w, h, frames))
    assert(f.checksum == MediaCodec.checksum(m.bytes))
  }

  test("codec: PNG and WAV round-trip through the real JDK decoders") {
    // PNG: encode at known dims, decode via the container-sniffing codec
    val png = MediaCodec.encodePng(48, 20, seed = 7L)
    assert(MediaCodec.isPng(png))
    assert(MediaCodec.decode("image", png) == (48, 20, 1))
    // encoder is deterministic (stable bytes -> stable checksums)
    assert(MediaCodec.checksum(png) ==
      MediaCodec.checksum(MediaCodec.encodePng(48, 20, seed = 7L)))
    // WAV: javax.sound parses the real RIFF container; slots carry
    // (sampleRate, channels, frameLength)
    val wav = MediaCodec.encodeWav(frames = 300, sampleRate = 8000)
    assert(MediaCodec.isRiff(wav))
    assert(MediaCodec.decode("audio", wav) == (8000, 1, 300))
  }

  test("header-parse law: frames scale with payload size per modality") {
    val img = MediaCodec.decode("image", Array.fill(300)(65.toByte))
    val aud = MediaCodec.decode("audio", Array.fill(300)(65.toByte))
    val vid = MediaCodec.decode("video", Array.fill(300)(65.toByte))
    assert(img._3 == 1)
    assert(aud._3 == 1 + 300 / 256)
    assert(vid._3 == 1 + 300 / 64)
  }

  test("frame sampling explodes every k-th frame index") {
    val feats = Seq(
      MultimodalOps.MediaFeatures(1L, "video", 4, 4, 17, 0L, 0L),
      MultimodalOps.MediaFeatures(2L, "image", 4, 4, 1, 0L, 0L)).toDS()
    val sampled = MultimodalOps.sampleFrames(feats, every = 8)
    val idx = sampled.filter($"media_id" === 1)
      .select("frame_idx").as[Int].collect().sorted
    assert(idx.sameElements(Array(0, 8, 16)))
    assert(sampled.filter($"media_id" === 2).count() == 0) // single frame → skipped
  }

  test("resizeTo fits dims into the target box, preserving aspect ratio") {
    val feats = Seq(
      MultimodalOps.MediaFeatures(1L, "image", 448, 224, 1, 0L, 0L), // 2:1 landscape
      MultimodalOps.MediaFeatures(2L, "image", 100, 400, 1, 0L, 0L), // 1:4 portrait
      MultimodalOps.MediaFeatures(3L, "image", 0, 120, 1, 0L, 0L)    // degenerate
    ).toDS()
    val out = MultimodalOps.resizeTo(feats, 224).collect().sortBy(_.media_id)
    assert((out(0).width, out(0).height) == (224, 112))
    assert((out(1).width, out(1).height) == (56, 224))
    assert((out(2).width, out(2).height) == (0, 0))
    // never exceeds the box
    assert(out.forall(f => f.width <= 224 && f.height <= 224))
  }

  test("features stay small: binary column dropped before any wide op") {
    val media = MultimodalOps.mediaTable(spark, sf)
    val feats = MultimodalOps.extractFeatures(media)
    assert(!feats.schema.fieldNames.contains("bytes"))
    // grouped agg over features shuffles only the typed columns
    val byType = feats.groupBy($"media_type").agg(avg($"width").as("w"))
    assert(byType.count() == 3)
  }
}
