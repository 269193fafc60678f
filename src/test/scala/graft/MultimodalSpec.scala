package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaRow, StubCodec}

/** Multimodal plumbing: binary columns survive the pipeline opaquely, the
  * mapPartitions decode stage has the right batch shape, and frame sampling
  * follows the stub codec's law. */
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

  test("extractFeatures runs one decode per row inside mapPartitions") {
    val media = MultimodalOps.mediaTable(spark, sf).repartition(4)
    val feats = MultimodalOps.extractFeatures(media)
    assert(feats.count() == media.count())
    val f = feats.filter($"media_id" === 0).head()
    val m = media.filter($"media_id" === 0).head()
    val (w, h, frames) = StubCodec.decode(m.media_type, m.bytes)
    assert((f.width, f.height, f.n_frames) == (w, h, frames))
    assert(f.checksum == StubCodec.checksum(m.bytes))
  }

  test("stub decode law: frames scale with payload size per modality") {
    val img = StubCodec.decode("image", Array.fill(300)(65.toByte))
    val aud = StubCodec.decode("audio", Array.fill(300)(65.toByte))
    val vid = StubCodec.decode("video", Array.fill(300)(65.toByte))
    assert(img._3 == 1)
    assert(aud._3 == 1 + 300 / 256)
    assert(vid._3 == 1 + 300 / 64)
  }

  test("frame sampling explodes every k-th frame index") {
    val feats = Seq(
      MultimodalOps.MediaFeatures(1L, "video", 4, 4, 17, 0L),
      MultimodalOps.MediaFeatures(2L, "image", 4, 4, 1, 0L)).toDS()
    val sampled = MultimodalOps.sampleFrames(feats, every = 8)
    val idx = sampled.filter($"media_id" === 1)
      .select("frame_idx").as[Int].collect().sorted
    assert(idx.sameElements(Array(0, 8, 16)))
    assert(sampled.filter($"media_id" === 2).count() == 0) // single frame → skipped
  }

  test("resizeTo fits dims into the target box, preserving aspect ratio") {
    val feats = Seq(
      MultimodalOps.MediaFeatures(1L, "image", 448, 224, 1, 0L), // 2:1 landscape
      MultimodalOps.MediaFeatures(2L, "image", 100, 400, 1, 0L), // 1:4 portrait
      MultimodalOps.MediaFeatures(3L, "image", 0, 120, 1, 0L)    // degenerate
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
