package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[StubCodec]]) — what is real and
  * tested is everything Spark-side: the binary column schema, the
  * per-partition batching shape (one codec instance per partition, the way a
  * real decoder/model handle would be held), partition sizing, and the
  * metadata struct contract. Swapping StubCodec for a JNI/ffmpeg call changes
  * no plan shape.
  *
  * At 100 TB: media bytes dominate row size, so the design keeps binary
  * columns out of shuffles — features are extracted in a narrow
  * mapPartitions/projection BEFORE any wide op, and only the small typed
  * features move. (In PySpark the same stage is `mapInPandas`; here it is
  * `Dataset.mapPartitions`, Spark's Scala-native arrow-batched equivalent.)
  */
object MultimodalOps {

  /** A media row: bytes + the typed metadata a lakehouse would carry. */
  final case class MediaRow(
      media_id: Long, media_type: String, bytes: Array[Byte],
      source: String, n_bytes: Long)

  /** Extracted features (the decode output contract). */
  final case class MediaFeatures(
      media_id: Long, media_type: String, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  /** STUB decode kernel — stands in for an image/audio/video codec.
    * Deterministic over the bytes so tests are stable; the interface
    * (bytes → dims/frames/fingerprint) is the real one. */
  object StubCodec {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
      // dims derive from the first two CODEPOINTS of the UTF-8 payload (not
      // raw bytes) and frames from the char count — the q51/q52/q67 oracles
      // are written in ascii(substr(text,…))/length(text) i.e. codepoint/
      // char terms, so this law must match byte-for-byte on non-ASCII too
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val b0 = if (s.nonEmpty) s.codePointAt(0) else 0
      val b1 = {
        val i = if (s.isEmpty) 0 else Character.charCount(s.codePointAt(0))
        if (s.length > i) s.codePointAt(i) else 0
      }
      val nChars = s.codePointCount(0, s.length)
      val frames = mediaType match {
        case "video" => 1 + nChars / 64
        case "audio" => 1 + nChars / 256
        case _       => 1
      }
      (4 * b0, 4 * b1, frames)  // ??? real codec goes here
    }
    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
  }

  /** Media fixture synthesized from `documents` (text bytes as payload —
    * opaque to everything downstream, exactly like real media bytes). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("bytes"),
        col("source"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** The decode/feature-extract stage: per-partition codec instance, arrow
    * batch shape — the mapInPandas equivalent in Scala Spark. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one codec handle per partition (in real life: model/codec init here)
      val codec = StubCodec
      rows.map { r =>
        val (w, h, f) = codec.decode(r.media_type, r.bytes)
        MediaFeatures(r.media_id, r.media_type, w, h, f, codec.checksum(r.bytes))
      }
    }
  }

  /** Resize stage: aspect-preserving fit into a target box, integer milli-
    * scale math (deterministic, engine-replicable). A real resampler plugs in
    * behind the same dims contract; the narrow typed map is the plan shape. */
  def resizeTo(features: Dataset[MediaFeatures], target: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      if (f.width <= 0 || f.height <= 0) f.copy(width = 0, height = 0)
      else {
        val s = math.min(target * 1000L / f.width, target * 1000L / f.height)
        f.copy(width = (f.width * s / 1000L).toInt,
          height = (f.height * s / 1000L).toInt)
      }
    }
  }

  /** Frame sampling: every k-th frame index (video/audio), as exploded rows —
    * the flatMap shape a frame extractor produces. */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int): DataFrame =
    features.toDF()
      .filter(col("n_frames") > 1)
      .select(col("media_id"), col("media_type"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))

  val qs: Map[String, Q] = Map(

    // Typed-metadata analytics over the binary table: everything here is
    // SQL-expressible, so the multimodal schema path is oracle-gated. The
    // fake "header decode" (first two byte values → dims) mirrors StubCodec.
    // NOTE: Spark ascii() and DuckDB ascii() agree only on ASCII leading
    // chars; the documents fixture is ASCII, and StubCodec (the law q52/q67
    // test) is codepoint-based so it stays oracle-correct beyond ASCII.
    "q51_media_metadata" -> Q(
      run = (s, d) => mediaTable(s, d).toDF()
        .withColumn("decoded", col("bytes").cast("string"))
        .select(
          col("media_type"),
          col("n_bytes"),
          (ascii(substring(col("decoded"), 1, 1)) * 4).as("width"),
          (ascii(substring(col("decoded"), 2, 1)) * 4).as("height"))
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("width")).as("max_width"),
          min(col("height")).as("min_height"))
        .orderBy("media_type"),
      oracle = Some("""
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               count(*) AS n_media,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               CAST(max(ascii(substr(text, 1, 1)) * 4) AS INT) AS max_width,
               CAST(min(ascii(substr(text, 2, 1)) * 4) AS INT) AS min_height
        FROM documents
        GROUP BY 1 ORDER BY media_type"""),
      doc = "binary media columns + typed metadata aggregation"),

    // Frame-sample plumbing as a relational query: per-media frame counts
    // from the stub decode law (video: 1 + len/64, audio: 1 + len/256),
    // sampled every 8th frame — the explode fanout is the tested shape.
    "q52_frame_sample" -> Q(
      run = (s, d) => {
        val feats = extractFeatures(mediaTable(s, d))
        sampleFrames(feats, every = 8)
          .groupBy(col("media_type"))
          .agg(count(lit(1)).as("sampled_frames"),
            countDistinct(col("media_id")).as("media_with_frames"))
          .orderBy("media_type")
      },
      oracle = Some("""
        WITH media AS (
          SELECT doc_id AS media_id,
                 CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                 length(text) AS n_bytes
          FROM documents),
        frames AS (
          SELECT media_id, media_type,
                 CASE media_type WHEN 'video' THEN 1 + n_bytes // 64
                                 WHEN 'audio' THEN 1 + n_bytes // 256
                                 ELSE 1 END AS n_frames
          FROM media)
        SELECT media_type,
               CAST(sum((n_frames - 1) // 8 + 1) AS BIGINT) AS sampled_frames,
               count(*) AS media_with_frames
        FROM frames WHERE n_frames > 1
        GROUP BY media_type ORDER BY media_type"""),
      doc = "stub decode + every-kth frame sampling (mapPartitions stage)"),

    // Resize plumbing as a query: decode dims → aspect-preserving fit into
    // 224×224 in integer milli-scale math, per-type size stats. The oracle
    // replays the same integer law, so the typed-map stage is hash-gated.
    "q67_media_resize" -> Q(
      run = (s, d) => resizeTo(extractFeatures(mediaTable(s, d)), 224).toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          max(col("width")).as("max_w"), min(col("width")).as("min_w"),
          max(col("height")).as("max_h"), min(col("height")).as("min_h"))
        .orderBy("media_type"),
      oracle = Some("""
        WITH dims AS (
          SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                 ascii(substr(text, 1, 1)) * 4 AS w,
                 ascii(substr(text, 2, 1)) * 4 AS h
          FROM documents),
        resized AS (
          SELECT media_type,
                 CASE WHEN w <= 0 OR h <= 0 THEN 0
                      ELSE CAST(w * least(224000 // w, 224000 // h) // 1000 AS INT) END AS width,
                 CASE WHEN w <= 0 OR h <= 0 THEN 0
                      ELSE CAST(h * least(224000 // w, 224000 // h) // 1000 AS INT) END AS height
          FROM dims)
        SELECT media_type, count(*) AS n,
               max(width) AS max_w, min(width) AS min_w,
               max(height) AS max_h, min(height) AS min_h
        FROM resized GROUP BY media_type ORDER BY media_type"""),
      doc = "aspect-preserving resize stage (integer milli-scale, typed map)")
  )
}
