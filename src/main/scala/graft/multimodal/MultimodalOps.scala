package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The decode kernel ([[MediaCodec]]) uses REAL JDK codecs where the JDK
  * ships one: PNG bytes decode through `javax.imageio` (real pixel decode,
  * real dims) and RIFF/WAV through `javax.sound.sampled` (real container
  * parse). The fixture's image rows carry real PNG payloads, so q51/q67 are
  * honest end-to-end decodes. The JDK has no mp3/mp4 codec, so audio/video
  * fixture rows keep a deterministic header-parse payload (disclosed below);
  * a JNI/ffmpeg decoder plugs in behind the same (bytes → dims/frames)
  * contract without touching any plan shape.
  *
  * At 100 TB: media bytes dominate row size, so the design keeps binary
  * columns out of shuffles — features are extracted in a narrow
  * mapPartitions/projection BEFORE any wide op, and only the small typed
  * features move. (In PySpark the same stage is `mapInPandas`; here it is
  * `Dataset.mapPartitions`, Spark's Scala-native arrow-batched equivalent.)
  */
object MultimodalOps {

  /** A media row: bytes + the typed metadata a lakehouse would carry.
    * `n_bytes` is the SOURCE payload size recorded in the catalog (the
    * document's char count), independent of the container encoding. */
  final case class MediaRow(
      media_id: Long, media_type: String, bytes: Array[Byte],
      source: String, n_bytes: Long)

  /** Extracted features (the decode output contract). `n_bytes` carries the
    * source payload size through the stage so downstream aggregates never
    * re-join the binary table. */
  final case class MediaFeatures(
      media_id: Long, media_type: String, width: Int, height: Int,
      n_frames: Int, checksum: Long, n_bytes: Long)

  /** Decode kernel — real JDK codecs, sniffed by container magic:
    *  - PNG (0x89 'PNG'): `javax.imageio.ImageIO` — dims from real decode;
    *  - RIFF/WAV: `javax.sound.sampled.AudioSystem` — the (width, height,
    *    frames) slots carry (sampleRate, channels, frameLength);
    *  - anything else: deterministic header parse of the synthetic text
    *    payload (dims = first two codepoints ×4, frames by modality) — the
    *    stand-in for codecs the JDK lacks (mp3/mp4). The law is written in
    *    the codepoint/char terms the q51/q52/q67 DuckDB oracles replay
    *    (ascii(substr(text,…))/length(text)), which is what makes the
    *    decode stage hash-gateable: the oracle replays arithmetic, and the
    *    Spark side must agree byte-for-byte even on non-ASCII. */
  object MediaCodec {
    // ImageIO defaults to buffering streams through TEMP FILES on disk; in
    // a per-row executor decode loop that is a file create/delete per image
    // (and fd pressure under concurrency) — in-memory cache only, always
    javax.imageio.ImageIO.setUseCache(false)

    def isPng(b: Array[Byte]): Boolean = b.length > 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
      b(2) == 'N'.toByte && b(3) == 'G'.toByte
    def isRiff(b: Array[Byte]): Boolean = b.length > 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == 'F'.toByte

    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) =
      if (isPng(bytes)) {
        // a corrupt body behind a valid magic throws from the JDK codec
        // (ImageIO.read returns null only when NO reader claims the bytes);
        // one bad row must degrade to the undecodable sentinel, never kill
        // the task. PNG magic (0x89 lead byte) is invalid UTF-8, so a text
        // payload can never land here.
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) (0, 0, 1) else (img.getWidth, img.getHeight, 1)
        } catch { case scala.util.control.NonFatal(_) => (0, 0, 1) }
      } else if (isRiff(bytes)) {
        // 'RIFF'-prefixed bytes that AudioSystem rejects (a text payload
        // that happens to start with RIFF, a non-WAV RIFF container) fall
        // through to the header parse — the law the oracle replays for
        // text payloads — instead of aborting the stage
        try {
          val aff = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
          (aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
            aff.getFrameLength)
        } catch {
          case scala.util.control.NonFatal(_) => headerParse(mediaType, bytes)
        }
      } else if (bytes.isEmpty) (0, 0, 1) // undecodable payload
      else headerParse(mediaType, bytes)

    private def headerParse(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
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
      (4 * b0, 4 * b1, frames)
    }

    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)

    /** Deterministic PNG encoder (fixture + tests): flat id-derived gray
      * fill (grayscale keeps the deflate payload 3× smaller than RGB at
      * identical decode semantics — dims are what the pipeline consumes).
      * The JDK PNG writer emits no timestamp chunks, so bytes are stable
      * across runs for a given (w, h, seed). */
    def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.createGraphics()
      val v = ((seed * 2654435761L) & 0xff).toInt
      g.setColor(new java.awt.Color(v, v, v))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic 8-bit mono PCM WAV encoder (tests): `frames` silent
      * frames at `sampleRate` Hz. */
    def encodeWav(frames: Int, sampleRate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](frames)),
        fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Media fixture synthesized from `documents`. Image rows carry REAL PNG
    * payloads — encoded at the dims the oracle law derives from the text
    * (first two codepoints ×4), then decoded back through `javax.imageio`
    * in [[extractFeatures]], so the image path is a true encode→decode
    * round trip. Audio/video rows keep the text bytes as a synthetic
    * container (no JDK mp3/mp4 codec — see [[MediaCodec]]). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      // spread the ENCODE across the cluster: the fixture parquet is one
      // small file (= one input partition), which would serialize every PNG
      // encode onto a single task (measured 9s vs sub-second). The shuffle
      // moves only text — the binary payload is created AFTER it, so the
      // "media bytes never shuffle" invariant still holds. A real media
      // lake arrives already partitioned and skips this.
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes =
          if (mt == "image") {
            val cp0 = if (text.isEmpty) 0 else text.codePointAt(0)
            val o = if (text.isEmpty) 0 else Character.charCount(text.codePointAt(0))
            val cp1 = if (text.length > o) text.codePointAt(o) else 0
            if (cp0 > 0 && cp1 > 0) MediaCodec.encodePng(4 * cp0, 4 * cp1, id)
            // degenerate (< 2 codepoints): keep the text payload so decode
            // falls to the header parse — (4*cp0, 0), exactly the oracle's
            // ascii-law value; an empty-bytes sentinel would report (0,0)
            // and diverge from the q51 oracle if such a doc held a group max
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          } else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRow(id, mt, bytes, source,
          text.codePointCount(0, text.length).toLong)
      })
  }

  /** The decode/feature-extract stage: per-partition codec instance, arrow
    * batch shape — the mapInPandas equivalent in Scala Spark. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one codec handle per partition (in real life: model/codec init here)
      val codec = MediaCodec
      rows.map { r =>
        val (w, h, f) = codec.decode(r.media_type, r.bytes)
        MediaFeatures(r.media_id, r.media_type, w, h, f,
          codec.checksum(r.bytes), r.n_bytes)
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

    // Typed-metadata analytics over the DECODED features. Image rows run a
    // real javax.imageio decode of real PNG payloads; the oracle replays the
    // dims arithmetically (the fixture encodes PNGs at exactly the dims the
    // law derives from the text — ascii(substr)×4), so the gate verifies
    // the whole encode→decode round trip. Audio/video dims come from the
    // header parse of the synthetic payload, which IS the oracle law.
    // NOTE: Spark ascii() and DuckDB ascii() agree only on ASCII leading
    // chars; the documents fixture is ASCII, and MediaCodec's header law is
    // codepoint-based so it stays oracle-correct beyond ASCII.
    "q51_media_metadata" -> Q(
      run = (s, d) => extractFeatures(mediaTable(s, d)).toDF()
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
