package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal column handling for training-data pipelines.
  *
  * Model: media is an opaque `binary` column plus a typed metadata struct
  * (format, width, height, …). Decode / feature-extract / resize /
  * frame-sample run as BATCHED partition-level transforms
  * (Dataset.mapPartitions) so a real decoder could amortize native-library
  * init per batch — the Scala twin of Python's mapInPandas shape.
  *
  * Decode is REAL for the formats the JDK ships readers for (PNG, JPEG,
  * GIF, BMP — `javax.imageio`, no external library): `decodeImage` parses
  * the actual header for format + true dimensions. Bytes no installed
  * reader recognizes (webp, audio, raw text) fall back to `decodeStub`,
  * which derives deterministic fake dimensions/features from a SHA-256 of
  * the bytes — keeping every path oracle-checkable.
  *
  * At scale: decode is a narrow map (no shuffle); binary columns ride
  * parquet; `spark.sql.files.maxPartitionBytes` bounds per-task memory, and
  * frame-sampled outputs explode row counts predictably (sampleFrames
  * controls the fan-out).
  */
object Multimodal extends Serializable {

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class DecodedMeta(media_id: Long, format: String, width: Int,
                               height: Int, n_bytes: Long, checksum: String)
  final case class Frame(media_id: Long, frame_idx: Int, feature: Double)

  /** STUB decoder: the deterministic oracle twin for formats ImageIO has
    * no reader for. All fake fields derive from sha256(content). */
  def decodeStub(content: Array[Byte]): (String, Int, Int, String) = {
    val md = MessageDigest.getInstance("SHA-256")
    val h = md.digest(content)
    val hex = h.map("%02x".format(_)).mkString
    val width = 64 + (((h(0) & 0xFF) << 8 | (h(1) & 0xFF)) % 1984) // 64..2047
    val height = 64 + (((h(2) & 0xFF) << 8 | (h(3) & 0xFF)) % 1984)
    val format = Seq("png", "jpeg", "webp")((h(4) & 0xFF) % 3)
    (format, width, height, hex)
  }

  /** REAL header decode via JDK `javax.imageio`: format name + true
    * dimensions, parsed from the actual bytes (header-only — getWidth on
    * the reader never decodes pixels). None when no installed reader
    * recognizes the content. Streams are memory-cached, never spilled to
    * executor-local disk. */
  def decodeImage(content: Array[Byte]): Option[(String, Int, Int)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case _: java.io.IOException => None }
    finally iis.close()
  }

  /** Real decode when a JDK reader exists, stub otherwise — one seam, so
    * every operator (meta, frames, resize) gets genuine PNG/JPEG
    * dimensions and a deterministic twin for everything else. */
  def decodeAny(content: Array[Byte]): (String, Int, Int, String) =
    decodeImage(content) match {
      case Some((fmt, w, h)) =>
        val hex = MessageDigest.getInstance("SHA-256").digest(content)
          .map("%02x".format(_)).mkString
        (fmt, w, h, hex)
      case None => decodeStub(content)
    }

  /** Batched decode: one codec init per partition, streaming batches. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here for a native codec; ImageIO
      // readers are cheap to construct per record
      it.map { m =>
        val (fmt, w, h, sum) = decodeAny(m.content)
        DecodedMeta(m.media_id, fmt, w, h, m.content.length.toLong, sum)
      }
    }
  }

  /** Frame sampling (video-shaped fan-out): emit `n` frames per media row
    * with a deterministic per-frame feature. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val (_, w, h, _) = decodeAny(m.content)
      (0 until n).iterator.map { i =>
        Frame(m.media_id, i, (w.toLong * (i + 1) % h).toDouble / h)
      }
    }
  }

  final case class ResizePlan(media_id: Long, width: Int, height: Int,
                              out_w: Int, out_h: Int, scaled: Boolean)

  /** Thumbnail planning: fit each image inside maxSide × maxSide
    * preserving aspect ratio — integer arithmetic only (truncating
    * division on positive dims), so the plan is cross-engine exact. The
    * actual pixel resample would run in the same per-partition batched
    * decode as decodeMeta; the dimension arithmetic and fan-in/fan-out
    * plumbing here are the real pipeline pieces. */
  def resizePlan(media: Dataset[MediaRow], maxSide: Int)
      : Dataset[ResizePlan] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val (_, w, h, _) = decodeAny(m.content)
      if (w <= maxSide && h <= maxSide)
        ResizePlan(m.media_id, w, h, w, h, scaled = false)
      else if (w >= h)
        ResizePlan(m.media_id, w, h, maxSide,
          math.max(1, h * maxSide / w), scaled = true)
      else
        ResizePlan(m.media_id, w, h,
          math.max(1, w * maxSide / h), maxSide, scaled = true)
    }
  }

  final case class AudioSegment(media_id: Long, seg_idx: Int,
                                start_ms: Long, end_ms: Long, energy: Double)

  /** Audio-shaped windowed segmentation: stub-decode sample-rate/length
    * from the digest, then emit fixed windows with hop (the spectrogram
    * framing shape). Fan-out is lengthMs/hopMs per row — predictable,
    * narrow, no shuffle; a real decoder slots into the per-partition init
    * exactly like decodeMeta. */
  def segmentAudio(media: Dataset[MediaRow], windowMs: Long, hopMs: Long)
      : Dataset[AudioSegment] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val md = MessageDigest.getInstance("SHA-256")
      val h = md.digest(m.content)
      // stub: duration 1000..8999 ms from digest bytes 5-6
      val durMs = 1000L + (((h(5) & 0xFF) << 8 | (h(6) & 0xFF)) % 8000)
      val nSegs = ((durMs - windowMs) / hopMs + 1).max(1)
      (0L until nSegs).iterator.map { i =>
        val start = i * hopMs
        val end = math.min(start + windowMs, durMs)
        // stub energy: rational in the window bounds — cross-engine exact
        val energy = ((start + end) % 1000L).toDouble / 1000.0
        AudioSegment(m.media_id, i.toInt, start, end, energy)
      }
    }
  }

  /** Build a fake media table from documents (text bytes as the opaque
    * payload) — exercises the binary-column path end-to-end. No ImageIO
    * reader matches text bytes, so these rows take the stub twin. */
  def mediaFromDocuments(s: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import s.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Encode one deterministic tiny RGB PNG — a REAL PNG byte stream via
    * ImageIO, with pixel values a pure function of (x, y, seed). */
  def tinyPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(idx) = ((x * 31 + y * 17 + seed) & 0xFFFFFF).toInt
        idx += 1
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w) // bulk write, not per-pixel sync
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-image fixture: one tiny PNG per document, dimensions a pure
    * doc_id arithmetic (8 + id % 61, 8 + 7·id % 53) — so the DuckDB
    * oracle PREDICTS width/height while the Spark side must genuinely
    * encode and re-parse a PNG header to report them. Generation is a
    * narrow mapPartitions (no shuffle), the same batch shape a real
    * ingest-side transcode runs in. */
  def imagesFromDocuments(s: SparkSession, docs: DataFrame)
      : Dataset[MediaRow] = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 61).toInt
        val h = 8 + ((id * 7) % 53).toInt
        MediaRow(id, tinyPng(w, h, id))
      }
    }
  }
}
