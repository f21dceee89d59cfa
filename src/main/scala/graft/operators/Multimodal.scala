package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines
  * (beyond-parity; SURVEY.md §7.3#7).
  *
  * Media (image/audio/video) travels as opaque `binary` columns next
  * to a typed metadata struct. Image decode is REAL — `javax.imageio`
  * is in the JDK, so PNG/JPEG/GIF/BMP payloads yield true raster
  * dimensions and per-channel pixel statistics; payloads no installed
  * reader understands fall back to byte statistics with width/height
  * 0 (dimensions are never fabricated). Audio/video codecs are not in
  * the JDK: those formats take the byte-stats path until a JNI/ffmpeg
  * decoder is wired into the same mapPartitions slot.
  *
  * At 100 TB: binary payloads dominate row size, so these operators
  * repartition by byte budget, not row count (`repartitionByBytes`),
  * keeping task inputs bounded regardless of media size skew.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Wrap any table into the media shape: `contentCol` (string or
    * binary) becomes the opaque payload. */
  def toMediaTable(df: DataFrame, idCol: String, contentCol: String,
      format: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("payload"),
      struct(
        lit(format).as("format"),
        octet_length(col(contentCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** Real image decode: `javax.imageio` reads the payload; a decoded
    * raster yields (width, height, [mean_r, mean_g, mean_b]). Returns
    * None when no installed reader recognizes the bytes (including
    * null/empty payloads) — the caller falls back to byte statistics
    * rather than fabricating dimensions. */
  private def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // bulk raster read: one array, not w*h virtual getRGB calls
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = (w.toLong * h).toDouble
        Some((w, h, Array(sr / n, sg / n, sb / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Non-image fallback features: normalized 8-bin byte histogram —
    * deterministic in the payload, cheap, and honest (no decoded
    * semantics implied). */
  private def byteHistogram(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array.fill(8)(0.0)
    else {
      val hist = new Array[Double](8)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) >>> 5) += 1.0; i += 1 }
      hist.map(_ / payload.length)
    }
  }

  /** Decode / feature-extract over media rows. mapPartitions (not a
    * per-row UDF) so codec init amortizes per task — the Scala
    * analogue of a Pandas `mapInPandas` batch UDF. Image payloads
    * (anything `javax.imageio` can read) produce true raster width/
    * height and per-channel means; everything else gets width/height
    * 0 and a byte histogram.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // keep ImageIO off its disk scratch cache: decode in memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val nBytes = if (payload == null) 0L else payload.length.toLong
        decodeImage(payload) match {
          case Some((w, h, feats)) => Row(id, w, h, nBytes, feats)
          case None => Row(id, 0, 0, nBytes, byteHistogram(payload))
        }
      }
    }(enc)
  }

  /** Deterministic PNG fixture table: one two-band image per input
    * row (top half `topRgb`, bottom half `bottomRgb`, packed
    * 0xRRGGBB), dimensions and colors all COLUMNS so construction is
    * distributed — encode runs on executors in the same mapPartitions
    * shape as [[extractFeatures]], nothing collects. The payload is a
    * genuine `javax.imageio` PNG byte stream, which is what makes the
    * decode side a real-codec test: decoded width/height and channel
    * means are analytically predictable from the parameters while the
    * bytes themselves round-trip a real encoder/decoder pair. */
  def synthesizePngTable(df: DataFrame, idCol: String, width: Column,
      height: Column, topRgb: Column, bottomRgb: Column): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val prepped = df.select(col(idCol).cast("long").as("media_id"),
      width.cast("int").as("w"), height.cast("int").as("h"),
      topRgb.cast("int").as("top"), bottomRgb.cast("int").as("bottom"))
    prepped.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val w = r.getInt(1); val h = r.getInt(2)
        require(w > 0 && h > 0, s"synthesizePngTable: non-positive dims ${w}x$h for id $id")
        val top = r.getInt(3); val bottom = r.getInt(4)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val rgb = if (y < h / 2) top else bottom
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row("image/png", bytes.length.toLong, "synth"))
      }
    }(enc)
  }

  /** Deterministic frame sampling for video-as-binary: split the
    * payload into `frameSize`-byte pseudo-frames and keep every
    * `stride`-th. Real impl: container demux + keyframe select; the
    * exploded output shape (media_id, frame_idx, frame) is the
    * contract.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameSize).cast("int")
    media
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(col("payload"), (i * frameSize + 1).cast("int"), lit(frameSize))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0 && octet_length(col("frame")) > 0)
  }

  /** Repartition media rows so each task reads a bounded number of
    * payload bytes — media tables are byte-skewed, row-count
    * partitioning is wrong at scale.
    *
    * The byte total comes from Catalyst's plan statistics
    * (file-listing sizes for file sources — a metadata lookup, no
    * job), NOT from aggregating the payload column: at 100 TB an
    * exact pre-count would be a full extra pass over every byte it
    * is about to bound. `exactCount = true` opts into that pass for
    * callers whose plan statistics are unusable (e.g. a post-shuffle
    * intermediate with heavy filtering).
    *
    * Plan stats measure ALL columns (compressed) and, for non-leaf
    * plans without CBO, multiply child estimates — they can blow past
    * any physical reality (up to the Long.MaxValue sentinel). Two
    * guards: an estimate in the sentinel range falls back to the
    * exact aggregate, and the final count is clamped to
    * `maxPartitions` so a bad estimate can never ask `repartition`
    * for an absurd shuffle. */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long,
      exactCount: Boolean = false, maxPartitions: Int = 1 << 16): DataFrame = {
    def exact: Long =
      media.agg(sum(coalesce(col("meta.n_bytes"),
        octet_length(col("payload")).cast("long"))).cast("long")).head().getLong(0)
    val totalBytes: Long =
      if (exactCount) exact
      else {
        val est = media.queryExecution.optimizedPlan.stats.sizeInBytes
        // >= Long.MaxValue/2 is the no-information regime: the
        // defaultSizeInBytes sentinel itself, or a multiplied
        // join/filter estimate that saturated toward it
        if (est >= BigInt(Long.MaxValue / 2)) exact else est.toLong
      }
    val parts = math.min(maxPartitions.toLong,
      math.max(1L, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toLong)).toInt
    media.repartition(parts)
  }
}
