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
  * 0 (dimensions are never fabricated). Audio decode is REAL too —
  * `javax.sound.sampled` ships in the JDK, so WAV/AIFF/AU payloads
  * yield true sample rate, channel count, frame count and amplitude
  * statistics ([[extractAudioFeatures]]). Video is REAL at the
  * container level — [[extractVideoFeatures]] demuxes RIFF/AVI
  * (header parse + `movi` chunk walk, both public formats), decodes
  * uncompressed DIB frames natively (bottom-up BGR rows, 4-byte
  * stride) and MJPEG frames through the same `javax.imageio` JPEG
  * reader the image path uses. Codecs beyond that (H.264 etc.) are
  * not in the JDK and would slot into the same per-frame decode hook.
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

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("dhash_h", LongType, nullable = true),
    StructField("dhash_v", LongType, nullable = true)))

  /** Brightness sums + pixel counts on a gw × gh grid — the
    * block-mean resize kernel shared by [[imageDHash]] and
    * [[resizeLuma]] (pixel (x, y) → block ((x·gw)/w, (y·gh)/h)). */
  private def gridSums(px: Array[Int], w: Int, h: Int, gw: Int, gh: Int)
      : (Array[Long], Array[Long]) = {
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = ((y.toLong * gh) / h).toInt
      var x = 0
      while (x < w) {
        val gx = ((x.toLong * gw) / w).toInt
        val p = px(y * w + x)
        sums(gy * gw + gx) +=
          ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
        cnts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    (sums, cnts)
  }

  /** Difference-hash (dHash) perceptual image fingerprints — the
    * image-modality near-dup key (near-identical images differ in a
    * few bits; pair via XOR+popcount or the simhash band-bucket
    * join, [[Dedup.simhashNearDup]]'s layout). Two 64-bit hashes per
    * image: `dhash_h` compares horizontally adjacent blocks on a 9x8
    * brightness grid (bit y*8+x = block(x+1,y) brighter than
    * block(x,y)), `dhash_v` vertically adjacent blocks on 8x9
    * (bit y*8+x = block(x,y+1) brighter than block(x,y)).
    *
    * The downsample is exact integer arithmetic, not a platform
    * scaler ([[gridSums]]): pixel i maps to block `i*grid/size`
    * (floor) — so block k spans
    * `[ceil(k*size/grid), ceil((k+1)*size/grid))` — block brightness
    * is the summed r+g+b, and comparisons cross-multiply sums
    * against pixel counts — so the hash is reproducible bit-for-bit
    * by any engine from the decoded pixels (no interpolation, no
    * float rounding, no AWT rescale variance). Undecodable payloads
    * and rasters smaller than the 9-block grid emit NULL hashes
    * (never fabricated bits). */
  def imageDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(dhashSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      def blocks(px: Array[Int], w: Int, h: Int, gw: Int, gh: Int) =
        gridSums(px, w, h, gw, gh)

      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (payload == null || payload.length < 8) null
          else try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(id, 0, 0, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          if (w < 9 || h < 9) Row(id, w, h, null, null)
          else {
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val (hs, hc) = blocks(px, w, h, 9, 8)
            val (vs, vc) = blocks(px, w, h, 8, 9)
            var dh = 0L; var dv = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                // brighter-than = mean compare via cross-multiply
                if (hs(y * 9 + x + 1) * hc(y * 9 + x) >
                    hs(y * 9 + x) * hc(y * 9 + x + 1))
                  dh |= 1L << (y * 8 + x)
                if (vs((y + 1) * 8 + x) * vc(y * 8 + x) >
                    vs(y * 8 + x) * vc((y + 1) * 8 + x))
                  dv |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            Row(id, w, h, dh, dv)
          }
        }
      }
    }(enc)
  }

  private val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("gy", IntegerType, nullable = false),
    StructField("gx", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Block-mean image RESIZE to a gw × gh grid — the multimodal
    * downscale step, explicit (the kernel [[imageDHash]] uses
    * internally, surfaced as data): each output cell is the exact
    * mean brightness of its source block, emitted long-format as
    * (media_id, gy, gx, n_px, mean_luma). Sums and counts are exact
    * longs; the mean is one fixed divide (sum / (3·count)) rounded
    * to 4 — oracle-replayable for any analytically-constructed
    * fixture. Undecodable payloads and images smaller than the grid
    * emit no rows. Row-local decode on executors, shuffle-free. */
  def resizeLuma(media: DataFrame, gw: Int = 4, gh: Int = 4): DataFrame = {
    require(gw >= 1 && gh >= 1, s"grid must be positive: ${gw}x$gh")
    val enc = RowEncoder.encoderFor(resizeSchema)
    media.select("media_id", "payload").flatMap { r =>
      javax.imageio.ImageIO.setUseCache(false)
      val id = r.getLong(0)
      val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
      val img =
        if (payload == null || payload.length < 8) null
        else try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        } catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth < gw || img.getHeight < gh) Seq.empty
      else {
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val (sums, cnts) = gridSums(px, w, h, gw, gh)
        for (gy <- 0 until gh; gx <- 0 until gw) yield Row(
          id, gy, gx, cnts(gy * gw + gx),
          BigDecimal(sums(gy * gw + gx).toDouble /
            (3.0 * cnts(gy * gw + gx).toDouble))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }(enc)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("rms", DoubleType),
    StructField("n_flips", LongType)))

  /** Real audio decode: `javax.sound.sampled` parses the container and
    * yields 16-bit signed PCM samples. Returns None when the payload
    * is not recognized audio or not 16-bit PCM — the caller reports
    * zeros rather than fabricating a waveform. */
  private def decodeAudio(payload: Array[Byte])
      : Option[(Int, Int, Long, Int, Double, Long)] = {
    if (payload == null || payload.length < 12) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
            f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val bytes = ais.readAllBytes()
        val big = f.isBigEndian
        val n = bytes.length / 2
        var peak = 0
        var sumSq = 0.0
        var flips = 0L
        var prevSign = 0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
          val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
          val s = (hi << 8) | lo
          val a = math.abs(s)
          if (a > peak) peak = a
          sumSq += s.toDouble * s
          val sign = Integer.signum(s)
          if (sign != 0 && prevSign != 0 && sign != prevSign) flips += 1
          if (sign != 0) prevSign = sign
          i += 1
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        Some((f.getSampleRate.toInt, f.getChannels,
          n.toLong / f.getChannels, peak, rms, flips))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio feature extraction over media rows — same mapPartitions
    * shape as [[extractFeatures]]. Recognized 16-bit PCM audio yields
    * the decoded header (sample rate, channels, frames) and waveform
    * statistics (peak, RMS, sign transitions); anything else reports
    * an all-zeros row, never a fabricated waveform. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeAudio(payload) match {
          case Some((rate, ch, n, peak, rms, flips)) =>
            Row(id, rate, ch, n, peak, rms, flips)
          case None => Row(id, 0, 0, 0L, 0, 0.0, 0L)
        }
      }
    }(enc)
  }

  private val audioFingerprintSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("fingerprint", LongType),
    StructField("n_samples", LongType),
    StructField("n_transitions", LongType)))

  /** Amplitude-invariant audio fingerprint: the decoded 16-bit PCM
    * stream is cut into `windows` equal sample ranges (sample i →
    * window i·W/n, integer division) and bit w is the PARITY of the
    * sign-transition count inside window w — the same zero-skipping
    * transition rule [[extractAudioFeatures]] counts globally. Gain
    * changes, which scale every sample, cannot move a single bit
    * (the audio analogue of [[imageDHash]]'s gradient-sign
    * invariance); time edits flip only the bits of the windows they
    * touch, so Hamming distance localizes the difference.
    * Unrecognized/non-PCM payloads report fingerprint 0 with
    * n_samples 0, never a fabricated waveform. `n_transitions`
    * carries the raw sign-transition count so downstream pairing can
    * tell a genuinely featureless clip (decodable but constant-sign:
    * silence, DC, sub-half-period) from real signal — both hash to
    * 0L. */
  def audioFingerprint(media: DataFrame, windows: Int = 64): DataFrame = {
    require(windows >= 1 && windows <= 64, s"windows must be 1..64: $windows")
    val enc = RowEncoder.encoderFor(audioFingerprintSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodePcm(payload) match {
          case Some(samples) if samples.length > 0 =>
            val n = samples.length
            val bits = new Array[Int](windows)
            var prevSign = 0
            var transitions = 0L
            var i = 0
            while (i < n) {
              val sign = Integer.signum(samples(i))
              if (sign != 0 && prevSign != 0 && sign != prevSign) {
                bits(((i.toLong * windows) / n).toInt) ^= 1
                transitions += 1
              }
              if (sign != 0) prevSign = sign
              i += 1
            }
            var fp = 0L
            var w = 0
            while (w < windows) { fp |= bits(w).toLong << w; w += 1 }
            Row(id, fp, n.toLong, transitions)
          case _ => Row(id, 0L, 0L, 0L)
        }
      }
    }(enc)
  }

  /** Raw 16-bit PCM samples of a recognized clip (channel-interleaved
    * order, the order the transition counters walk). */
  private def decodePcm(payload: Array[Byte]): Option[Array[Int]] = {
    if (payload == null || payload.length < 12) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 ||
            f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val bytes = ais.readAllBytes()
        val big = f.isBigEndian
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
          val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
          out(i) = (hi << 8) | lo
          i += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio near-duplicate pairs: clips whose [[audioFingerprint]]s
    * are IDENTICAL — same waveform shape at any gain (the mm7
    * image-near-dup counterpart for audio; loudness-normalized
    * re-encodes of one clip collide, different content does not).
    * Exact-fingerprint blocking is one hash shuffle on an 8-byte
    * key — the dd1 shape, payloads never move; relax to banded
    * Hamming blocking ([[Dedup.hammingPairs]]) when robustness to
    * small edits is needed. Clips with no sign transitions never
    * pair: that excludes undecodable payloads AND decodable
    * constant-sign clips (silence, DC offset, sub-half-period
    * snippets), all of which share the degenerate fingerprint 0L and
    * would otherwise form one quadratic all-pairs clique of
    * unrelated clips. */
  def audioNearDupPairs(media: DataFrame, windows: Int = 64): DataFrame = {
    val fps = audioFingerprint(media, windows)
      .filter(col("n_samples") > 0 && col("n_transitions") > 0)
    fps.select(col("fingerprint"), col("media_id").as("id_a"))
      .join(fps.select(col("fingerprint"), col("media_id").as("id_b")),
        Seq("fingerprint"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fingerprint"))
  }

  /** Deterministic WAV fixture table: one square-wave mono 16-bit PCM
    * clip per input row (amplitude `amp`, sign flipping every
    * `halfPeriod` samples), encoded by the REAL `javax.sound.sampled`
    * WAV writer on executors — the audio sibling of
    * [[synthesizePngTable]]. A square wave makes the decode side
    * analytically checkable: every sample is ±amp, so peak = RMS =
    * amp EXACTLY (independent of period alignment), and the number of
    * sign transitions is floor((n-1)/halfPeriod). */
  def synthesizeWavTable(df: DataFrame, idCol: String, sampleRate: Column,
      nSamples: Column, amp: Column, halfPeriod: Column): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val prepped = df.select(col(idCol).cast("long").as("media_id"),
      sampleRate.cast("int").as("rate"), nSamples.cast("int").as("n"),
      amp.cast("int").as("a"), halfPeriod.cast("int").as("hp"))
    prepped.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val rate = r.getInt(1); val n = r.getInt(2)
        val a = r.getInt(3); val hp = r.getInt(4)
        require(rate > 0 && n > 0 && a > 0 && a <= Short.MaxValue && hp > 0,
          s"synthesizeWavTable: bad params (rate=$rate n=$n amp=$a hp=$hp) for id $id")
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = if ((i / hp) % 2 == 0) a else -a
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row("audio/wav", bytes.length.toLong, "synth"))
      }
    }(enc)
  }

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("micros_per_frame", IntegerType),
    StructField("n_frames", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Real AVI demux + frame decode. Parses the RIFF container (the
    * AVI layout is a public Microsoft format: `RIFF 'AVI ' [LIST
    * 'hdrl' [avih ...]] [LIST 'movi' [00db|00dc ...]]`), reads the
    * main header for frame timing and raster dimensions, walks the
    * `movi` list, and decodes every video chunk: `00db` (uncompressed
    * DIB — bottom-up BGR rows padded to 4-byte stride) natively,
    * `00dc` MJPEG via `javax.imageio`. Returns None for anything that
    * is not a parseable AVI — callers report zeros, never a
    * fabricated clip. Result: (width, height, microsPerFrame,
    * nFrames, meanR, meanG, meanB) with means over all decoded
    * pixels of all frames. */
  private def decodeAvi(payload: Array[Byte])
      : Option[(Int, Int, Int, Long, Double, Double, Double)] = {
    if (payload == null || payload.length < 24) return None
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ") return None
    try {
      var width = 0; var height = 0; var microsPerFrame = 0
      var nFrames = 0L
      var sr = 0L; var sg = 0L; var sb = 0L; var nPix = 0L

      // decode one DIB frame: 24bpp BI_RGB, bottom-up, stride padded
      // to 4 bytes; row order doesn't matter for channel sums
      def dibSums(off: Int, size: Int): Unit = {
        val stride = ((width * 3) + 3) & ~3
        if (size < stride * height) return
        var y = 0
        while (y < height) {
          var x = 0
          val row = off + y * stride
          while (x < width) {
            sb += payload(row + 3 * x) & 0xff
            sg += payload(row + 3 * x + 1) & 0xff
            sr += payload(row + 3 * x + 2) & 0xff
            x += 1
          }
          y += 1
        }
        nPix += width.toLong * height
      }

      def jpegSums(off: Int, size: Int): Unit = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, off, size))
        if (img == null) return
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        nPix += w.toLong * h
      }

      // walk chunks; LIST chunks recurse (their body starts with a
      // 4-byte list type). Chunk sizes are padded to even offsets.
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourCC(payload, off)
          val size = leInt(payload, off + 4)
          if (size < 0 || off + 8 + size > end) return
          val body = off + 8
          id match {
            case "LIST" => walk(body + 4, body + size)
            case "avih" if size >= 40 =>
              microsPerFrame = leInt(payload, body)
              nFrames = leInt(payload, body + 16).toLong
              width = leInt(payload, body + 32)
              height = leInt(payload, body + 36)
            case "00db" if width > 0 && height > 0 => dibSums(body, size)
            case "00dc" => jpegSums(body, size)
            case _ => ()
          }
          off = body + size + (size & 1)
        }
      }
      walk(12, math.min(payload.length, 8 + leInt(payload, 4)))

      if (width <= 0 || height <= 0 || nFrames <= 0L) None
      else {
        val d = if (nPix == 0) 1.0 else nPix.toDouble
        Some((width, height, microsPerFrame, nFrames, sr / d, sg / d, sb / d))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Video feature extraction over media rows — same mapPartitions
    * shape as [[extractFeatures]]. Parseable AVI payloads yield the
    * container header (raster dims, frame timing, frame count) and
    * per-channel pixel means over every decoded frame; anything else
    * reports zeros. */
  def extractVideoFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeAvi(payload) match {
          case Some((w, h, mpf, n, mr, mg, mb)) =>
            Row(id, w, h, mpf, n, mr, mg, mb)
          case None => Row(id, 0, 0, 0, 0L, 0.0, 0.0, 0.0)
        }
      }
    }(enc)
  }

  /** Deterministic AVI fixture table: one uncompressed-DIB AVI clip
    * per input row — even frames solid `evenRgb`, odd frames solid
    * `oddRgb` (packed 0xRRGGBB) — assembled as a genuine RIFF/AVI
    * byte stream on executors, the video sibling of
    * [[synthesizePngTable]]/[[synthesizeWavTable]]. Solid alternating
    * frames make the demux+decode side analytically checkable:
    * channel means are the frame-count-weighted average of the two
    * colors, and header fields round-trip exactly. */
  def synthesizeAviTable(df: DataFrame, idCol: String, width: Column,
      height: Column, nFrames: Column, microsPerFrame: Column,
      evenRgb: Column, oddRgb: Column): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val prepped = df.select(col(idCol).cast("long").as("media_id"),
      width.cast("int").as("w"), height.cast("int").as("h"),
      nFrames.cast("int").as("nf"), microsPerFrame.cast("int").as("mpf"),
      evenRgb.cast("int").as("even"), oddRgb.cast("int").as("odd"))
    prepped.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = r.getInt(1); val h = r.getInt(2)
        val nf = r.getInt(3); val mpf = r.getInt(4)
        require(w > 0 && h > 0 && nf > 0 && mpf > 0,
          s"synthesizeAviTable: bad params (${w}x$h nf=$nf mpf=$mpf) for id $id")
        val colors = Array(r.getInt(5), r.getInt(6))
        val stride = ((w * 3) + 3) & ~3
        val frameBytes = stride * h

        val bos = new java.io.ByteArrayOutputStream()
        def le(v: Int): Unit = {
          bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
          bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
        }
        def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))

        // sizes: avih chunk 8+40; hdrl LIST 12+48; movi LIST
        // 12 + nf*(8+frameBytes) (frameBytes is 4-aligned, no pad)
        val hdrlSize = 4 + 8 + 40
        val moviSize = 4 + nf * (8 + frameBytes)
        val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)

        cc("RIFF"); le(riffSize); cc("AVI ")
        cc("LIST"); le(hdrlSize); cc("hdrl")
        cc("avih"); le(40)
        le(mpf); le(0); le(0); le(0) // µs/frame, maxbytes/s, granularity, flags
        le(nf); le(0); le(1); le(0)  // totalframes, initial, streams, bufsize
        le(w); le(h)                 // width, height (10 dwords = 40 bytes)
        cc("LIST"); le(moviSize); cc("movi")
        val frame = new Array[Byte](frameBytes)
        var f = 0
        while (f < nf) {
          val rgb = colors(f % 2)
          val bB = (rgb & 0xff).toByte
          val gB = ((rgb >> 8) & 0xff).toByte
          val rB = ((rgb >> 16) & 0xff).toByte
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              frame(y * stride + 3 * x) = bB
              frame(y * stride + 3 * x + 1) = gB
              frame(y * stride + 3 * x + 2) = rB
              x += 1
            }
            y += 1
          }
          cc("00db"); le(frameBytes); bos.write(frame)
          f += 1
        }
        val bytes = bos.toByteArray
        Row(id, bytes, Row("video/avi", bytes.length.toLong, "synth"))
      }
    }(enc)
  }

  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL frame sampling: demux the AVI container and decode every
    * `stride`-th video frame (`00db` DIB natively, `00dc` MJPEG via
    * `javax.imageio`) into one output row with its per-channel means —
    * the real-codec upgrade of [[sampleFrames]]'s exploded contract.
    * Non-AVI payloads contribute no rows (never fabricated frames).
    * flatMap over mapPartitions: each clip's frames stream out without
    * materializing the whole clip's decoded rasters at once. */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val enc = RowEncoder.encoderFor(frameFeatureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (payload == null || payload.length < 24 ||
            fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ")
          Iterator.empty
        else {
          try {
            var width = 0; var height = 0
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            var frameIdx = 0
            def emitDib(off: Int, size: Int): Unit = {
              val stride4 = ((width * 3) + 3) & ~3
              if (size < stride4 * height) return
              if (frameIdx % stride == 0) {
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < height) {
                  var x = 0
                  val row = off + y * stride4
                  while (x < width) {
                    sb += payload(row + 3 * x) & 0xff
                    sg += payload(row + 3 * x + 1) & 0xff
                    sr += payload(row + 3 * x + 2) & 0xff
                    x += 1
                  }
                  y += 1
                }
                val n = (width.toLong * height).toDouble
                out += Row(id, frameIdx, width, height, sr / n, sg / n, sb / n)
              }
              frameIdx += 1
            }
            def emitJpeg(off: Int, size: Int): Unit = {
              if (frameIdx % stride == 0) {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload, off, size))
                if (img != null) {
                  val w = img.getWidth; val h = img.getHeight
                  val px = img.getRGB(0, 0, w, h, null, 0, w)
                  var sr = 0L; var sg = 0L; var sb = 0L
                  var i = 0
                  while (i < px.length) {
                    val p = px(i)
                    sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
                    i += 1
                  }
                  val n = (w.toLong * h).toDouble
                  out += Row(id, frameIdx, w, h, sr / n, sg / n, sb / n)
                }
              }
              frameIdx += 1
            }
            def walk(start: Int, end: Int): Unit = {
              var off = start
              while (off + 8 <= end) {
                val cid = fourCC(payload, off)
                val size = leInt(payload, off + 4)
                if (size < 0 || off + 8 + size > end) return
                val body = off + 8
                cid match {
                  case "LIST" => walk(body + 4, body + size)
                  case "avih" if size >= 40 =>
                    width = leInt(payload, body + 32)
                    height = leInt(payload, body + 36)
                  case "00db" if width > 0 && height > 0 => emitDib(body, size)
                  case "00dc" => emitJpeg(body, size)
                  case _ => ()
                }
                off = body + size + (size & 1)
              }
            }
            walk(12, math.min(payload.length, 8 + leInt(payload, 4)))
            out.iterator
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling for video-as-binary: split the
    * payload into `frameSize`-byte pseudo-frames and keep every
    * `stride`-th. [[sampleVideoFrames]] is the real-codec form
    * (container demux + frame decode); this byte-window form remains
    * for opaque non-AVI payloads.
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
