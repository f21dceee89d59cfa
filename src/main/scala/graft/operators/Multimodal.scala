package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines
  * (beyond-parity; SURVEY.md §7.3#7).
  *
  * Media (image/audio/video) travels as opaque `binary` columns next
  * to a typed metadata struct. The Spark-side machinery — schema,
  * batch iteration via mapPartitions, partition sizing — is real and
  * tested; the actual codec calls are STUBBED with a deterministic
  * fake (this container has no image/audio libraries). Swapping the
  * stub for a real decoder (JNI/ffmpeg/javacv) changes only the
  * function body marked DECODE-STUB below.
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

  /** DECODE-STUB: a real implementation would hand `payload` to an
    * image codec and return (width, height, feature vector). This fake
    * is deterministic in the payload bytes so tests are stable: width/
    * height from a byte hash, features = 8-bin byte histogram,
    * normalized. The SIGNATURE and batch shape are the real contract.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.fill(8)(0.0))
    else {
      var h = 1125899906842597L
      val hist = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        h = h * 31L + (payload(i) & 0xffL)
        hist((payload(i) & 0xff) >>> 5) += 1.0
        i += 1
      }
      val n = payload.length.toDouble
      (64 + math.floorMod(h, 512).toInt, 64 + math.floorMod(h >> 16, 512).toInt,
        hist.map(_ / n))
    }
  }

  /** Decode / feature-extract over media rows. mapPartitions (not a
    * per-row UDF) so a real codec can amortize init per task — the
    * Scala analogue of a Pandas `mapInPandas` batch UDF.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // real codecs would initialize here, once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (w, h, feats) = decodeStub(payload)
        Row(id, w, h, if (payload == null) 0L else payload.length.toLong, feats)
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
