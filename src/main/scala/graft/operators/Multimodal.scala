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
    * intermediate with heavy filtering). */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long,
      exactCount: Boolean = false): DataFrame = {
    val totalBytes: Long =
      if (exactCount)
        media.agg(sum(coalesce(col("meta.n_bytes"),
          octet_length(col("payload")).cast("long"))).cast("long")).head().getLong(0)
      else
        media.queryExecution.optimizedPlan.stats.sizeInBytes
          .min(BigInt(Long.MaxValue)).toLong
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
    media.repartition(parts)
  }
}
