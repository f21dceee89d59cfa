package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.util.SerializableConfiguration

/** Object-per-row sink — parity with the reference's S3 "object per
  * row" mode (`manager/S3Manager.java:220-254`, SURVEY.md §2.2 W11):
  * one output object per input row, key from `keyColumn`, body from
  * `contentColumn` (string or binary).
  *
  * Implemented over the Hadoop FileSystem API so the same code writes
  * to `file://`, `hdfs://`, or `s3a://` (with hadoop-aws on the
  * cluster classpath). Rows are written from `foreachPartition` —
  * each task streams its own rows, no driver funnel; at 100 TB the
  * throughput limit is the object store's request rate, so callers
  * control parallelism with the DataFrame's partitioning.
  */
object ObjectPerRowSink {

  def write(df: DataFrame, basePath: String, keyColumn: String,
      contentColumn: String, overwrite: Boolean = true): Unit = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyColumn)
    val contentIdx = schema.fieldIndex(contentColumn)
    val isBinary = schema(contentIdx).dataType ==
      org.apache.spark.sql.types.BinaryType
    val serConf = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)

    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val base = new Path(basePath)
      val fs = base.getFileSystem(serConf.value)
      // no .crc side files — the object IS the payload (the reference
      // deletes them after the fact, LocalFileManager/`.crc` cleanup)
      fs.setWriteChecksum(false)
      rows.foreach { r =>
        if (!r.isNullAt(keyIdx)) {
          val key = r.get(keyIdx).toString
          val out = fs.create(new Path(base, key), overwrite)
          try {
            if (!r.isNullAt(contentIdx)) {
              val bytes =
                if (isBinary) r.getAs[Array[Byte]](contentIdx)
                else r.get(contentIdx).toString.getBytes("UTF-8")
              out.write(bytes)
            }
          } finally out.close()
        }
      }
    }
  }
}
