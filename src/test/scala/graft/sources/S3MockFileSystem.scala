package graft.sources

import java.io.File
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** In-JVM S3 stand-in (verdict r11 #2): a Hadoop `FileSystem`
  * registered as the `s3a` scheme implementation
  * (`fs.s3a.impl=graft.sources.S3MockFileSystem`) and backed by a
  * local directory — `s3a://<bucket>/<key>` maps onto
  * `<fs.graft.s3mock.root>/<bucket>/<key>`.
  *
  * This is exactly how the real `hadoop-aws` S3AFileSystem plugs in
  * (absent from this container), so the ENGINE code under test —
  * `ConnectorRegistry.kindOf("s3a://…") → S3`, `FileConnector`'s
  * write/read/atomic paths, `ObjectPerRowSink`'s FileSystem-API
  * writes — runs its genuine production branch against genuine
  * `s3a://bucket/key` URIs; only the bytes land locally. Directory
  * rename is atomic here where real S3 renames are copy+delete — the
  * atomic-swap committer treats s3a as "non-local" and uses the
  * rename-aside layout either way (FileConnector.writeAtomic), which
  * this mock exercises.
  *
  * Test scaffolding only (test classpath); the production classpath
  * carries no mock.
  */
class S3MockFileSystem extends RawLocalFileSystem {

  private var root: File = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    root = new File(conf.get(S3MockFileSystem.RootKey,
      System.getProperty("java.io.tmpdir") + "/graft-s3mock"))
    root.mkdirs()
  }

  override def getScheme: String = "s3a"

  override def getUri: URI = URI.create("s3a:///")

  /** `s3a://bucket/key` → `<root>/bucket/key`; a bucket is just the
    * first directory level under the mock root. */
  override def pathToFile(path: Path): File = {
    val u = path.toUri
    val bucket = Option(u.getAuthority).getOrElse("")
    new File(root, bucket + u.getPath)
  }

  /** Any bucket (authority) is valid on this filesystem — only the
    * scheme must match. The default check would reject every real
    * `s3a://bucket/...` path against the authority-less fs URI. */
  override def checkPath(path: Path): Unit = {
    val scheme = path.toUri.getScheme
    if (scheme != null && scheme != "s3a")
      throw new IllegalArgumentException(
        s"Wrong FS scheme: $path, expected: s3a")
  }

  /** Qualify against the path's OWN bucket (default qualification
    * would drop the authority and resolve against the working dir). */
  override def makeQualified(path: Path): Path = {
    val u = path.toUri
    if (u.getScheme != null) path
    else new Path("s3a", "", path.toString)
  }

  // RawLocalFileSystem builds every FileStatus path from the LOCAL
  // java.io.File and re-qualifies it against the fs URI — which here
  // leaks the backing directory as `s3a:/<local-root>/...` with the
  // bucket authority dropped, so a committer walking statuses
  // (FileOutputCommitter's task dirs) chases paths that don't exist.
  // Re-root every returned status on the CALLER's s3a path.

  // EAGER plain FileStatus: the raw-local status loads permissions
  // lazily via `new java.io.File(path.toUri)`, which rejects a
  // non-file scheme — so carry the eager fields over and drop the
  // lazy ones (object stores don't have POSIX permissions anyway)
  private def rewrap(st: org.apache.hadoop.fs.FileStatus,
      p: Path): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory, 1,
      st.getBlockSize, st.getModificationTime, p)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    rewrap(super.getFileStatus(f), makeQualified(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val base = makeQualified(f)
    val baseIsFile = pathToFile(base).isFile
    super.listStatus(f).map { st =>
      rewrap(st, if (baseIsFile) base else new Path(base, st.getPath.getName))
    }
  }
}

object S3MockFileSystem {
  val RootKey = "fs.graft.s3mock.root"

  /** Install the mock as the JVM's s3a implementation, rooted at
    * `rootDir`. Idempotent per session. */
  def install(spark: org.apache.spark.sql.SparkSession,
      rootDir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[S3MockFileSystem].getName)
    // uncached: every FileSystem.get(s3a…) reads the CURRENT conf, so
    // a later install() with a different root takes effect without
    // closing the shared session's cached file:// filesystem
    hconf.set("fs.s3a.impl.disable.cache", "true")
    hconf.set(RootKey, rootDir)
  }
}
