package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.charset.StandardCharsets
import java.util.EnumSet

/** Filesystem-agnostic control-plane I/O for the versioned stores
  * ([[BucketedReplica]], [[IncrementalAgg]]).
  *
  * All pointer/manifest/meta operations go through the Hadoop
  * `FileContext` API instead of `java.nio` so the SAME code runs against
  * local disk in tests and against HDFS-compatible storage on a cluster —
  * the store root is just a URI (`file:/...`, `hdfs://...`,
  * `viewfs://...`).
  *
  * The commit primitive is [[createExclusive]] — write-once creation of a
  * version-named pointer file. Creation makes the NAME visible atomically
  * on POSIX, HDFS, and object stores (a PUT of a new key), which is what
  * the stores' readers rely on; rename is deliberately NOT used anywhere,
  * because overwrite-rename is only atomic on some filesystems
  * (FileContext emulates it as delete-then-rename on the local FS — a
  * reader-visible gap).
  *
  * Deliberately NOT `FileSystem`: on local disk `FileSystem` is the
  * checksummed `LocalFileSystem`, whose `.crc` sidecars would desync under
  * out-of-band writes; `FileContext`'s local implementation is raw.
  */
final class StoreIO(rootStr: String, conf: Configuration) {

  private val fc = FileContext.getFileContext(new Path(rootStr).toUri, conf)

  val root: Path = new Path(rootStr)

  def path(rel: String): Path = new Path(rootStr + "/" + rel)

  def exists(p: Path): Boolean = fc.util.exists(p)

  def readString(p: Path): String = {
    val in = fc.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Create-or-truncate `p` (parents created), with the bytes of `s`. */
  def writeString(p: Path, s: String): Unit = {
    val out = fc.create(p, EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Write-once create (fails if `p` exists) — the pointer-commit
    * primitive: the new name becomes visible all-at-once, and a second
    * writer racing on the same version fails loudly instead of silently
    * clobbering (single-writer contract). */
  def createExclusive(p: Path, s: String): Unit = {
    val out = fc.create(p, EnumSet.of(CreateFlag.CREATE),
      Options.CreateOpts.createParent())
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Immediate child FILES of `p` (empty if `p` doesn't exist). */
  def listFiles(p: Path): Seq[Path] =
    if (!exists(p)) Seq.empty
    else fc.util.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)

  /** Recursive delete; silently ignores a missing path. */
  def delete(p: Path): Unit =
    if (exists(p)) { fc.delete(p, true); () }

  def mkdirs(p: Path): Unit = fc.mkdir(p, FsPermission.getDirDefault, true)

  /** Immediate child DIRECTORIES of `p` (empty if `p` doesn't exist). */
  def listDirs(p: Path): Seq[Path] =
    if (!exists(p)) Seq.empty
    else fc.util.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
}

object StoreIO {
  /** The session's Hadoop configuration when a session is up (always, in
    * normal operation — stores live inside Spark apps), else a default
    * [[Configuration]] so pure-JVM callers (store destroy in test cleanup)
    * still resolve local paths. */
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}
