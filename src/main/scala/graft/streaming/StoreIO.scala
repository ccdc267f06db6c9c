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
  * `viewfs://...`). `rename(OVERWRITE)` — the pointer-commit primitive —
  * is atomic on POSIX local filesystems and on HDFS, which is exactly the
  * guarantee the stores' readers rely on. Object stores without atomic
  * rename (S3) would swap this one call for a conditional PUT of the
  * pointer object; every other operation here is already plain
  * read/write/list/delete (see SCALE.md).
  *
  * Deliberately NOT `FileSystem`: on local disk `FileSystem` is the
  * checksummed `LocalFileSystem`, whose `.crc` sidecars would desync under
  * out-of-band renames; `FileContext`'s local implementation is raw.
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

  /** Atomic replace of `dst` by `src` — the pointer-commit primitive. */
  def renameOverwrite(src: Path, dst: Path): Unit =
    fc.rename(src, dst, Options.Rename.OVERWRITE)

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
