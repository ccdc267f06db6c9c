package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (config mirrors the driver's Verify). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** The committed data directory of replica version v. Data dirs are
    * attempt-suffixed (`data/v<v>-<attempt>`) since the multi-writer
    * hardening; once v is committed, exactly one referenced dir survives
    * (defeated/crashed attempts are GC'd). Returns a non-existent
    * `data/v<v>` placeholder when no attempt dir exists, so
    * `.exists()` assertions read naturally. */
  def versionDataDir(root: String, v: Long): java.io.File = {
    val d = new java.io.File(s"$root/data")
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName == s"v$v" || f.getName.startsWith(s"v$v-"))
      .sortBy(_.getName).headOption
      .getOrElse(new java.io.File(d, s"v$v"))
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions) // cluster twin: spark.sql.extensions
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
