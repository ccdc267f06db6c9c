package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round lineage-truncation policy for the fixpoint operators
  * ([[PageRank]], [[ConnectedComponents]], the LSH component closure in
  * graft.Extensions).
  *
  * Both modes cut the logical plan back to a scan so iteration k plans in
  * O(1), not O(k); they differ in what survives an executor loss:
  *
  *  - '''local''' (default): `localCheckpoint()` — blocks live
  *    unreplicated on executors. Fastest (no FS round-trip) and released
  *    by the ContextCleaner when the DataFrame is GC'd, but one lost
  *    executor kills the whole job with an unrecoverable missing-block
  *    error. Right for tests, bench, and short single-node runs.
  *  - '''reliable(dir)''': `checkpoint()` against a durable filesystem
  *    (HDFS / object store). A lost executor re-reads from storage
  *    instead of aborting — the difference between "survives a
  *    1000-executor hour" and "dies on the first executor churn".
  *    Required for long iterative jobs at cluster scale. Checkpoint
  *    files outlive the job unless
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
  *
  * Resolution order: explicit `checkpointDir` param, else the
  * `graft.checkpoint.dir` session conf, else local. The conf hook lets
  * fixed-signature query closures (SparkEntry.queries) opt in without
  * API changes — a 100 TB deployment sets one conf and every fixpoint
  * becomes fault-tolerant.
  */
final class RoundCheckpointer private (dir: Option[String]) {
  private var dirApplied = false

  /** Materialize `df` and truncate its lineage under the resolved policy. */
  def truncate(df: DataFrame): DataFrame = dir match {
    case Some(d) =>
      if (!dirApplied) {
        df.sparkSession.sparkContext.setCheckpointDir(d)
        dirApplied = true
      }
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** Truncate lineage WITHOUT forcing a materialization job: planning
    * still happens now (the plan is cut to a scan, same as [[truncate]]),
    * but the blocks persist inside the NEXT action that touches the frame.
    * For a fixpoint round that is immediately followed by its convergence
    * check (ConnectedComponents' checksum) — or consumed by the next
    * round's join (PageRank's fixed-iteration rank vector) — this folds
    * the round's dedicated materialization job into an action that runs
    * anyway: half the scheduler round-trips per iteration, identical
    * results and identical post-checkpoint lineage. Use [[truncate]] when
    * nothing downstream is guaranteed to materialize the frame before its
    * inputs are unpersisted. */
  def truncateLazy(df: DataFrame): DataFrame = dir match {
    case Some(d) =>
      if (!dirApplied) {
        df.sparkSession.sparkContext.setCheckpointDir(d)
        dirApplied = true
      }
      df.checkpoint(eager = false)
    case None => df.localCheckpoint(eager = false)
  }

  /** True when rounds checkpoint to durable storage. */
  def reliable: Boolean = dir.isDefined
}

object RoundCheckpointer {
  val ConfKey = "graft.checkpoint.dir"

  def resolve(spark: SparkSession, explicit: Option[String]): RoundCheckpointer =
    new RoundCheckpointer(explicit.orElse(
      Option(spark.conf.get(ConfKey, null)).filter(_.nonEmpty)))
}
