package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** SURVEY §2 custom-op option (c), complete form — a first-class AS-OF join:
  * for every probe row (key k, time t), the reference row with the same key
  * and the greatest time ≤ t. Spark has no native as-of; the composed
  * union-scan form (d10) is the big-big answer (one shuffle). THIS operator
  * is the other regime: a dimension-sized, time-versioned reference table
  * (price books, slowly-changing dims, config history) probed by an
  * unbounded fact stream — broadcast the reference grouped by key and
  * sorted by time, and each probe row binary-searches its key's timeline:
  * O(|probe|·log|ref per key|), the probe side never shuffles.
  *
  * Unlike [[BroadcastRangeJoinStrategy]] (which pattern-matches a built-in
  * Join), as-of is not expressible as one logical Join node, so this
  * operator demonstrates the full extension path: a custom LogicalPlan node
  * ([[AsofJoinPlan]]), a SparkStrategy planning it
  * ([[BroadcastAsofJoinStrategy]]), and the physical operator
  * ([[BroadcastAsofJoinExec]]), surfaced through a DataFrame-level API
  * ([[AsofJoin.broadcastAsof]]).
  *
  * Semantics are inner as-of, matching DuckDB's `ASOF JOIN ... ON l.k = r.k
  * AND l.t >= r.t`; ties on reference time break to the greatest tie-break
  * column (the ordered-log position), mirroring the d10 composition. Key,
  * time, and tie-break expressions must be LongType (guarded at the API).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime, rightTieBreak).forall(_.resolved)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-reference physical as-of join (see [[AsofJoinPlan]]). */
case class BroadcastAsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression, rightTieBreak: Expression,
    probe: SparkPlan, ref: SparkPlan) extends BinaryExecNode {

  override def left: SparkPlan = probe
  override def right: SparkPlan = ref
  override def output: Seq[Attribute] = probe.output ++ ref.output

  override protected def doExecute(): RDD[InternalRow] = {
    val rKey = BindReferences.bindReference(rightKey, ref.output)
    val rTime = BindReferences.bindReference(rightTime, ref.output)
    val rTie = BindReferences.bindReference(rightTieBreak, ref.output)
    // build: reference grouped by key, each timeline sorted by (time, tie);
    // null key/time rows can never match (SQL three-valued comparison)
    val built: Map[Long, (Array[Long], Array[InternalRow])] =
      ref.execute().map(_.copy()).collect()
        .flatMap { r =>
          (rKey.eval(r), rTime.eval(r), rTie.eval(r)) match {
            case (k: java.lang.Long, t: java.lang.Long, tie: java.lang.Long) =>
              Some((k.longValue, t.longValue, tie.longValue, r))
            case _ => None
          }
        }
        .groupBy(_._1)
        .map { case (k, rows) =>
          val sorted = rows.sortBy(r => (r._2, r._3))
          k -> (sorted.map(_._2), sorted.map(_._4))
        }
    val bc = session.sparkContext.broadcast(built)

    val pKey = BindReferences.bindReference(leftKey, probe.output)
    val pTime = BindReferences.bindReference(leftTime, probe.output)
    val outAttrs = output
    probe.execute().mapPartitions { rows =>
      val timelines = bc.value
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      rows.flatMap { row =>
        (pKey.eval(row), pTime.eval(row)) match {
          case (k: java.lang.Long, t: java.lang.Long) =>
            timelines.get(k.longValue) match {
              case Some((times, refRows)) =>
                // last index with time <= t (ties already ordered by tie-break)
                var lo = 0; var hi = times.length - 1; var last = -1
                val tv = t.longValue
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (times(mid) <= tv) { last = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                if (last < 0) Iterator.empty
                else Iterator.single(toUnsafe(joined(row, refRows(last))))
              case None => Iterator.empty
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(probe = newLeft, ref = newRight)
}

object BroadcastAsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      BroadcastAsofJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_ eq BroadcastAsofJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ BroadcastAsofJoinStrategy
  }
}

object AsofJoin {
  /** AS-OF join `probe` against a broadcastable time-versioned `ref`: for
    * each probe row, the ref row with equal `key` and greatest `time` ≤ the
    * probe's, ties on time broken by greatest `tie`. Both sides must carry
    * the named LongType columns; ref columns come back prefixed `ref_`
    * (also dealiasing the self-as-of case, where both inputs derive from
    * one relation and would otherwise collide attribute ids). */
  def broadcastAsof(probe: DataFrame, ref: DataFrame,
                    key: String, time: String, tie: String): DataFrame = {
    val spark = probe.sparkSession
    BroadcastAsofJoinStrategy.install(spark)
    val refAliased = ref.select(ref.columns.toSeq.map(c => col(c).as(s"ref_$c")): _*)
    val probePlan = probe.queryExecution.analyzed
    val refPlan = refAliased.queryExecution.analyzed
    // bind by name against the analyzed child outputs: the node enters the
    // session fully resolved, independent of analyzer rules for custom nodes
    def resolve(p: LogicalPlan, name: String): Expression = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
      require(a.dataType == LongType,
        s"as-of column $name must be LongType, got ${a.dataType}")
      a
    }
    val plan = AsofJoinPlan(
      probePlan, refPlan,
      resolve(probePlan, key), resolve(refPlan, s"ref_$key"),
      resolve(probePlan, time), resolve(refPlan, s"ref_$time"),
      resolve(refPlan, s"ref_$tie"))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
  }
}
