package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BindReferences, Expression, GreaterThanOrEqual, JoinedRow, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** SURVEY §2 custom-op option (c), full form — a physical operator for the
  * band/interval join Spark genuinely lacks: `stream.v BETWEEN range.lo AND
  * range.hi` with no equi conjunct plans as BroadcastNestedLoopJoin, O(|s|·|r|)
  * per row. This operator broadcasts the (small) range side sorted by `lo`
  * with a running prefix-max of `hi`, and each stream row binary-searches its
  * candidates — O(|s|·log|r| + matches).
  *
  * Wiring: [[BroadcastRangeJoinStrategy]] pattern-matches the logical Join
  * (the strategy-injection extension point via
  * `spark.experimental.extraStrategies`); no custom logical node is needed
  * because the semantics are exactly Join(Inner, band-condition).
  *
  * Scale: the range side must fit in a broadcast (dimension-sized — incident
  * windows, validity intervals, calendar ranges); the stream side is
  * unbounded and never shuffles. For two LARGE sides the composition answer
  * is bucketing both by coarse value buckets first (see SCALE.md).
  */
case class BroadcastRangeJoinExec(
    streamValue: Expression, rangeLo: Expression, rangeHi: Expression,
    ranges: SparkPlan, stream: SparkPlan) extends BinaryExecNode {

  // both sides are planner-visible children; `ranges` is the build side
  override def left: SparkPlan = ranges
  override def right: SparkPlan = stream
  override def output: Seq[Attribute] = ranges.output ++ stream.output

  override protected def doExecute(): RDD[InternalRow] = {
    // build side: collect + sort by lo, precompute prefix-max(hi).
    // Rows with a NULL bound are dropped — SQL band predicates are
    // three-valued, so `v >= NULL` never matches; unboxing null would
    // silently turn it into 0L and fabricate matches.
    val loBound = BindReferences.bindReference(rangeLo, ranges.output)
    val hiBound = BindReferences.bindReference(rangeHi, ranges.output)
    val built = ranges.execute().map(_.copy()).collect()
      .flatMap { r =>
        (loBound.eval(r), hiBound.eval(r)) match {
          case (lo: java.lang.Long, hi: java.lang.Long) =>
            Some((lo.longValue, hi.longValue, r))
          case _ => None // null lo or hi: no stream value can fall in the band
        }
      }
      .sortBy(_._1)
    val prefixMaxHi = built.scanLeft(Long.MinValue) {
      case (m, (_, hi, _)) => math.max(m, hi)
    }.drop(1)
    val bc = session.sparkContext.broadcast((built, prefixMaxHi))

    val vBound = BindReferences.bindReference(streamValue, stream.output)
    val outAttrs = output
    stream.execute().mapPartitions { rows =>
      val (rs, pmax) = bc.value
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      rows.flatMap { row =>
        val vAny = vBound.eval(row)
        if (vAny == null || rs.isEmpty) Iterator.empty
        else {
          val v = vAny.asInstanceOf[Long]
          // last index with lo <= v
          var lo = 0; var hi = rs.length - 1; var last = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (rs(mid)._1 <= v) { last = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (last < 0) Iterator.empty
          else {
            // scan backwards; prefix-max(hi) lets us stop as soon as no
            // earlier range can still cover v
            val buf = Iterator.range(last, -1, -1)
              .takeWhile(i => pmax(i) >= v)
              .filter(i => rs(i)._2 >= v)
              .map(i => toUnsafe(joined(rs(i)._3, row)))
            buf
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(ranges = newLeft, stream = newRight)
}

/** Plans Join(Inner, lo <= v AND v <= hi) — v from one side, lo/hi from the
  * other — as [[BroadcastRangeJoinExec]] with the lo/hi side broadcast.
  * Injected per-session via `spark.experimental.extraStrategies`. */
object BroadcastRangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // The exec unboxes band values as Long, so only claim the join when all
    // three band expressions are LongType; any other band type (Int, Date,
    // Decimal, …) falls through to Spark's own planning (BNLJ) instead of
    // failing with a ClassCastException at runtime.
    case Join(left, right, Inner, Some(And(
        GreaterThanOrEqual(v1, lo), LessThanOrEqual(v2, hi))), _)
        if v1.semanticEquals(v2) &&
          v1.dataType == org.apache.spark.sql.types.LongType &&
          lo.dataType == org.apache.spark.sql.types.LongType &&
          hi.dataType == org.apache.spark.sql.types.LongType &&
          v1.references.subsetOf(right.outputSet) &&
          lo.references.subsetOf(left.outputSet) &&
          hi.references.subsetOf(left.outputSet) =>
      BroadcastRangeJoinExec(v1, lo, hi, planLater(left), planLater(right)) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_ eq BroadcastRangeJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ BroadcastRangeJoinStrategy
  }

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ eq BroadcastRangeJoinStrategy)
}
