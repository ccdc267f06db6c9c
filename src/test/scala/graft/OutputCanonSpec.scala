package graft

import org.apache.spark.sql.types._

/** Guard for the OUTPUT SURFACE of every declared query.
  *
  * Round 7 and 8 each lost exactly the queries whose results carried
  * DECIMAL-typed output columns — the arithmetic was bit-exact against
  * the oracle on this host, but the driver's hash gate diverges on
  * non-canonical output types (decimal encoding / scale rendering
  * differs across engine builds). The repo-wide convention is therefore
  * "exact types INTERNALLY (decimal sums, integer ppb), canonical types
  * at the output boundary", and this spec machine-checks it: every
  * entry in [[SparkEntry.queries]] must emit only the six types the
  * entire green history uses — string, long, int, double, boolean,
  * date. A new query that leaks a decimal/float/timestamp/array column
  * fails HERE, in `sbt test`, instead of a round later at the driver.
  *
  * Schema-only: analyzing the plan needs no job, so the sweep over all
  * ~250 queries costs seconds. Queries that materialize scratch inputs
  * during CONSTRUCTION (the A-series write-then-read family, media
  * fixtures) do that work at sf0.001 exactly as Verify would.
  */
class OutputCanonSpec extends SparkSpecBase {

  private val canonical: Set[DataType] =
    Set(StringType, LongType, IntegerType, DoubleType, BooleanType, DateType)

  test("every declared query's output schema uses only canonical types") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sfDir).schema.fields.collect {
          case f if !canonical.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-canonical output columns (cast to string/long/int/double/" +
        s"boolean/date at the output boundary):\n  ${offenders.mkString("\n  ")}")
  }
}
