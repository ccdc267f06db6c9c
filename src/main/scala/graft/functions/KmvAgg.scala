package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.ByteBuffer
import java.util.Arrays

/** SURVEY §2 E-series — KMV (k-minimum-values) distinct-cardinality sketch.
  *
  * Keeps the k smallest DISTINCT hash values seen; the k-th smallest value
  * of a uniform hash estimates the distinct count as (k−1)·M/h_(k) (M = hash
  * range). Unlike HLL the sketch state is plain longs, so the estimate is
  * exactly reproducible by any engine from the same hash — which is what
  * lets the e26 oracle be bit-exact in DuckDB, where approx_count_distinct
  * never could be.
  *
  * 100 TB design: the aggregation buffer is ≤ k longs (k = 64 → 512 B per
  * group), partial-aggregated map-side and merged associatively across
  * executors like any Spark aggregate — distinct-count of a trillion-row
  * column shuffles only n_groups × 512 B. The composed twin (e26) computes
  * the same sketch with DISTINCT + row_number, which shuffles every distinct
  * hash; this aggregate is the scale path (e26b).
  */
case class KmvAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buffer] with UnaryLike[Expression] {

  import KmvAgg.{Buffer, K}

  override def createAggregationBuffer(): Buffer = new Buffer(new Array[Long](K), 0)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.arr(i)); i += 1 }
    b1
  }

  /** Sorted ascending array of the ≤ k smallest distinct hashes. */
  override def eval(buf: Buffer): Any =
    new GenericArrayData(Arrays.copyOfRange(buf.arr, 0, buf.n))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Long](K)
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new Buffer(arr, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv"
}

object KmvAgg {
  /** Sketch size: stderr ≈ 1/√(k−2) ≈ 12.7%. */
  val K = 64

  /** Sorted prefix arr(0 until n); insert keeps the k smallest distinct. */
  final class Buffer(val arr: Array[Long], var n: Int) {
    def insert(h: Long): Unit = {
      val pos = Arrays.binarySearch(arr, 0, n, h)
      if (pos >= 0) return // already present
      val ip = -pos - 1
      if (n < K) {
        System.arraycopy(arr, ip, arr, ip + 1, n - ip)
        arr(ip) = h
        n += 1
      } else if (ip < K) { // smaller than current max: displace it
        System.arraycopy(arr, ip, arr, ip + 1, K - 1 - ip)
        arr(ip) = h
      }
    }
  }

  private val FN = "graft_kmv"

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(new org.apache.spark.sql.catalyst.FunctionIdentifier(FN)))
      reg.createOrReplaceTempFunction(
        FN, exprs => KmvAgg(exprs.head).toAggregateExpression(), "built-in")
  }

  /** Aggregate Column: sorted array of the ≤ k smallest distinct hashes. */
  def kmv(hash: Column): Column = call_function(FN, hash)
}
