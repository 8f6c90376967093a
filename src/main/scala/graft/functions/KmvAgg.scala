package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}

/** KMV (bottom-k) distinct-count as a NATIVE Catalyst aggregate —
  * [[HllDistinct]]'s sibling over the set-operation sketch of
  * [[graft.ops.Kmv]].
  *
  * BIT-IDENTICAL to the relational formulation by construction: the
  * same md5-derived 32-bit hash over the DISTINCT values (a TreeSet
  * buffer de-duplicates exactly as the frame's `.distinct()` does),
  * the same `n_sk < k → exact` branch, the same
  * `(k−1)·2^32 / h_(k)` estimator as ONE division of exact integers,
  * the same round-to-4 half-up — so the native query shares the frame
  * query's DuckDB oracle verbatim.
  *
  * State is ≤ k longs per group; partial aggregation ships ≤ 8k bytes
  * per group per map task. The frame path pays a corpus-wide
  * `(group, hash)` distinct shuffle before its bounded top-k; this
  * aggregate folds dedup INTO the k-bounded buffer — one pass, no
  * distinct stage, composable beside ordinary aggregates in a single
  * groupBy. The frame keeps the advantages of inspectability and
  * pairwise set operations (Jaccard/intersection need the sketch ROWS);
  * this function serves the scalar-estimate fast path.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k > 1, "KMV needs k > 1 (the estimator divides by the k-th minimum)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a STRING column (cast first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[Long] = new java.util.TreeSet[Long]()

  @transient private lazy val digest = MessageDigest.getInstance("MD5")

  override def update(buffer: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      digest.reset()
      val d = digest.digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      // TreeSet de-duplicates: the sketch is over DISTINCT values
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) { if (buffer.add(h)) buffer.pollLast() }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) { if (buffer.add(h)) buffer.pollLast() }
      else return buffer // `other` iterates ascending: nothing further can enter
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Long]): Any = {
    val n = buffer.size
    val est =
      if (n < k) n.toDouble // the sketch IS the distinct set: exact
      else (k - 1).toDouble * 4294967296.0 / buffer.last()
    BigDecimal.decimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def serialize(buffer: java.util.TreeSet[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(buffer.size * 8)
    val it = buffer.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = createAggregationBuffer()
    val in = java.nio.ByteBuffer.wrap(bytes)
    while (in.remaining() >= 8) buf.add(in.getLong())
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Column API: `df.groupBy(...).agg(KmvDistinct.kmvDistinct(col("word"), 256))`. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(c), k).toAggregateExpression())

  /** SQL registration triple: `kmv_distinct(word)`, `kmv_distinct(word, 1024)`. */
  val sqlFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("kmv_distinct"),
    new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
    (args: Seq[Expression]) => args match {
      case Seq(c) => KmvDistinct(c, 256)
      case Seq(c, Literal(k: Int, IntegerType)) => KmvDistinct(c, k)
      case _ => throw new IllegalArgumentException(
        "kmv_distinct(col[, k]) — k must be an INT literal")
    })
}
