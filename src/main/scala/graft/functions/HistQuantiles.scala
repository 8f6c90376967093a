package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Equi-width histogram quantile sketch as a NATIVE aggregate — the
  * third native sketch beside [[HllDistinct]] and [[KmvDistinct]],
  * twinned with the relational formulation in
  * [[graft.ops.Quantiles.histogramSketch]]/`estimateFromSketch`.
  *
  * BIT-IDENTICAL by construction: the same clamp-to-edge binning, the
  * same first-bin-reaching-q·n selection with the same strict/inclusive
  * boundary pair (`cum ≥ target` and `cum − cnt < target`), the same
  * fixed-order interpolation expression
  * `lo + bin·width + width·(target − prev)/cnt`, the same round-to-4
  * half-up — so the native query shares the frame query's DuckDB
  * oracle. State is nBins longs per group; merge is exact integer
  * vector addition (any merge tree, identical sketch). Error is
  * bounded by the bin width over the declared [lo, hi) domain — the
  * dashboard-percentile tradeoff, stated in the twin's scaladoc.
  */
case class HistQuantiles(
    child: Expression,
    lo: Double, hi: Double, nBins: Int, qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(nBins >= 2 && hi > lo, "need hi > lo and at least 2 bins")
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), "quantiles must be in (0, 1]")
  private val width = (hi - lo) / nBins

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_quantiles requires a DOUBLE column (cast first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // NaN policy: top bin, replicating the frame twin exactly —
      // there `least(greatest(floor(NaN), 0), nBins-1)` resolves to
      // nBins-1 under Spark's NaN-is-largest ordering, while Java's
      // Math.max(NaN, 0).toInt would land it in bin 0 and break the
      // bit-identical/shared-oracle contract on NaN-bearing data
      val bin =
        if (d.isNaN) nBins - 1
        else math.min(math.max(math.floor((d - lo) / width), 0.0), (nBins - 1).toDouble).toInt
      buffer(bin) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer.sum
    val out = qs.map { q =>
      if (n == 0L) null
      else {
        val target = q * n // ≡ q * n_total in the frame expression
        var bin = 0
        var cum = 0L
        var est: Any = null
        while (bin < nBins && est == null) {
          val cnt = buffer(bin)
          cum += cnt
          if (cum >= target && (cum - cnt).toDouble < target) {
            val v = lo + bin * width + width * (target - (cum - cnt)) / cnt
            est = BigDecimal.decimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          bin += 1
        }
        est
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(nBins * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < nBins) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "hist_quantiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantiles =
    copy(child = newChild)
}

object HistQuantiles {
  /** Column API: per-group quantile estimates at `qs`, in order. */
  def histQuantiles(c: Column, lo: Double, hi: Double, nBins: Int, qs: Seq[Double]): Column =
    ColumnBridge.column(
      HistQuantiles(ColumnBridge.expression(c), lo, hi, nBins, qs).toAggregateExpression())

  /** SQL registration triple:
    * `hist_quantiles(v, lo, hi, nBins, q1[, q2, ...])` — every
    * parameter after the column a DOUBLE/INT literal. */
  val sqlFunction: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("hist_quantiles"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[HistQuantiles].getName, "hist_quantiles"),
    (args: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{DoubleType, IntegerType}
      def numLit(e: Expression): Double = e match {
        case Literal(d: Double, DoubleType) => d
        case Literal(i: Int, IntegerType) => i.toDouble
        // SQL decimal literals (`0.9`) arrive as catalyst Decimal
        case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
        case other => throw new IllegalArgumentException(
          s"hist_quantiles parameters must be numeric literals, got $other")
      }
      args match {
        case c +: lo +: hi +: bins +: qs if qs.nonEmpty =>
          HistQuantiles(c, numLit(lo), numLit(hi), numLit(bins).toInt, qs.map(numLit))
        case _ => throw new IllegalArgumentException(
          "hist_quantiles(col, lo, hi, nBins, q1[, q2, ...])")
      }
    })
}
