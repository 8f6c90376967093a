package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native aggregate: one pass,
  * ≤ k counters per group, with the classic frequent-items GUARANTEE —
  * every item whose true frequency exceeds n/(k+1) of the n observed
  * rows survives in the summary (Misra & Gries 1982; merge step per
  * Agarwal et al., "Mergeable Summaries", PODS 2012: sum counters,
  * then subtract the (k+1)-th largest and drop non-positives, which
  * preserves the error bound across arbitrary merge trees).
  *
  * The OUTPUT (candidate set, its counts, even its size) depends on
  * partitioning and merge order — that is intrinsic to MG, not a flaw
  * — so this function is certified the way production pipelines use
  * it: as the CANDIDATE stage of the two-pass heavy-hitter query. An
  * exact second pass counts only the ≤ k candidates (a broadcast
  * semi-join, never vocabulary-scale) and filters on the exact
  * threshold; the guarantee makes candidates ⊇ true heavy hitters, so
  * the FINAL answer is deterministic and oracle-certifiable
  * (text_heavy_hitters). The guarantee itself is spec-certified
  * directly (SketchAggSpec).
  *
  * 100 TB shape: the first pass shuffles k counters per map task per
  * group (not the vocabulary); the second pass counts a broadcast
  * candidate list. The exact alternative — full groupBy count + global
  * top-k — shuffles every distinct token.
  */
case class TopFreq(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_freq requires a STRING column (cast first), got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  override def update(buffer: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None =>
          if (buffer.size < k) buffer.update(s.clone(), 1L)
          else {
            // decrement-all: drop one occurrence of every tracked item
            // AND the arriving one — the MG accounting step
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            buffer.mapValuesInPlace((_, c) => c - 1)
            buffer.foreach { case (key, c) => if (c <= 0) dead += key }
            dead.foreach(buffer.remove)
          }
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[UTF8String, Long], other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives:
      // the mergeable-summaries contraction
      val counts = buffer.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.mapValuesInPlace((_, c) => c - cut)
      buffer.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any =
    // candidates only, sorted for a stable wire shape; counts are MG
    // lower-bound residuals, deliberately NOT exposed — the two-pass
    // query recounts exactly
    new GenericArrayData(buffer.keysIterator.toArray.sortBy(_.toString).map(identity[Any]))

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    buffer.foreach { case (key, c) =>
      val b = key.getBytes
      dos.writeInt(b.length); dos.write(b); dos.writeLong(c)
    }
    dos.flush(); out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val buf = createAggregationBuffer()
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    while (dis.available() > 0) {
      val n = dis.readInt(); val b = new Array[Byte](n); dis.readFully(b)
      buf.update(UTF8String.fromBytes(b), dis.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_freq"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopFreq =
    copy(child = newChild)
}

object TopFreq {
  /** Column API: candidate heavy hitters of `c` under ≤ k counters. */
  def topFreq(c: Column, k: Int): Column =
    ColumnBridge.column(TopFreq(ColumnBridge.expression(c), k).toAggregateExpression())

  /** SQL registration triple: `top_freq(word, 200)`. */
  val sqlFunction: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("top_freq"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopFreq].getName, "top_freq"),
    (args: Seq[Expression]) => args match {
      case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int,
          org.apache.spark.sql.types.IntegerType)) => TopFreq(c, k)
      case _ => throw new IllegalArgumentException(
        "top_freq(col, k) — k must be an INT literal")
    })
}
