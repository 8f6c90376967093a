package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Position-set aggregation as a BITMAP — the deletion-vector write
  * path's aggregate ([[graft.sources.segment.GraftMaintenance]]):
  * `groupBy(_segment).agg(pos_bitmap(_pos))` folds every matched row's
  * physical ordinal into one bitset per segment.
  *
  * Why not `sort_array(collect_list(pos))`: the list materializes
  * 8 bytes per MATCHED ROW in a single aggregation buffer — a
  * predicate matching ~all of a 100M-row segment builds one
  * multi-hundred-MB array in one executor row before the bitmap even
  * exists (the r9/r10 verdict's standing scale hazard). This
  * aggregate's state is the bitmap itself: bounded by segment ROW
  * COUNT / 8 bytes (12.5 MB for 100M rows) no matter how many rows
  * match, partial aggregation merges map-side (bitmaps OR), and the
  * shuffle ships one bitmap per (map task × touched segment) instead
  * of every position.
  *
  * The buffer grows geometrically to the highest position seen, so a
  * sparse match over a small segment stays small; the word layout is
  * exactly [[graft.sources.segment.DeletionVector]]'s (64 positions
  * per long, little-endian within the word), making [[decode]] a
  * byte-to-long reshape, not a conversion.
  */
case class PosBitmap(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PosBitmap.Bits]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_bitmap requires a BIGINT position column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): PosBitmap.Bits =
    new PosBitmap.Bits(new Array[Long](4))

  override def update(buffer: PosBitmap.Bits, input: InternalRow): PosBitmap.Bits = {
    val v = child.eval(input)
    if (v != null) buffer.set(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: PosBitmap.Bits, other: PosBitmap.Bits): PosBitmap.Bits = {
    buffer.or(other)
    buffer
  }

  /** Trailing zero words trimmed: the emitted bytes are sized by the
    * highest set position, not the growth schedule. */
  override def eval(buffer: PosBitmap.Bits): Any = buffer.toBytes

  override def serialize(buffer: PosBitmap.Bits): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): PosBitmap.Bits =
    new PosBitmap.Bits(PosBitmap.decode(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "pos_bitmap"

  override def withNewMutableAggBufferOffset(newOffset: Int): PosBitmap =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PosBitmap =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PosBitmap =
    copy(child = newChild)
}

object PosBitmap {

  /** Growable bitset over long positions, word-compatible with
    * [[graft.sources.segment.DeletionVector]]. */
  final class Bits(private var words: Array[Long]) {
    def set(pos: Long): Unit = {
      require(pos >= 0 && pos < Int.MaxValue.toLong * 64,
        s"position out of range: $pos")
      val w = (pos >>> 6).toInt
      if (w >= words.length)
        words = java.util.Arrays.copyOf(words,
          math.max(w + 1, math.min(words.length * 2L, Int.MaxValue).toInt))
      words(w) |= 1L << (pos & 63)
    }

    def or(other: Bits): Unit = {
      val ow = other.words
      // grow to the other's TRIMMED extent, not its growth-schedule
      // capacity — merge must not inflate the buffer past need
      var hi = ow.length
      while (hi > 0 && ow(hi - 1) == 0L) hi -= 1
      if (hi > words.length) words = java.util.Arrays.copyOf(words, hi)
      var i = 0
      while (i < hi) { words(i) |= ow(i); i += 1 }
    }

    /** Big-endian 8-byte words, trailing zero words trimmed. */
    def toBytes: Array[Byte] = {
      var hi = words.length
      while (hi > 0 && words(hi - 1) == 0L) hi -= 1
      val bb = java.nio.ByteBuffer.allocate(hi * 8)
      var i = 0
      while (i < hi) { bb.putLong(words(i)); i += 1 }
      bb.array()
    }
  }

  /** Bytes back to the [[graft.sources.segment.DeletionVector]] word
    * array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  /** Column API: `df.groupBy("seg").agg(PosBitmap.posBitmap(col("pos")))`. */
  def posBitmap(c: Column): Column =
    ColumnBridge.column(
      PosBitmap(ColumnBridge.expression(c)).toAggregateExpression())
}
