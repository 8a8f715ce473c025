package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Element-wise sum of `array<double>` vectors as ONE aggregate buffer.
  *
  * Scale rationale: the per-dimension formulation
  * (`sum(element_at(v, 1)), ..., sum(element_at(v, dim))`) materializes
  * `dim` separate aggregate expressions — fine at dim 64, but a
  * production embedding table (dim 768–3072) turns that into a
  * multi-thousand-node plan that falls out of codegen and grinds the
  * analyzer. This aggregate keeps the plan a single node at ANY
  * dimensionality; the buffer is one primitive double[] with map-side
  * partial aggregation (the shuffle carries one vector per group per
  * task, not the input).
  *
  * Ragged groups follow a DETERMINISTIC drop-don't-fail rule: the result
  * is the element-wise sum of exactly the vectors having the group's
  * MAXIMUM length — a pure function of the group's multiset of vectors,
  * independent of partitioning and merge order (a longer vector resets the
  * buffer, a shorter one is dropped, equal lengths accumulate; merging
  * keeps the longer buffer). SQL-surface callers (`vector_sum(v)`) that
  * want no drops at all group by `size(v)` alongside their key, which
  * makes the drop-path unreachable — ivfTopK's pattern. Empty groups
  * evaluate to NULL.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VectorSum.Buf = new VectorSum.Buf

  override def update(buf: VectorSum.Buf, input: InternalRow): VectorSum.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorSum.Buf, other: VectorSum.Buf): VectorSum.Buf = {
    buf.merge(other)
    buf
  }

  override def eval(buf: VectorSum.Buf): Any =
    if (buf.sums == null) null else ArrayData.toArrayData(buf.sums)

  override def serialize(buf: VectorSum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = if (buf.sums == null) 0 else buf.sums.length
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new VectorSum.Buf
    if (n > 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object VectorSum {
  final class Buf {
    var sums: Array[Double] = _

    // Max-length-wins keeps the result order-independent: any shorter
    // accumulation is discarded the moment a longer vector (or buffer)
    // appears, and shorter inputs never touch a longer buffer — so every
    // update/merge order converges on "sum of the max-length vectors".
    def add(v: ArrayData): Unit = {
      val n = v.numElements()
      if (sums == null || sums.length < n) sums = new Array[Double](n)
      if (sums.length == n) {
        var i = 0
        while (i < n) { sums(i) += v.getDouble(i); i += 1 }
      } // else: shorter than the group max seen so far — dropped (scaladoc)
    }

    def merge(other: Buf): Unit = {
      if (other.sums != null) {
        if (sums == null || sums.length < other.sums.length) sums = other.sums.clone()
        else if (sums.length == other.sums.length) {
          var i = 0
          while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        } // else: other accumulated only shorter-than-max vectors — dropped
      }
    }
  }
}
