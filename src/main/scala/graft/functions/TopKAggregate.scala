package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream

/** Bounded top-k as a custom aggregate: keeps the k (score, id) pairs with
  * the highest score (ties broken toward the smaller id) in a fixed-size
  * heap, and emits them as `array<struct<score:double, id:bigint>>` sorted
  * best-first.
  *
  * Scale rationale: the window-function form of per-group top-k
  * (`row_number() over (partition by g order by score desc)`) must shuffle
  * EVERY candidate row to its group's partition and sort there. As a
  * TypedImperativeAggregate this gets Spark's partial aggregation: each map
  * task reduces its slice to <= k pairs per group before the shuffle, so
  * shuffle volume drops from |candidates| to k * groups * tasks — the
  * difference between a top-5-of-a-billion query shuffling a billion rows
  * and shuffling a few thousand.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Heap] {
  require(k > 0, s"top_k_by_score needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, bigint), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  override def createAggregationBuffer(): TopKByScore.Heap = new TopKByScore.Heap(k)

  override def update(buf: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // NaN scores are unrankable and would poison the heap's comparisons
    // (every `worse` test on NaN is false, freezing eviction); skip them
    // like nulls.
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Heap, other: TopKByScore.Heap): TopKByScore.Heap = {
    other.foreach { case (s, i) => buf.offer(s, i) }
    buf
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByScore.Heap(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKByScore {

  /** Fixed-capacity worst-first binary heap over (score, id) pairs in two
    * primitive arrays — no boxing per element. "Worse" = lower score, or
    * equal score and larger id, so the retained set (and the emitted
    * order) matches `ORDER BY score DESC, id ASC LIMIT k`.
    */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        var c = n
        scores(c) = s; ids(c) = i; n += 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown()
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(): Unit = {
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = 2 * c + 2
        var w = c
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) done = true else { swap(c, w); c = w }
      }
    }

    def foreach(f: ((Double, Long)) => Unit): Unit = {
      var j = 0
      while (j < n) { f((scores(j), ids(j))); j += 1 }
    }

    def sortedBestFirst(): Array[(Double, Long)] = {
      val arr = Array.tabulate(n)(j => (scores(j), ids(j)))
      arr.sortBy { case (s, i) => (-s, i) }
    }
  }
}
