package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot inner loops the built-in
  * higher-order functions (`aggregate`/`zip_with`/`array_intersect`)
  * evaluate with per-element lambda dispatch and boxing. Both participate
  * in whole-stage codegen via `doGenCode` — the generated code is a tight
  * primitive loop over the unsafe array data.
  *
  * Column construction goes through the session function registry +
  * `call_function` (the public Spark 4 route), so [[ArrayExpressions.register]]
  * must run once per session before the wrappers are used; every query
  * entry point in this library does that.
  */
object ArrayExpressions {

  private def checkArrayOf(elem: DataType, children: Seq[Expression], name: String): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(`elem`, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two array<$elem> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  /** |a ∩ b| for two SORTED long arrays (merge walk, no hashing, no
    * boxing). Used by the Jaccard dedup operators on hashed shingle sets.
    */
  case class SortedLongIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_long_intersect_count"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(LongType, children, prettyName)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0
      val nx = x.numElements(); val ny = y.numElements()
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { n += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $i = 0; int $j = 0;
           |${ev.value} = 0;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** a ∩ b MEMBERS for two SORTED long arrays (merge walk) — the
    * element-returning sibling of [[SortedLongIntersectCount]]. Used by
    * the triangle closer (x82): the intersection of two oriented
    * adjacency lists IS the set of triangle apexes over that edge, so
    * returning members lets per-node counts come from one explode of
    * actual triangles instead of materializing and shuffling every wedge.
    * Output is sorted ascending (inputs are), duplicates impossible on
    * set-valued inputs.
    */
  case class SortedLongIntersect(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sorted_long_intersect"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(LongType, children, prettyName)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      val out = new Array[Long](math.min(nx, ny))
      var i = 0; var j = 0; var n = 0
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { out(n) = xv; n += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(out, n))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val buf = ctx.freshName("buf")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $i = 0; int $j = 0; int $n = 0;
           |long[] $buf = new long[Math.min($a.numElements(), $b.numElements())];
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $buf[$n++] = $xv; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  java.util.Arrays.copyOf($buf, $n));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact fixed-point squared L2 distance of two integral double arrays
    * as ONE fused primitive loop, returning bigint — the hot inner
    * kernel of every Lloyd argmin and ADC table build (x91/x98/x107/
    * x108/x113). Replaces the interpreted
    * `cast(aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, +) as
    * bigint)` chain, whose per-element lambda dispatch dominated the PQ
    * rows once K went to the production 256 (the candidate relation is
    * n·NumSub·K rows). Bit-identical to that formulation on the data
    * these operators feed it: operands are integral fixed-point values
    * whose partial sums stay below 2^53, so the double accumulation is
    * exact, and the final truncation matches cast-to-bigint. Unequal
    * lengths return NULL — exactly the replaced chain's semantics
    * (`zip_with` null-pads the shorter array and the product of a NULL
    * pad poisons the aggregate), so a ragged caller gets the same
    * visible NULL, never a silently truncated distance.
    */
  case class FixedPointDist2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "fixed_point_dist2"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(DoubleType, children, prettyName)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        s += d * d
        i += 1
      }
      s.toLong
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $d = $a.getDouble($i) - $b.getDouble($i);
           |    $s += $d * $d;
           |  }
           |  ${ev.value} = (long) $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Cosine similarity of two double arrays in one fused primitive loop
    * (dot, |a|², |b|² in a single pass). NaN on zero-norm input, like the
    * mathematical definition's 0/0.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(DoubleType, children, prettyName)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Full MinHash signature in ONE pass: for an array of 64-bit shingle
    * hashes, computes `numPerms` permuted minima `min_x (a_i·x + b_i) mod p`
    * with p = 2^31−1 and deterministic splitmix-derived coefficients.
    * Replaces `numPerms` separate `array_min(transform(...))` columns
    * (interpreted lambda per element per perm) with a fused primitive loop.
    */
  case class MinHashSignature(child: Expression, numPerms: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(LongType, children, prettyName)

    private val p = MinHash.P
    private lazy val coefA: Array[Long] = Array.tabulate(numPerms)(MinHash.coefA)
    private lazy val coefB: Array[Long] = Array.tabulate(numPerms)(MinHash.coefB)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = Array.fill(numPerms)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = { val m = arr.getLong(i) % p; if (m < 0) m + p else m }
        var j = 0
        while (j < numPerms) {
          val v = (coefA(j) * h + coefB(j)) % p
          if (v < out(j)) out(j) = v
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
      val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
      nullSafeCodeGen(ctx, ev, c => {
        val out = ctx.freshName("out"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
        s"""
           |long[] $out = new long[$numPerms];
           |java.util.Arrays.fill($out, Long.MAX_VALUE);
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  long $h = $c.getLong($i) % ${p}L; if ($h < 0) $h += ${p}L;
           |  for (int $j = 0; $j < $numPerms; $j++) {
           |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
           |    if ($v < $out[$j]) $out[$j] = $v;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** splitmix64 finalizer — a bijection on Long (every step is
    * invertible), shared by the hashing expressions below.
    */
  def mix64(v: Long): Long = {
    var x = v
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Sorted distinct 64-bit hashes of the character n-grams of a string,
    * in ONE fused pass — replaces the
    * `array_sort(array_distinct(transform(sequence(...), i ->
    * xxhash64(substring(...)))))` chain, which allocates one UTF8String per
    * shingle and pays lambda dispatch per element.
    *
    * Shingles are CODE POINTS (like Spark's `substring`/`length` and
    * DuckDB's string functions), not UTF-16 units — a surrogate pair is
    * one character. For n <= 3 the hash is INJECTIVE: n code points
    * (21 bits each) pack losslessly into one long and the [[mix64]]
    * finalizer is a bijection, so distinct-shingle counts and pairwise
    * intersection counts are EXACTLY the string-set values (no collision
    * probability at all) — the Jaccard numbers oracle-match DuckDB's
    * string-list computation by construction.
    */
  case class ShingleHashesSorted(child: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(n >= 1 && n <= 3, s"shingle_hashes_sorted supports 1 <= n <= 3, got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes_sorted"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    /** JVM-side kernel; also the target of the generated code. */
    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val cps = s.toString.codePoints().toArray
      val m = cps.length - n + 1
      if (m <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var packed = 0L
        var j = 0
        while (j < n) {
          packed |= (cps(i + j).toLong & 0x1fffffL) << (21 * j)
          j += 1
        }
        out(i) = mix64(packed)
        i += 1
      }
      java.util.Arrays.sort(out)
      var w = 1
      var k = 1
      while (k < m) {
        if (out(k) != out(k - 1)) { out(w) = out(k); w += 1 }
        k += 1
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(out, w))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // The kernel does real per-row work (hash + sort of ~len longs), so
      // generated code just calls it — keeps the stage inside whole-stage
      // codegen without inlining the loop.
      val self = ctx.addReferenceObj("shingler", this, classOf[ShingleHashesSorted].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a token array in one fused pass: each token is
    * hashed ONCE (FNV-1a over its UTF-8 bytes + [[mix64]] finalizer), its
    * bits vote ±1 per position, and the sign vector collapses to the
    * fingerprint. Replaces the higher-order-function formulation that
    * re-hashed every token once per bit (64x the hashing) under
    * interpreted lambda dispatch.
    */
  case class SimHash64(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.simpleString}")
      }

    def compute(arr: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val bytes = arr.getUTF8String(i).getBytes
          var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
          var k = 0
          while (k < bytes.length) {
            h = (h ^ (bytes(k) & 0xffL)) * 0x100000001b3L
            k += 1
          }
          h = mix64(h)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) > 0) fp |= 1L << j
        j += 1
      }
      fp
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("simhasher", this, classOf[SimHash64].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit perceptual average-hash (aHash) of a binary payload — the
    * image-dedup fingerprint, computed the way a real pipeline does after
    * decode-to-grayscale: a 64-sample strided "thumbnail" of the bytes
    * (sample i reads byte ⌊i·n/64⌋, the classic strided-downsample
    * arithmetic), thresholded at the thumbnail mean (bit i set iff
    * 64·v_i > Σv, strict — integer-exact, so the whole hash replays in
    * SQL), packed MSB-first. ONE pass over the payload in whole-stage
    * codegen; on real media the byte stream would be the decoded
    * luminance plane and nothing else changes. Empty payload → 0L.
    */
  case class AHash64(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "ahash64"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects binary, got ${other.simpleString}")
      }

    def compute(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) return 0L
      val v = new Array[Int](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        // long index arithmetic: i*n overflows int for multi-GB payloads
        v(i) = bytes(((i.toLong * n) / 64).toInt) & 0xff
        sum += v(i)
        i += 1
      }
      var fp = 0L
      i = 0
      while (i < 64) {
        if (v(i) * 64L > sum) fp |= 1L << (63 - i)
        i += 1
      }
      fp
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("ahasher", this, classOf[AHash64].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** nBits-bit random-hyperplane bucket of a double vector (sign SimHash):
    * bit b is set iff Σ_i v[i]·sign(b,i) > 0, with sign(b,i) ∈ {−1,+1}
    * derived from a splitmix-style hash of (b,i). ONE expression node
    * regardless of dimensionality — the per-dimension Column formulation
    * (`element_at(v,i)·sign` summed) builds dim × nBits plan nodes, which
    * at production embedding dims (768–3072) is a 100k-node plan and a
    * codegen fallback. The (b,i) index uses a 2^20 stride so hyperplane
    * components stay independent up to dim 1,048,576; longer vectors are
    * REJECTED (compute throws) rather than silently aliasing components
    * across bits, which would quietly degrade LSH independence.
    *
    * The projection runs over the vector's OWN length, so ragged rows never
    * abort (ANSI-safe by construction); callers that require a uniform dim
    * add `size(v) = dim` to their join/filter.
    */
  case class HyperplaneBucket(child: Expression, nBits: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(nBits >= 1 && nBits <= 64, s"hyperplane_bucket needs 1 <= nBits <= 64, got $nBits")
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_bucket"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(DoubleType, children, prettyName)

    def compute(v: ArrayData): Long = {
      val n = v.numElements()
      if (n > (1 << 20)) throw new IllegalArgumentException(
        s"hyperplane_bucket supports vectors up to ${1 << 20} elements " +
          s"(the (bit, index) stride); got $n — components would alias across bits")
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        val base = b.toLong << 20
        var proj = 0.0
        var i = 0
        while (i < n) {
          var x = 0x9E3779B97F4A7C15L * (base + i + 1)
          x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
          val sign = if (((x ^ (x >>> 27)) & 1L) == 0L) -1.0 else 1.0
          proj += v.getDouble(i) * sign
          i += 1
        }
        if (proj > 0) bucket |= 1L << b
        b += 1
      }
      bucket
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("hyperplaner", this, classOf[HyperplaneBucket].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-lexicon exact-token hit counts in ONE pass over the raw string:
    * tokenizes on `\s+` runs (the same ASCII whitespace class Java regex
    * `\s` and the split-based operators use) and counts tokens exactly
    * equal to each lexicon's words, returning `array<int>` with one count
    * per lexicon. Replaces `size(filter(split(text,'\\s+'), t ->
    * t.isin(...)))` × nLexicons — a regex split allocating a token array
    * plus interpreted HOF lambda dispatch per token per lexicon.
    */
  case class LexiconHits(child: Expression, lexicons: Seq[Seq[String]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    // the word->lexicon map packs lexicon membership into an Int bitmask;
    // index 32 would alias index 0 (Java shifts are mod 32)
    require(lexicons.length <= 32, s"lexicon_hits supports at most 32 lexicons, got ${lexicons.length}")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "lexicon_hits"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    // word -> bitmask of lexicon indices containing it (a word may appear
    // in several lexicons, e.g. "la"/"que" in both es and fr)
    @transient private lazy val wordMask: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      lexicons.zipWithIndex.foreach { case (words, li) =>
        words.foreach { w =>
          val prev = m.get(w)
          m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << li)))
        }
      }
      m
    }

    private def isWs(c: Char): Boolean = // Java regex \s: [ \t\n\x0B\f\r]
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val counts = new Array[Int](lexicons.length)
      val str = s.toString
      val n = str.length
      var i = 0
      while (i < n) {
        while (i < n && isWs(str.charAt(i))) i += 1
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        if (i > start) {
          val mask = wordMask.get(str.substring(start, i))
          if (mask != null) {
            var m = mask.intValue()
            while (m != 0) {
              val li = java.lang.Integer.numberOfTrailingZeros(m)
              counts(li) += 1
              m &= m - 1
            }
          }
        }
      }
      ArrayData.toArrayData(counts)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("lexicons", this, classOf[LexiconHits].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** md5 hex of the concatenation of the SORTED DISTINCT character
    * n-gram shingles of a string — the whole
    * `md5(concat_ws('', array_sort(array_distinct(transform(sequence(...),
    * substring)))))` chain in one kernel, with no per-shingle Column
    * machinery, no UTF8String churn through four HOF lambdas, and the
    * digest fed incrementally (the concatenated shingle string is never
    * materialized). Semantics pinned to the SQL form: shingles are CODE
    * POINTS (Spark substring semantics), dedup is exact string equality,
    * and the sort is code-point order — the same order `array_sort` gives
    * strings (UTF-8 binary order preserves code-point order), NOT
    * String.compareTo's UTF-16 order, which diverges for supplementary
    * characters.
    */
  case class DocFingerprint(child: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(n >= 1, s"doc_fingerprint needs n >= 1, got $n")
    override def dataType: DataType = StringType
    override def prettyName: String = "doc_fingerprint"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    private def codePointCompare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }

    def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
      val str = s.toString
      val cps = str.codePoints().toArray
      val m = cps.length - n + 1
      val set = new java.util.TreeSet[String]((a: String, b: String) => codePointCompare(a, b))
      var i = 0
      while (i < m) {
        set.add(new String(cps, i, n))
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val it = set.iterator()
      while (it.hasNext) md.update(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val digest = md.digest()
      val hex = new StringBuilder(32)
      digest.foreach(b => hex.append(f"${b & 0xff}%02x"))
      org.apache.spark.unsafe.types.UTF8String.fromString(hex.toString)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("fingerprinter", this, classOf[DocFingerprint].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Content-defined chunks of a string's UTF-8 bytes via a Gear rolling
    * hash: `array<struct<len:int, hash:bigint>>`, one pass. A boundary
    * cuts where the rolling hash's HIGH `avgBits` bits are zero (expected
    * chunk size ≈ minSize + 2^avgBits) once `minSize` bytes have
    * accumulated; `maxSize` forces a cut. High bits, not low: with
    * `h = (h << 1) + gear(b)`, bit k only sees the last k+1 bytes, so a
    * low-bits test degenerates to ~avgBits bytes of context and collapses
    * on periodic/low-entropy text (the original-Gear weakness FastCDC's
    * spread masks address); the top bits aggregate the full 64-byte
    * window. The gear table derives from [[mix64]], so boundaries are
    * deterministic and depend only on those 64 bytes of context — the CDC
    * locality property (edits move only the chunks they touch) that makes
    * chunk-hash dedup work. Chunk hash = FNV-1a over the chunk's bytes +
    * mix64 finalizer.
    */
  case class CdcChunks(child: Expression, minSize: Int, avgBits: Int, maxSize: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(minSize >= 1 && avgBits >= 1 && avgBits <= 28 && maxSize >= minSize,
      s"cdc_chunks: need 1 <= minSize <= maxSize and 1 <= avgBits <= 28")
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("len", IntegerType, nullable = false),
        StructField("hash", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "cdc_chunks"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    // boundary iff the top avgBits bits of the rolling hash are zero
    private val shift: Int = 64 - avgBits

    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val bytes = s.getBytes
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var start = 0
      var h = 0L
      var fnv = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        h = (h << 1) + CdcChunks.gear(b)
        fnv = (fnv ^ b) * 0x100000001b3L
        i += 1
        val len = i - start
        if ((len >= minSize && (h >>> shift) == 0L) || len >= maxSize) {
          out += InternalRow(len, mix64(fnv))
          start = i; h = 0L; fnv = 0xcbf29ce484222325L
        }
      }
      if (i > start) out += InternalRow(i - start, mix64(fnv))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("chunker", this, classOf[CdcChunks].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  object CdcChunks {
    /** Deterministic gear table shared by every instance. */
    private[functions] val gear: Array[Long] =
      Array.tabulate(256)(i => mix64(0x6763647F5AB1E92DL + i))
  }

  /** DEFLATE compression ratio of a string's UTF-8 bytes (compressed /
    * raw, ~0.05..1.2): the classic cheap junk detector for training-data
    * curation — highly repetitive or templated text compresses far below
    * natural prose, random noise compresses above it. BEST_SPEED keeps the
    * kernel ~100 MB/s/core; deterministic for a given JVM's zlib.
    */
  case class DeflateRatio(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "deflate_ratio"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    def compute(s: org.apache.spark.unsafe.types.UTF8String): Double = {
      val bytes = s.getBytes
      if (bytes.isEmpty) return 1.0
      // one native zlib stream per executor thread, reset per row —
      // per-row Deflater construction pays JNI stream init/free that
      // dominates on short documents
      val d = DeflateRatio.local.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("deflater", this, classOf[DeflateRatio].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  object DeflateRatio {
    private[functions] val local: ThreadLocal[java.util.zip.Deflater] =
      ThreadLocal.withInitial(() =>
        new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED))
  }

  /** Single-pass per-document character statistics for quality scoring:
    * code-point count, distinct code points, the highest single-character
    * count, and the collision sum Σc² — the exact-integer ingredients of
    * Simpson diversity (1 − Σc²/n²) and top-character fraction, returned
    * as `array<long>` `[n, distinct, max_count, collision_sum]`. The
    * derived double scores are then SINGLE IEEE divisions of exact
    * integers — bit-identical in any engine — unlike a Shannon-entropy
    * term, whose `log` is not bit-specified across math libraries and
    * could never hash-match a foreign oracle. Replaces the naive
    * `explode(chars) + groupBy(doc_id, char)` form, which shuffles one
    * row PER CHARACTER (a ~5000× row blow-up at corpus scale): this is a
    * per-row kernel — one pass over the scan, zero exchanges.
    */
  case class CharDiversity(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "char_diversity"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val str = s.toString
      val counts = new java.util.HashMap[Integer, Array[Long]]()
      var n = 0L
      var i = 0
      val len = str.length
      while (i < len) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        n += 1
        val slot = counts.get(Integer.valueOf(cp))
        if (slot == null) counts.put(Integer.valueOf(cp), Array(1L)) else slot(0) += 1
      }
      var maxc = 0L
      var sumSq = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > maxc) maxc = c
        sumSq += c * c
      }
      ArrayData.toArrayData(Array(n, counts.size().toLong, maxc, sumSq))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("charDiversity", this, classOf[CharDiversity].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Unicode normalization (`java.text.Normalizer`) as a codegen scalar:
    * NFC/NFD/NFKC/NFKD selected by a literal form name, validated at
    * plan time (an unknown form is an analysis error, not a per-row
    * throw). The canonical ingest step before any byte-equality dedup —
    * `"é"` precomposed and `"e"+U+0301` decomposed are the SAME text but
    * different bytes, so un-normalized corpora silently miss duplicates.
    */
  case class UnicodeNormalize(child: Expression, form: String)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unicode_normalize form must be one of NFC/NFD/NFKC/NFKD, got $form")
    @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
      val str = s.toString
      // fast path: Normalizer.isNormalized is a cheap scan, and real
      // corpora are overwhelmingly already-NFC — skip the rewrite
      if (java.text.Normalizer.isNormalized(str, normForm)) s
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(str, normForm))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("normalizer", this, classOf[UnicodeNormalize].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Accent stripping: NFD-decompose, drop combining marks (Unicode
    * category Mn), NFC-recompose — `"é" → "e"`, the transliteration step
    * search/dedup pipelines run before comparing text across sources.
    */
  case class StripAccents(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "strip_accents"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string argument, got ${other.simpleString}")
      }

    def compute(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
      val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("stripper", this, classOf[StripAccents].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** JPEG dimension extraction via a real SOF-marker segment walk — the
    * genuine codec path of the multimodal family (PNG/BMP/WAV headers sit
    * at fixed offsets; JPEG's frame header floats behind a variable-length
    * segment chain, so parsing it REQUIRES walking the container format:
    * SOI, then per segment `FF` + marker + big-endian u16 length, skipping
    * fill bytes and length-less standalone markers (TEM, RST0-7), until a
    * start-of-frame marker — any SOF0-15 except the DHT/JPG/DAC holes
    * C4/C8/CC — whose payload carries precision(1), height(2 BE),
    * width(2 BE). Returns NULL (never throws) on non-JPEG magic,
    * truncation mid-walk, a corrupt segment chain, or SOS/EOI reached
    * before any SOF — the wrong-format-safe contract a billion-blob
    * ingest needs. Entropy-coded scan payloads are never touched: the
    * walk ends at the SOF, bytes after it are irrelevant.
    */
  case class JpegSofDim(child: Expression, isWidth: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = if (isWidth) "jpeg_width" else "jpeg_height"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary argument, got ${other.simpleString}")
      }

    /** The walk; -1 encodes SQL NULL (dimensions are u16, never negative). */
    def compute(b: Array[Byte]): Long = {
      val n = b.length
      @inline def u8(i: Int): Int = b(i) & 0xFF
      if (n < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return -1L
      var pos = 2
      while (pos + 1 < n) {
        if (u8(pos) != 0xFF) return -1L // lost sync: not a marker boundary
        // fill bytes: any number of 0xFF may pad before the marker code
        var m = u8(pos + 1)
        while (m == 0xFF && pos + 2 < n) { pos += 1; m = u8(pos + 1) }
        if (m == 0xFF) return -1L // truncated inside padding
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7) || m == 0xD8) pos += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return -1L // EOI/SOS before any SOF
        else {
          if (pos + 3 >= n) return -1L
          val segLen = (u8(pos + 2) << 8) | u8(pos + 3)
          if (segLen < 2) return -1L
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (segLen < 7 || pos + 8 >= n) return -1L // SOF too short for dims
            return if (isWidth) ((u8(pos + 7) << 8) | u8(pos + 8)).toLong
            else ((u8(pos + 5) << 8) | u8(pos + 6)).toLong
          }
          pos += 2 + segLen
        }
      }
      -1L
    }

    override def nullSafeEval(input: Any): Any = {
      val r = compute(input.asInstanceOf[Array[Byte]])
      if (r < 0L) null else java.lang.Long.valueOf(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("jpegSof", this, classOf[JpegSofDim].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        long r = $self.compute($c);
        if (r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = r; }
      """)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** SQL-side read access to a serialized Count-Min sketch:
    * `cms_estimate(sketch_bytes, token)` returns the sketch's frequency
    * estimate for the token — the read half Spark's own `count_min_sketch`
    * aggregate lacks (it ships an opaque binary with no SQL accessor, so
    * every consumer previously had to collect the sketch to the driver
    * and probe it there). With this, the 1-row sketch relation joins back
    * as a broadcast literal and the whole heavy-hitters pipeline stays in
    * the plan. The deserialized sketch is memoized per expression instance
    * keyed on the byte payload (each probed row arrives with its own copy
    * of the broadcast bytes; an `Arrays.equals` check is a memcmp, ~100×
    * cheaper than re-parsing the ~1 MB counter table per row).
    */
  case class CmsEstimate(sketch: Expression, item: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def left: Expression = sketch
    override def right: Expression = item
    override def dataType: DataType = LongType
    // NULL on bytes that are not a serialized sketch (never a throw) —
    // the same wrong-format-safe posture as the media parsers
    override def nullable: Boolean = true
    override def prettyName: String = "cms_estimate"
    override def checkInputDataTypes(): TypeCheckResult =
      (sketch.dataType, item.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary sketch, string item), got $other")
      }

    @transient private var memoBytes: Array[Byte] = _
    @transient private var memoSketch: org.apache.spark.util.sketch.CountMinSketch = _

    /** -1 encodes SQL NULL (a real estimate is a count, never negative). */
    def compute(bytes: Array[Byte], tok: org.apache.spark.unsafe.types.UTF8String): Long = {
      if (memoSketch == null || !java.util.Arrays.equals(memoBytes, bytes)) {
        memoSketch =
          try org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException | _: RuntimeException => null }
        memoBytes = bytes
        if (memoSketch == null) return -1L
      }
      memoSketch.estimateCount(tok.getBytes)
    }

    override def nullSafeEval(sk: Any, it: Any): Any = {
      val r = compute(sk.asInstanceOf[Array[Byte]],
        it.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      if (r < 0L) null else java.lang.Long.valueOf(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        long r = $self.compute($a, $b);
        if (r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = r; }
      """)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(sketch = l, item = r)
  }

  /** WAV/PCM audio decode via a real RIFF chunk walk: locate the `fmt `
    * and `data` chunks (any number of other chunks — LIST/INFO/cue —
    * may precede them, and RIFF pads odd-sized chunks to even, so the
    * walk is genuinely format-driven, not fixed-offset), require
    * 16-bit integer PCM, then decode every little-endian signed sample
    * and return the five order-independent integers a corpus audio
    * pass needs: `[n_samples, sum, sum_of_squares, min, max]` (RMS and
    * peak level derive from these; the integers stay exact under any
    * aggregation order, so corpus rollups remain oracle-checkable).
    * PCM IS the decode for WAV — the samples are the signal — making
    * this the audio sibling of the x79 image path. NULL (never a
    * throw) on non-RIFF magic, truncation mid-chunk, a missing/short
    * `fmt `/`data` chunk, or non-16-bit-PCM encodings.
    */
  case class WavPcmStats(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "wav_pcm_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary argument, got ${other.simpleString}")
      }

    def compute(b: Array[Byte]): ArrayData = {
      val n = b.length
      @inline def u8(i: Int): Int = b(i) & 0xFF
      @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      @inline def le32(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      @inline def tag(i: Int, t: String): Boolean =
        u8(i) == t.charAt(0) && u8(i + 1) == t.charAt(1) &&
          u8(i + 2) == t.charAt(2) && u8(i + 3) == t.charAt(3)
      if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
      var pos = 12
      var fmtOk = false
      while (pos + 8 <= n) {
        val size = le32(pos + 4)
        if (size < 0 || size > Int.MaxValue) return null
        val body = pos + 8
        if (tag(pos, "fmt ")) {
          if (size < 16 || body + 16 > n) return null
          // audioFormat(2) channels(2) rate(4) byteRate(4) align(2) bits(2)
          fmtOk = le16(body) == 1 && le16(body + 14) == 16
        } else if (tag(pos, "data")) {
          if (!fmtOk) return null // fmt must precede data (and be 16-bit PCM)
          val end = body + size.toInt
          if (end > n) return null // truncated payload
          var i = body
          var cnt = 0L; var sum = 0L; var sumSq = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          while (i + 1 < end) {
            val s = le16(i).toShort.toLong // sign-extend the LE sample
            cnt += 1; sum += s; sumSq += s * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            i += 2
          }
          if (cnt == 0L) return null
          return ArrayData.toArrayData(Array(cnt, sum, sumSq, mn, mx))
        }
        pos = body + size.toInt + (size.toInt & 1) // RIFF pads chunks to even
      }
      null
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("wavPcm", this, classOf[WavPcmStats].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $self.compute($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MJPEG (concatenated-JPEG video stream) demux: walk every frame —
    * SOI, segment chain to the SOF (dims) and the SOS, then the entropy
    * scan honouring JPEG's byte-stuffing (`FF 00` is a literal data
    * byte, not a marker) and restart markers (`FF D0-D7` continue the
    * scan) until the frame's EOI — and return
    * `[n_frames, first_w, first_h, last_w, last_h]`. This is the real
    * work of a video-ingest demuxer for the one video format whose
    * frames are independently decodable; frame COUNT and per-frame
    * dimensions cannot be read without correctly scanning the entropy
    * stream of every preceding frame, so a parser that mishandles
    * stuffing or restart markers gets the count wrong. NULL (never a
    * throw) on anything malformed: missing SOI, SOS before SOF,
    * truncation mid-segment or mid-scan, an invalid marker inside
    * entropy data, or trailing garbage after the last EOI.
    */
  case class MjpegStats(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "mjpeg_stats"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a binary argument, got ${other.simpleString}")
      }

    def compute(b: Array[Byte]): ArrayData = {
      val n = b.length
      @inline def u8(i: Int): Int = b(i) & 0xFF
      var pos = 0
      var frames = 0L
      var fw = -1L; var fh = -1L; var lw = -1L; var lh = -1L
      while (pos < n) {
        if (pos + 1 >= n || u8(pos) != 0xFF || u8(pos + 1) != 0xD8) return null // no SOI
        pos += 2
        var w = -1L; var h = -1L
        var inFrame = true
        while (inFrame) {
          if (pos + 1 >= n || u8(pos) != 0xFF) return null
          var m = u8(pos + 1)
          while (m == 0xFF && pos + 2 < n) { pos += 1; m = u8(pos + 1) } // fill bytes
          if (m == 0xFF) return null
          if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) pos += 2 // standalone
          else if (m == 0xD8 || m == 0xD9) return null // nested SOI / EOI before SOS
          else if (m == 0xDA) { // SOS: skip header, scan entropy to EOI
            if (w < 0) return null // SOS before any SOF
            if (pos + 3 >= n) return null
            val segLen = (u8(pos + 2) << 8) | u8(pos + 3)
            if (segLen < 2) return null
            var i = pos + 2 + segLen
            var scanning = true
            while (scanning) {
              if (i >= n) return null // truncated mid-scan
              if (u8(i) == 0xFF) {
                if (i + 1 >= n) return null
                val nm = u8(i + 1)
                if (nm == 0x00 || (nm >= 0xD0 && nm <= 0xD7)) i += 2 // stuffed / restart
                else if (nm == 0xD9) { pos = i + 2; scanning = false } // EOI
                else return null // any other marker inside a scan is corrupt
              } else i += 1
            }
            frames += 1
            if (frames == 1L) { fw = w; fh = h }
            lw = w; lh = h
            inFrame = false
          } else { // length-carrying segment; SOF records dims
            if (pos + 3 >= n) return null
            val segLen = (u8(pos + 2) << 8) | u8(pos + 3)
            if (segLen < 2) return null
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
              if (segLen < 7 || pos + 8 >= n) return null
              h = ((u8(pos + 5) << 8) | u8(pos + 6)).toLong
              w = ((u8(pos + 7) << 8) | u8(pos + 8)).toLong
            }
            pos += 2 + segLen
          }
        }
      }
      if (frames == 0L) null
      else ArrayData.toArrayData(Array(frames, fw, fh, lw, lh))
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("mjpeg", this, classOf[MjpegStats].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $self.compute($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Shared deterministic coefficient scheme for MinHash permutations. */
  object MinHash {
    /** 2^31−1 (Mersenne prime): a·h+b stays within Long under ANSI. */
    val P = 2147483647L
    private def mix(seed: Long, i: Int): Long =
      math.abs(mix64(seed + 0x9E3779B97F4A7C15L * (i + 1))) % (P - 1) + 1
    def coefA(i: Int): Long = mix(42L, i)
    def coefB(i: Int): Long = mix(4242L, i)
  }

  /** Idempotently register the functions in THIS session's registry (temp
    * functions — session-scoped, no catalog pollution). Query builders
    * invoke this on every construction; short-circuits per session.
    */
  private def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()

  private def strArg(e: Expression, funcName: String, paramName: String): String = {
    // fail at analysis with Spark's standard readable errors, not an
    // opaque eval NPE/ClassCastException from a column ref or NULL
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> ("`" + funcName + "`"), "paramName" -> ("`" + paramName + "`"),
          "paramType" -> "\"STRING\""))
    val v = e.eval()
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException(
        "INVALID_PARAMETER_VALUE.NULL",
        Map("parameter" -> ("`" + paramName + "`"), "functionName" -> ("`" + funcName + "`")))
    v.toString
  }

  /** The ONE list of (name, implementing class, builder) triples — both
    * registration paths ([[register]] temp functions and
    * [[graft.GraftExtensions]] injection) consume it, so a new expression
    * added here is automatically visible on both surfaces (the two paths
    * had already drifted apart once when they were maintained by hand).
    *
    * Every builder validates its arity up front and raises Spark's
    * standard WRONG_NUM_ARGS analysis error — a wrong-arity SQL call
    * (`minhash_signature(x)`, `lexicon_hits(x, extra)`) must fail like a
    * misused built-in, not with an IndexOutOfBounds from inside the
    * builder or by silently ignoring extra arguments.
    */
  private def entry(name: String, clazz: String, arity: Int)(
      build: Seq[Expression] => Expression): (String, String, Seq[Expression] => Expression) =
    (name, clazz, es => {
      if (es.length != arity)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map(
            "functionName" -> ("`" + name + "`"),
            "expectedNum" -> arity.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    })

  val functionBuilders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    entry("sorted_long_intersect_count", classOf[SortedLongIntersectCount].getName, 2)(
      es => SortedLongIntersectCount(es.head, es(1))),
    entry("sorted_long_intersect", classOf[SortedLongIntersect].getName, 2)(
      es => SortedLongIntersect(es.head, es(1))),
    entry("cosine_similarity", classOf[CosineSimilarity].getName, 2)(
      es => CosineSimilarity(es.head, es(1))),
    entry("fixed_point_dist2", classOf[FixedPointDist2].getName, 2)(
      es => FixedPointDist2(es.head, es(1))),
    entry("minhash_signature", classOf[MinHashSignature].getName, 2)(
      es => MinHashSignature(es.head, intArg(es(1)))),
    entry("shingle_hashes_sorted", classOf[ShingleHashesSorted].getName, 2)(
      es => ShingleHashesSorted(es.head, intArg(es(1)))),
    entry("top_k_by_score", classOf[TopKByScore].getName, 3)(
      es => TopKByScore(es.head, es(1), intArg(es(2)))),
    entry("deflate_ratio", classOf[DeflateRatio].getName, 1)(es => DeflateRatio(es.head)),
    entry("simhash64", classOf[SimHash64].getName, 1)(es => SimHash64(es.head)),
    entry("ahash64", classOf[AHash64].getName, 1)(es => AHash64(es.head)),
    entry("hyperplane_bucket", classOf[HyperplaneBucket].getName, 2)(
      es => HyperplaneBucket(es.head, intArg(es(1)))),
    entry("vector_sum", classOf[VectorSum].getName, 1)(es => VectorSum(es.head)),
    entry("cdc_chunks", classOf[CdcChunks].getName, 4)(
      es => CdcChunks(es.head, intArg(es(1)), intArg(es(2)), intArg(es(3)))),
    entry("doc_fingerprint", classOf[DocFingerprint].getName, 2)(
      es => DocFingerprint(es.head, intArg(es(1)))),
    entry("lexicon_hits", classOf[LexiconHits].getName, 1)(
      es => LexiconHits(es.head,
        graft.operators.TextAnalysis.LexiconOrder.map(
          graft.operators.TextAnalysis.Lexicons))),
    entry("char_diversity", classOf[CharDiversity].getName, 1)(
      es => CharDiversity(es.head)),
    entry("unicode_normalize", classOf[UnicodeNormalize].getName, 2)(
      es => UnicodeNormalize(es.head, strArg(es(1), "unicode_normalize", "form"))),
    entry("strip_accents", classOf[StripAccents].getName, 1)(
      es => StripAccents(es.head)),
    entry("jpeg_width", classOf[JpegSofDim].getName, 1)(
      es => JpegSofDim(es.head, isWidth = true)),
    entry("jpeg_height", classOf[JpegSofDim].getName, 1)(
      es => JpegSofDim(es.head, isWidth = false)),
    entry("cms_estimate", classOf[CmsEstimate].getName, 2)(
      es => CmsEstimate(es.head, es(1))),
    entry("wav_pcm_stats", classOf[WavPcmStats].getName, 1)(
      es => WavPcmStats(es.head)),
    entry("mjpeg_stats", classOf[MjpegStats].getName, 1)(
      es => MjpegStats(es.head)))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_signature"))) return
    functionBuilders.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Column wrappers (require [[register]] on the active session). */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    call_function("sorted_long_intersect_count", a, b)

  /** Intersection MEMBERS of two sorted long arrays ([[SortedLongIntersect]]). */
  def sortedLongIntersect(a: Column, b: Column): Column =
    call_function("sorted_long_intersect", a, b)

  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Exact fixed-point squared L2 distance as bigint ([[FixedPointDist2]]). */
  def fixedPointDist2(a: Column, b: Column): Column =
    call_function("fixed_point_dist2", a, b)

  def minhashSignature(hashes: Column, numPerms: Int): Column =
    call_function("minhash_signature", hashes, org.apache.spark.sql.functions.lit(numPerms))

  def jpegWidth(payload: Column): Column = call_function("jpeg_width", payload)

  def jpegHeight(payload: Column): Column = call_function("jpeg_height", payload)

  def cmsEstimate(sketch: Column, item: Column): Column =
    call_function("cms_estimate", sketch, item)

  def wavPcmStats(payload: Column): Column = call_function("wav_pcm_stats", payload)

  def mjpegStats(payload: Column): Column = call_function("mjpeg_stats", payload)

  def shingleHashesSorted(text: Column, n: Int): Column =
    call_function("shingle_hashes_sorted", text, org.apache.spark.sql.functions.lit(n))

  /** Bounded-heap top-k aggregate ([[TopKByScore]]); use under groupBy. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    call_function("top_k_by_score", score, id, org.apache.spark.sql.functions.lit(k))

  def deflateRatio(text: Column): Column = call_function("deflate_ratio", text)

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  def ahash64(payload: Column): Column = call_function("ahash64", payload)

  def hyperplaneBucket(v: Column, nBits: Int): Column =
    call_function("hyperplane_bucket", v, org.apache.spark.sql.functions.lit(nBits))

  /** Element-wise vector-sum aggregate ([[VectorSum]]); use under groupBy. */
  def vectorSum(v: Column): Column = call_function("vector_sum", v)

  def cdcChunks(text: Column, minSize: Int, avgBits: Int, maxSize: Int): Column =
    call_function("cdc_chunks", text,
      org.apache.spark.sql.functions.lit(minSize),
      org.apache.spark.sql.functions.lit(avgBits),
      org.apache.spark.sql.functions.lit(maxSize))

  def docFingerprint(text: Column, n: Int): Column =
    call_function("doc_fingerprint", text, org.apache.spark.sql.functions.lit(n))

  /** Hit counts against [[graft.operators.TextAnalysis.Lexicons]] in
    * [[graft.operators.TextAnalysis.LexiconOrder]] order, as array<int>.
    */
  def lexiconHits(text: Column): Column = call_function("lexicon_hits", text)

  /** `array<long> [n_chars, distinct_chars, max_char_count, Σc²]` per row. */
  def charDiversity(text: Column): Column = call_function("char_diversity", text)

  def unicodeNormalize(text: Column, form: String): Column =
    call_function("unicode_normalize", text, org.apache.spark.sql.functions.lit(form))

  def stripAccents(text: Column): Column = call_function("strip_accents", text)
}
