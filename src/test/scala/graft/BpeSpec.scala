package graft

import graft.operators.Bpe
import graft.operators.Bpe.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE tokenizer's load-bearing semantics:
  *
  *  1. the double-space symbol encoding makes ONE literal `replace` call
  *     exactly greedy leftmost non-overlapping pair substitution — incl.
  *     the self-overlap case and the no-false-match-across-symbol-
  *     boundaries cases the encoding exists to rule out;
  *  2. training on the classic `low/lower/newest` corpus reproduces the
  *     hand-computed merge table, exercising both the count ordering and
  *     the lexicographic tie-break;
  *  3. applying the trained merges post-hoc reproduces the training
  *     loop's own final dictionary encodings (train/apply consistency);
  *  4. `encodeDocs` token counts match the hand-derived segmentations.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def applyOne(enc: String, lhs: String, rhs: String): String = {
    import spark.implicits._
    Seq(enc).toDF("enc")
      .select(Bpe.applyMerge(col("enc"), Merge(1, lhs, rhs, 0L)).as("out"))
      .head().getString(0)
  }

  test("merge replace is greedy leftmost non-overlapping") {
    assert(applyOne(" a  a  a  a ", "a", "a") === " aa  aa ")
    assert(applyOne(" a  a  a ", "a", "a") === " aa  a ")
    assert(applyOne(" x  a  b  c ", "a", "b") === " x  ab  c ")
    assert(applyOne(" a  b ", "a", "b") === " ab ")
  }

  test("merge replace cannot match across symbol boundaries") {
    // lhs "a" must not match the suffix of symbol "xa"...
    assert(applyOne(" xa  b ", "a", "b") === " xa  b ")
    // ...nor rhs "b" the prefix of symbol "bc"
    assert(applyOne(" a  bc ", "a", "b") === " a  bc ")
  }

  test("training the classic low/lower/newest corpus reproduces the hand-computed merges") {
    import spark.implicits._
    val docs = Seq((0L, "low low low"), (1L, "lower lower"), (2L, "newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, 4)
    // round 1: (l,o)=5 ties (o,w)=5 -> lexicographic picks (l,o)
    // round 2: (lo,w)=5; round 3: (low,</w>)=3 beats the 2s and the
    // newest 1s; round 4: three-way tie at 2 -> lexicographic (e,r)
    assert(merges === Seq(
      Merge(1, "l", "o", 5L),
      Merge(2, "lo", "w", 5L),
      Merge(3, "low", "</w>", 3L),
      Merge(4, "e", "r", 2L)))
  }

  test("post-hoc applyMerges reproduces the training loop's final dictionary") {
    import spark.implicits._
    val docs = Seq((0L, "low low low"), (1L, "lower lower"), (2L, "newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, 4)
    val replayed = Seq("low", "lower", "newest").toDF("w")
      .select(col("w"), Bpe.applyMerges(Bpe.encodeWord(col("w")), merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(replayed("low") === " low</w> ")
    assert(replayed("lower") === " low  er  </w> ")
    assert(replayed("newest") === " n  e  w  e  s  t  </w> ")
  }

  test("encodeDocs token counts match the hand-derived segmentations") {
    import spark.implicits._
    val docs = Seq((0L, "low low low"), (1L, "lower lower"), (2L, "newest"), (3L, "  "))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs.filter(col("doc_id") < 3), 4)
    val out = Bpe.encodeDocs(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(0L)._1 === 3L) // low</w> x3
    assert(out(1L)._1 === 6L) // (low, er, </w>) x2
    assert(out(2L)._1 === 7L) // untouched character sequence + </w>
    assert(out(3L)._1 === 0L) // whitespace-only doc keeps a row
    assert(out(3L)._2 === java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString)
    // zero merges: every word costs chars+1 tokens
    val base = Bpe.encodeDocs(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base(0L) === 12L) // 3 words x (3 chars + </w>)
    assert(base(2L) === 7L)
  }

  test("trainFast (heap/incremental) is merge-for-merge identical to train") {
    import spark.implicits._
    val docs = Seq(
      (0L, "low low low low low lower lower newest newest"),
      (1L, "newest newest newest newest widest widest widest low"),
      (2L, "new new new era era the the the the era")
    ).toDF("doc_id", "text")
    // deep enough to hit exhaustion on this corpus: both trainers must
    // agree on every (rank, lhs, rhs, count) INCLUDING tie-break rounds
    // and must truncate at the same exhaustion point
    val slow = Bpe.train(spark, docs, 60)
    val fast = Bpe.trainFast(spark, docs, 60)
    assert(fast === slow)
    assert(slow.size < 60) // the corpus genuinely exhausts — the
    // equivalence above covered the early-stop path, not just a prefix
    // a strict prefix ask agrees too
    assert(Bpe.trainFast(spark, docs, 7) === slow.take(7))
  }

  test("trainFast frequency truncation keeps the top types deterministically") {
    import spark.implicits._
    // freq: bb x3, aa x3, cc x2  — maxTypes=2 keeps {aa, bb} (count desc,
    // word asc breaks the 3-3 tie in favour of aa, and bb beats cc on
    // count), so no merge can ever involve 'c'
    val docs = Seq((0L, "bb aa bb aa bb aa cc cc")).toDF("doc_id", "text")
    val m = Bpe.trainFast(spark, docs, 10, maxTypes = 2, failOnTruncate = false)
    assert(m.nonEmpty)
    assert(!m.exists(x => x.lhs.contains("c") || x.rhs.contains("c")))
    // dict " a  a  </w> " x3 and " b  b  </w> " x3 — pairs (a,a)=3,
    // (a,</w>)=3, (b,b)=3, (b,</w>)=3: a four-way count tie whose
    // byte-order winner is (a, </w>) ('<' = 0x3C sorts before 'a')
    assert(m.head === Merge(1, "a", Bpe.EndOfWord, 3L))
  }

  test("training stops cleanly when the dictionary runs out of pairs") {
    import spark.implicits._
    // Single word type "a": round 1 merges (a, </w>) into one symbol,
    // after which no adjacent pair exists — asking for 5 merges must
    // return the 1 learnable merge, not throw on the empty round-2 scan.
    val docs = Seq((0L, "a a a")).toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, 5)
    assert(merges === Seq(Merge(1, "a", Bpe.EndOfWord, 3L)))
    // Degenerate corpus with no words at all: zero merges, no crash.
    assert(Bpe.train(spark, Seq((0L, "   ")).toDF("doc_id", "text"), 3).isEmpty)
  }
}
