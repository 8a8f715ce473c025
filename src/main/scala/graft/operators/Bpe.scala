package graft.operators

import graft.CkptOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer: train + apply as exact,
  * oracle-replayable operators — the subword pass every LLM training
  * pipeline runs between raw text and token-denominated bookkeeping
  * (packing, OOV, perplexity), here for real instead of the whitespace
  * proxies the earlier text rows ride on.
  *
  * '''Algorithm''' (Sennrich, Haddow & Birch 2015, arXiv:1508.07909):
  * train on the WORD-FREQUENCY DICTIONARY, not the corpus — words are
  * whitespace-split from lowercased text, each initialised as its
  * character sequence plus a terminal `</w>` marker; each merge round
  * counts all adjacent symbol pairs weighted by word frequency (exact
  * integers, one map-side-combined shuffle), picks the single most
  * frequent pair with a count-desc / lexicographic (lhs, rhs) tie-break
  * (fully deterministic, so the learned merge table hash-gates), and
  * rewrites every word by greedy leftmost non-overlapping replacement of
  * that pair. Applying the trained tokenizer replays the merge table in
  * rank order over each word.
  *
  * '''Symbol-sequence encoding.''' A word's symbol sequence is ONE string:
  * symbols joined by a double space, wrapped in single spaces —
  * `"low"` → `" l  o  w  </w> "`. Symbols never contain spaces (words are
  * whitespace-split), so the boundary is unambiguous, and one literal
  * `replace(enc, " a  b ", " ab ")` is EXACTLY greedy leftmost
  * non-overlapping pair substitution: the pattern consumes one of the two
  * separator spaces on each side, which blocks re-merging the freshly
  * merged token with its left neighbour in the same pass while leaving
  * the neighbouring separators intact (`" a  a  a  a "` → `" aa  aa "`,
  * `" a  a  a "` → `" aa  a "` — [[graft.BpeSpec]] pins both). The same
  * single `replace` call exists in DuckDB with identical semantics, so
  * every training round and the final encoding replay verbatim in the
  * oracle (unrolled MATERIALIZED CTEs, the x75/x91 pattern).
  *
  * '''Scale shape''' (the 100 TB question): the corpus is touched ONCE, by
  * the word-count aggregation (map-side combined; the dictionary is
  * vocabulary-sized, orders of magnitude smaller than the corpus). Each
  * merge round is one explode + hash-aggregate over the dictionary plus a
  * narrow per-row rewrite; the winning pair is a 1-row take (the
  * convergence-probe idiom, not a data collect), and the dictionary is
  * `ckpt`'d per round (the x75 cadence) so round i never recomputes
  * rounds 1..i-1. Applying the tokenizer is shuffle-free: a fixed chain
  * of literal `replace` calls inside a `transform` lambda, whole-stage
  * codegen friendly, embarrassingly parallel per document. The merge
  * table itself is model parameters — bounded by construction (numMerges
  * rows), the one thing that legitimately lives on the driver.
  */
object Bpe {

  /** Terminal word-boundary symbol — lets merges distinguish word-final
    * pairs, per the original BPE formulation.
    */
  val EndOfWord = "</w>"

  /** A learned merge: 1-based rank, the two symbols, their exact
    * frequency-weighted pair count at selection time.
    */
  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** Initial symbol-sequence encoding of a word: each character a symbol,
    * `</w>` appended — `"ab"` → `" a  b  </w> "`.
    */
  def encodeWord(w: Column): Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1  "), lit(EndOfWord + " "))

  /** Symbols of an encoded sequence, in order. */
  def symbols(enc: Column): Column = split(trim(enc), "  ")

  private def mergePattern(m: Merge): (String, String) =
    (s" ${m.lhs}  ${m.rhs} ", s" ${m.lhs}${m.rhs} ")

  /** One greedy leftmost non-overlapping application of merge `m`. */
  def applyMerge(enc: Column, m: Merge): Column = {
    val (pat, rep) = mergePattern(m)
    call_function("replace", enc, lit(pat), lit(rep))
  }

  /** The full trained tokenizer: merges applied in rank order. */
  def applyMerges(enc: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(enc)(applyMerge)

  /** Lowercased whitespace words of a text column, empties dropped. */
  private def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Train `numMerges` BPE merges on the corpus' word-frequency
    * dictionary. Returns the merge table in rank order.
    */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int): Seq[Merge] = {
    // The ONE corpus-wide pass: word-type frequencies (map-side combined).
    var dict = docs
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(encodeWord(col("w")).as("enc"), col("freq"))
      .ckpt()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // Adjacent symbol pairs, frequency-weighted exact integer counts.
      val top = dict
        .withColumn("sy", symbols(col("enc")))
        .select(col("freq"), explode(expr(
          "CASE WHEN size(sy) < 2 THEN array() " +
            "ELSE transform(sequence(0, size(sy) - 2), i -> struct(sy[i] AS a, sy[i+1] AS b)) END"))
          .as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("cnt"))
        // deterministic winner: count desc, then lexicographic (a, b) —
        // limit(1) plans as TakeOrdered, never a full sort
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .take(1).headOption
      top match {
        case None =>
          // Tiny/empty corpus ran out of adjacent pairs before numMerges:
          // every word is a single symbol, nothing left to merge. Stop
          // cleanly — the oracle's per-round CTEs produce the same empty
          // tail, so the truncated merge table still matches.
          exhausted = true
        case Some(row) =>
          val m = Merge(rank, row.getString(0), row.getString(1), row.getLong(2))
          merges += m
          // Narrow per-row rewrite; ckpt truncates the growing replace
          // chain so round i+1's pair scan reads materialized blocks, not
          // lineage.
          dict = dict.withColumn("enc", applyMerge(col("enc"), m)).ckpt()
          rank += 1
      }
    }
    merges.result()
  }

  /** Subword token count of a text under a trained merge table — the
    * column form of [[encodeDocs]]'s count, for token-denominated
    * consumers (x111's packing): Σ over words of the encoded symbol
    * count. Shuffle-free, codegen-friendly, 0 for empty documents.
    */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    aggregate(transform(words(text), w => trim(applyMerges(encodeWord(w), merges))),
      lit(0L), (acc, e) => acc + size(split(e, "  ")))

  /** The learned merge table as a DataFrame — the x102 ledger surface:
    * (merge_rank, lhs, rhs, merged, pair_count) in rank order.
    */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Encode every document with a trained merge table — the x103 ledger
    * surface: per-doc subword token count plus an md5 fingerprint of the
    * full encoded sequence (word encodings joined by `"|"` in document
    * order), so the gate pins the exact tokenization, not just its size.
    * Shuffle-free: per-word replace chain inside a `transform` lambda.
    */
  def encodeDocs(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val encWords = transform(words(col("text")),
      w => trim(applyMerges(encodeWord(w), merges)))
    docs
      .select(col("doc_id"),
        aggregate(encWords, lit(0L),
          (acc, e) => acc + size(split(e, "  "))).as("n_tokens"),
        md5(concat_ws("|", encWords)).as("enc_md5"))
      .orderBy("doc_id")
  }
}
