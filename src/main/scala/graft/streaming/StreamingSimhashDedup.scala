package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One banded fingerprint row: `band` is the 4-banded bucket key
  * (band index tagged into the high bits, same single-long key as the
  * batch operator — [[graft.operators.Dedup.simhashNearDupPairs]]).
  */
final case class BandDoc(band: Long, doc_id: Long, simhash64: Long)

final case class SimEntry(doc_id: Long, simhash64: Long)

/** Per-bucket dedup index kept in the state store: every fingerprint
  * seen in this band bucket so far. This IS the streaming twin of x31's
  * persisted band store — state grows with bucket occupancy because a
  * dedup-against-all-history index must; a production deployment bounds
  * it by corpus partitioning (bits per band), not by time, so there is
  * deliberately no watermark eviction.
  */
final case class BucketState(docs: Seq[SimEntry])

final case class DupHit(doc_id: Long, dup_of: Long, hamming: Int)

/** x57: streaming near-duplicate DEDUP — each arriving document is
  * checked against every PRIOR document within its 4 simhash band
  * buckets, and emits (doc_id, dup_of, hamming) on its best (minimum
  * prior doc_id) Hamming-≤3 match. By pigeonhole (Manku et al.), any
  * pair within Hamming distance 3 of the 64-bit fingerprint agrees on
  * at least one of the 4 16-bit bands, so checking only same-bucket
  * priors has EXACT recall — the banding is a pure index, as in the
  * batch x25 operator, and the result is a pure function of the
  * document set (dup_of = min qualifying doc_id), independent of batch
  * boundaries given id-ordered arrival (the spool contract all the
  * streaming twins share; within-batch disorder is sorted out here).
  */
object StreamingSimhashDedup {

  def dedupGroup(band: Long, docs: Iterator[BandDoc],
                 state: GroupState[BucketState]): Iterator[DupHit] = {
    var seen: Seq[SimEntry] = state.getOption.map(_.docs).getOrElse(Vector.empty)
    val out = Seq.newBuilder[DupHit]
    // id-ascending within the batch: each doc may only match PRIOR ids,
    // including earlier docs of this same micro-batch
    docs.toArray.sortBy(_.doc_id).foreach { d =>
      var bestId = Long.MaxValue
      var bestHam = -1
      seen.foreach { e =>
        if (e.doc_id < d.doc_id && e.doc_id < bestId) {
          val h = java.lang.Long.bitCount(e.simhash64 ^ d.simhash64)
          if (h <= 3) { bestId = e.doc_id; bestHam = h }
        }
      }
      if (bestHam >= 0) out += DupHit(d.doc_id, bestId, bestHam)
      seen = seen :+ SimEntry(d.doc_id, d.simhash64)
    }
    state.update(BucketState(seen))
    out.result().iterator
  }

  /** Banded fingerprint stream → per-band dup hits (append mode). The
    * caller reduces across bands (a pair can collide in up to 4 buckets)
    * with a commutative struct-min, so sink row order never matters.
    */
  def hits(banded: Dataset[BandDoc]): Dataset[DupHit] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(dedupGroup)
  }
}
