package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A (term, count) pair flowing into the frequency sketch. */
case class TermCount(term: String, n: Int)

/** A surviving counter: `est` is the lower-bound estimate (true − est ≤
  * N/(m+1)); Long because corpus-level counts outgrow Int at scale. */
case class TermEst(term: String, est: Long)

/** Mergeable Misra–Gries frequent-items sketch over per-document term-count
  * rows: a bounded map of at most `m` counters whose partials combine
  * associatively, so the whole corpus collapses map-side to one m-entry
  * summary per partition and only those summaries cross the exchange.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", TODS 2013): after any sequence of reduces and
  * merges over a stream of N total token occurrences, every term keeps
  * `estimate ∈ [true − N/(m+1), true]`, so any term with true count
  * ≥ N/(m+1) is guaranteed present. The trim step subtracts the (m+1)-th
  * largest counter from all counters and drops the non-positive ones —
  * the batched form of the classic decrement-all step.
  *
  * This is the CANDIDATE-GENERATION half of a two-pass exact heavy-hitters
  * (TextAnalysis.heavyHitters): the sketch prunes the vocabulary to ≤ m
  * candidates in one pass, then an exact count of candidates only decides
  * — so the final output is exact (oracle-checkable) while the full-corpus
  * pass stays bounded-memory. SketchSpec pins the containment guarantee on
  * a Zipf stream whose vocabulary is ≫ m (real decrements, unlike the toy
  * corpus whose 31-term vocabulary fits in the sketch whole).
  */
class MisraGriesAggregator(m: Int)
    extends Aggregator[Seq[TermCount], Map[String, Long], Seq[TermEst]] {

  private def trim(counts: Map[String, Long]): Map[String, Long] =
    if (counts.size <= m) counts
    else {
      val d = counts.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
      counts.collect { case (t, c) if c > d => t -> (c - d) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], doc: Seq[TermCount]): Map[String, Long] =
    trim(doc.foldLeft(buf) { case (b, tc) =>
      b.updated(tc.term, b.getOrElse(tc.term, 0L) + tc.n)
    })

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    trim(small.foldLeft(large) { case (b, (t, c)) =>
      b.updated(t, b.getOrElse(t, 0L) + c)
    })
  }

  override def finish(r: Map[String, Long]): Seq[TermEst] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) => TermEst(t, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[TermEst]] = ExpressionEncoder[Seq[TermEst]]()
}
