package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

final case class TermCount(term: String, n: Long)

/** Typed top-k aggregator: keeps the k highest-count (count desc, term
  * asc) terms per group in a bounded buffer.
  *
  * This is the single-shuffle alternative to the window formulation
  * (`row_number() OVER (PARTITION BY …) <= k`): a window must shuffle
  * EVERY (group, term) row and sort full partitions before discarding
  * all but k rows; this aggregator's partial buffers cap at k entries
  * map-side, so only ≤ k·groups tiny rows cross the wire — the shape
  * that matters when "groups" is thousands of sources and "terms" is a
  * 100 TB vocabulary.
  *
  * The input is the (source, term, count) triple from an upstream
  * aggregate; the output is the sorted top-k list, exploded back to
  * rows by the caller.
  */
class TopKTerms(k: Int)
    extends Aggregator[(String, String, Long), Seq[TermCount], Seq[TermCount]] {

  private def trim(s: Seq[TermCount]): Seq[TermCount] =
    s.sortBy(t => (-t.n, t.term)).take(k)

  override def zero: Seq[TermCount] = Nil
  override def reduce(buf: Seq[TermCount], row: (String, String, Long)): Seq[TermCount] =
    trim(buf :+ TermCount(row._2, row._3))
  override def merge(a: Seq[TermCount], b: Seq[TermCount]): Seq[TermCount] = trim(a ++ b)
  override def finish(buf: Seq[TermCount]): Seq[TermCount] = buf
  override def bufferEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder[Seq[TermCount]]()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder[Seq[TermCount]]()
}
