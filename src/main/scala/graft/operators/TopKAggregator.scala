package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate for a query. */
case class ScoredNeighbor(cos: Double, neighbor_id: Long)

/** Typed top-k Aggregator (SURVEY.md §2.11 UDAF surface): keeps the k
  * best (cos desc, neighbor_id asc) candidates in a bounded sorted
  * buffer.
  *
  * Why this beats the window formulation at scale: `row_number over
  * (partition by query)` must shuffle EVERY scored pair to the
  * query's reducer — O(|Q|·N) rows through the exchange. An
  * Aggregator participates in partial aggregation: each map task
  * reduces its partition to ≤ k rows per query before the shuffle, so
  * the exchange carries O(|Q|·k·partitions). SimilaritySpec pins the
  * result equal to the window version.
  */
class TopKNeighbors(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {

  // the ranking window's exact total order: cos desc with NaN ranked
  // greatest (java.lang.Double.compare — Spark's desc sort semantics),
  // then neighbor_id asc. Ordering.by(-cos) would send a zero-norm
  // vector's NaN cosine to the WORST rank while the window formulation
  // ranks it first — a silent agg/window divergence on degenerate input.
  private val ord: Ordering[ScoredNeighbor] = new Ordering[ScoredNeighbor] {
    def compare(a: ScoredNeighbor, b: ScoredNeighbor): Int = {
      val c = java.lang.Double.compare(b.cos, a.cos)
      if (c != 0) c else java.lang.Long.compare(a.neighbor_id, b.neighbor_id)
    }
  }

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(buf: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] =
    // bounded insert: skip the sort when the candidate can't qualify
    if (buf.size >= k && ord.gteq(a, buf.last)) buf
    else ((buf :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredNeighbor], b2: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] = bufferEncoder
}
