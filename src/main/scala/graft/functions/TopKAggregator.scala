package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §4.3 item 3, the optional custom
  * aggregate): keeps a bounded, sorted k-buffer per group.
  *
  * Versus the window-function top-k (`row_number().over(...)  <= k`):
  * the window plan shuffles EVERY candidate row to its group's reducer
  * and sorts the whole group; this aggregator combines map-side, so
  * only k rows per (partition, group) reach the shuffle — the right
  * plan when candidates per group are huge (100 TB ANN fan-out).
  *
  * Ordering: sim desc, then id asc — identical tie-breaking to the
  * window query and the DuckDB oracle, so results hash-match.
  */
final case class ScoredId(id: Long, sim: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    if (buf.length == k && better(buf.last, in)) buf
    else ((buf :+ in).sortWith(better)).take(k)
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortWith(better).take(k)

  override def finish(reduction: Seq[ScoredId]): Seq[ScoredId] = reduction

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
