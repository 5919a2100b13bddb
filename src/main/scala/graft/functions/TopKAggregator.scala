package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator: keeps the k best (score desc,
  * payload asc on ties) entries in a bounded buffer. The buffer is
  * O(k) regardless of group size, and merge is associative — so unlike
  * the window row_number() <= k formulation (full sort of every group),
  * this aggregates map-side: each partition ships at most k rows per
  * group to the shuffle. The difference is the whole game on skewed
  * groups at 100 TB.
  */
case class ScoredEntry(payload: String, score: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredEntry, Seq[ScoredEntry], Seq[ScoredEntry]] {

  private def better(a: ScoredEntry, b: ScoredEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.payload < b.payload)

  override def zero: Seq[ScoredEntry] = Seq.empty

  override def reduce(buf: Seq[ScoredEntry], in: ScoredEntry)
      : Seq[ScoredEntry] = merge(buf, Seq(in))

  override def merge(a: Seq[ScoredEntry], b: Seq[ScoredEntry])
      : Seq[ScoredEntry] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[ScoredEntry]): Seq[ScoredEntry] = buf

  override def bufferEncoder: Encoder[Seq[ScoredEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredEntry]]()

  override def outputEncoder: Encoder[Seq[ScoredEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredEntry]]()
}
