package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial+final k-minimum-values aggregator: each partition keeps
  * only its k smallest DISTINCT hash values, merge unions and re-prunes —
  * the KMV distinct-count sketch's reducer (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"). The exact alternative
  * (count(DISTINCT x) per group) shuffles every distinct value; this moves
  * at most k longs per (group, partition), so a 100 TB corpus estimates
  * per-source vocabulary with a KB-sized exchange.
  *
  * Distinctness is part of the sketch's math (duplicate hashes must not
  * occupy two of the k slots), so the buffer is kept sorted-unique.
  */
class MinKAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def prune(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    // fast path: a full buffer rejects anything ≥ its current max without
    // re-sorting (the common case once the sketch saturates)
    if (buf.length == k && in >= buf.last) buf else prune(buf :+ in)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = prune(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
