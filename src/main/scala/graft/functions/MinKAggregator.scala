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

  /** Invariant: buf is sorted ascending and distinct (zero trivially;
    * reduce inserts in place; merge re-prunes). So membership is a binary
    * search and insertion is one positional patch — the r3 ADVICE fix:
    * the old `prune(buf :+ in)` re-ran distinct+sort+take (several
    * allocations) for EVERY accepted element and every duplicate of a
    * value already held, allocation churn on a corpus-scale token stream.
    */
  override def reduce(buf: Seq[Long], in: Long): Seq[Long] = {
    val n = buf.length
    // saturated fast path: reject anything ≥ current max outright
    if (n == k && in >= buf.last) buf
    else {
      // binary search for the insertion point in the sorted buffer
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < in) lo = mid + 1 else hi = mid
      }
      if (lo < n && buf(lo) == in) buf // duplicate: sketch slots are distinct
      else {
        val out = new Array[Long](math.min(n + 1, k))
        var i = 0
        while (i < lo) { out(i) = buf(i); i += 1 }
        out(lo) = in
        while (i < out.length - 1) { out(i + 1) = buf(i); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = prune(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
