package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-query Maximal-Marginal-Relevance selector (Carbonell &
  * Goldstein 1998): from a candidate set (nid, queryDot, quantizedVec),
  * greedily pick k results maximizing relevance MINUS redundancy —
  * score(c) = dot(q,c) − max_{s∈selected} dot(c,s), the λ = 1/2 MMR
  * criterion up to the constant factor (argmax of λ·rel − (1−λ)·red is
  * argmax of rel − red at λ = 1/2). The first pick has an empty selected
  * set (penalty 0), i.e. plain top-1 relevance.
  *
  * All arithmetic is exact int64 over the ±10⁴-quantized vectors (dim 64
  * ⇒ |Σ| ≤ 64·10⁸ ≪ 2⁶³), so selection is deterministic and fully
  * DuckDB-oracled. Ties break by (score desc, dot desc, nid asc) —
  * mirrored in the oracle's ORDER BY.
  *
  * Scale shape: the aggregator only ever sees the top-m candidate rows a
  * heap-merge stage produced (m per query, KB-sized), so the buffer is
  * m·(dim+2) longs per query — the greedy O(k·m) pair dots run where the
  * group lands, never on the driver. This is the standard diversity
  * re-rank at the END of an ANN serving stack (retrieval-augmented
  * pipelines dedup their retrieved contexts exactly this way), composing
  * with any candidate tier (brute/IVF/PQ).
  */
class MmrAggregator(k: Int)
    extends Aggregator[(Long, Long, Seq[Long]),
                       Seq[(Long, Long, Seq[Long])],
                       Seq[(Long, Long, Long, Long)]] {
  // input: (nid, dot, vec); output: (nid, dot, penalty, mmr_rank)

  override def zero: Seq[(Long, Long, Seq[Long])] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, Seq[Long])],
                      in: (Long, Long, Seq[Long])): Seq[(Long, Long, Seq[Long])] =
    buf :+ in

  override def merge(a: Seq[(Long, Long, Seq[Long])],
                     b: Seq[(Long, Long, Seq[Long])]): Seq[(Long, Long, Seq[Long])] =
    a ++ b

  private def dotVec(a: Seq[Long], b: Seq[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override def finish(buf: Seq[(Long, Long, Seq[Long])]): Seq[(Long, Long, Long, Long)] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var remaining = buf.sortBy { case (nid, dot, _) => (-dot, nid) }.toVector
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.map { case c @ (nid, dot, v) =>
        val pen = if (selected.isEmpty) 0L else selected.map(dotVec(v, _)).max
        (c, dot - pen, pen)
      }
      val ((nid, dot, v), _, pen) =
        scored.minBy { case ((id, d, _), s, _) => (-s, -d, id) }
      out += ((nid, dot, pen, rank))
      selected += v
      remaining = remaining.filterNot(_._1 == nid)
      rank += 1
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long, Seq[Long])]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Seq[Long])]]()

  override def outputEncoder: Encoder[Seq[(Long, Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long, Long)]]()
}
