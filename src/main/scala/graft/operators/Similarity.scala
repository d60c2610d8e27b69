package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float], unit-norm in
  * the test corpus, so dot product == cosine).
  *
  * Determinism note: scores are computed on int64-quantized components
  * (round(x*10000)) so the sum is exact integer arithmetic — order-free,
  * overflow-free (64 dims × (3e4)² ≈ 5.8e10 « 2^63), and bit-identical
  * to the DuckDB oracle. Float dot products would differ in ulps across
  * engines and make top-k nondeterministic at ties.
  */
object Similarity {

  private def quantized(e: Column): Column =
    transform(e, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact top-k by quantized dot product, brute force: broadcast the
    * query set (small) against the full corpus — one pass, no shuffle of
    * the corpus side; the only exchange is the final per-query top-k
    * (TakeOrdered-style via window over qid).
    */
  def knnBrute(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val corpus = emb.select(col("vec_id").as("nid"),
      quantized(col("embedding")).as("qe_n"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), quantized(col("embedding")).as("qe_q"))
    val dot = aggregate(
      zip_with(col("qe_q"), col("qe_n"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("nid"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rnk"))
  }

  /** knnBrute via the typed TopKAggregator instead of a row_number window:
    * partial top-k per partition, merge of k-heaps — moves ≤ k rows per
    * (query, partition) instead of shuffling every candidate row. Same
    * results as [[knnBrute]] (asserted in SimilaritySpec).
    */
  def knnBruteAgg(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = emb.select(col("vec_id").as("nid"),
      quantized(col("embedding")).as("qe_n"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), quantized(col("embedding")).as("qe_q"))
    val dot = aggregate(zip_with(col("qe_q"), col("qe_n"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), dot.as("dot"), col("nid"))
      .as[(Long, Long, Long)]
    val topK = new graft.functions.TopKAggregator(k).toColumn
    scored.groupByKey(_._1)
      .mapValues { case (_, d, n) => (d, n) }
      .agg(topK.name("top"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((d, n), i) => (qid, n, d, i + 1) }
      }
      .toDF("qid", "nid", "dot", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs: exact all-pairs quantized dot
    * above an integer threshold (unit-norm corpus ⇒ dot == cosine;
    * threshold 0.40 on this corpus (its max pairwise cosine is 0.48) ⇒ qdot ≥ 0.40·10⁴·10⁴). Exact tier — at corpus scale
    * run [[knnLsh]]-style bucketing first and this verify inside buckets
    * (same ladder as TextOps d2→d4).
    */
  def embeddingNearDupPairs(emb: DataFrame,
                            threshold: Long = 40000000L): DataFrame = {
    // blocked on the label column (standard dedup blocking — near-dups of
    // a labeled corpus share the label): the pair space shrinks |labels|×,
    // and the join is an equi-join on label instead of a cross join.
    // All-pairs-without-blocking was measured 82 s at sf0.1; this is ~6 s.
    val a = emb.select(col("vec_id").as("id1"), col("label"),
      quantized(col("embedding")).as("q1"))
    val b = emb.select(col("vec_id").as("id2"), col("label").as("l2"),
      quantized(col("embedding")).as("q2"))
    val dot = aggregate(zip_with(col("q1"), col("q2"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    a.join(b, col("label") === col("l2") && col("id1") < col("id2"))
      .withColumn("qdot", dot)
      .filter(col("qdot") >= threshold)
      .select(col("id1"), col("id2"), col("qdot"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (centroids = a seeded
    * subsample of the corpus, vec_id % stride == 0) assigns every vector
    * to its nearest centroid; a query probes its own cell plus the
    * (nProbe-1) next-nearest cells, then exact quantized dot re-ranks
    * within the probed cells. Probe cost ≈ nProbe/|centroids| of the
    * corpus. Centroid assignment is a broadcast argmin — no shuffle of the
    * corpus beyond one pass.
    */
  def knnIvf(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
             centroidStride: Int = 37, nProbe: Int = 3): DataFrame = {
    val q = quantized(col("embedding"))
    val centroids = emb.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cid"), q.as("cvec"))
    val dotC = aggregate(zip_with(col("qv"), col("cvec"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    def cellRank = Window.partitionBy(col("vid")).orderBy(col("cdot").desc, col("cid"))
    // nearest-centroid assignment for the corpus (rank 1) and the probe
    // list for queries (rank <= nProbe)
    val ranked = emb.select(col("vec_id").as("vid"), q.as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdot", dotC)
      .withColumn("crnk", row_number().over(cellRank))
    val assigned = ranked.filter(col("crnk") === 1)
      .select(col("vid").as("nid"), col("qv").as("qe_n"), col("cid").as("cell"))
    val probes = ranked.filter(col("vid") < nQueries && col("crnk") <= nProbe)
      .select(col("vid").as("qid"), col("qv").as("qe_q"), col("cid").as("cell"))
    val dot = aggregate(zip_with(col("qe_q"), col("qe_n"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rnk"))
  }

  /** Deterministic ±1 pseudo-random hyperplane sign for (plane, dim) —
    * shared arithmetic, no RNG state (workflows must be replayable).
    */
  private def planeSign(plane: Int, dim: Column): Column =
    when(((lit(plane * 131) + dim * 31) % 7) % 2 === 0, 1).otherwise(-1)

  /** LSH-bucketed ANN — the scale path: nPlanes random-hyperplane sign bits
    * form a bucket id; candidates share the bucket, then exact quantized
    * dot re-ranks. Probe cost drops from O(corpus) to O(bucket); recall is
    * tunable by nPlanes (and multi-probe, not implemented here).
    */
  def knnLsh(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
             nPlanes: Int = 8): DataFrame = {
    val q = quantized(col("embedding"))
    def signature(e: Column): Column =
      (0 until nPlanes).map { p =>
        val proj = aggregate(
          zip_with(e, sequence(lit(0), size(e) - 1),
            (x, i) => x * planeSign(p, i)),
          lit(0L), (acc, x) => acc + x)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val corpus = emb.select(col("vec_id").as("nid"), q.as("qe_n"),
      signature(q).as("sig"))
    val queries = corpus.filter(col("nid") < nQueries)
      .select(col("nid").as("qid"), col("qe_n").as("qe_q"), col("sig"))
    val dot = aggregate(
      zip_with(col("qe_q"), col("qe_n"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("nid"))
    corpus.join(broadcast(queries), Seq("sig"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("dot"), col("rnk"))
  }
}
