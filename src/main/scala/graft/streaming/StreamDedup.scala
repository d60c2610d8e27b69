package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextHashes

/** Streaming near-dup candidate generation — the batch dedup ladder's
  * banded-MinHash tier (TextOps.minhashCandidates) run INCREMENTALLY, the
  * text-tier analog of the reference's tailing mode: documents arrive as
  * a stream, and candidates surface online instead of waiting for a
  * corpus-wide batch join. Same hash family, shingle kernel and Horner
  * band combine as the batch tier, so identical text lands in identical
  * buckets in both modes.
  *
  * Scale shape: per-document work is one in-row loop (no shuffle before
  * the state operator); state per (band, bucket) key is ONE long — the
  * bucket's representative — so the store is bounded by distinct buckets
  * touched, not by corpus size, and the RocksDB provider keeps it off
  * heap. Exact Jaccard verification of emitted pairs stays downstream,
  * exactly as in the batch ladder (TextOps.nearDupLadder).
  */
object StreamDedup {

  case class BandHit(band: Int, bucket: Long, doc_id: Long)
  case class CandPair(doc1: Long, doc2: Long, band: Int)
  case class DeconVerdict(doc_id: Long, n_sh: Long, n_hits: Long,
                          contaminated: Boolean)

  private val P31: Long = TextHashes.P31

  /** Distinct shingle hashes of the (benchmark-sized) eval table,
    * collected to the driver — the streaming analog of the batch op's
    * broadcast build side (TextOps.decontaminate). Same shingle kernel
    * and hash family, so batch and stream agree doc-for-doc.
    */
  def evalHashSet(evalDocs: DataFrame): Set[Long] =
    evalDocs
      .select(explode(graft.functions.shingles3(
        split(col("text"), " "))).as("s"))
      .select(graft.functions.poly_hash31(col("s")).as("ph"))
      .distinct().collect().map(_.getLong(0)).toSet

  /** Streaming decontamination: per-document eval-overlap verdicts with
    * ZERO state — each doc's shingles are hashed and membership-checked
    * in one in-row loop against the broadcast eval set, so the operator
    * is a stateless map (no watermark, no state store, works in any
    * output mode and composes before/after any stateful stage). The
    * batch form's explode → broadcast-join → groupBy collapses to this
    * loop because the verdict only needs the doc's OWN shingles plus the
    * shared read-only set. Matches TextOps.decontaminate row-for-row
    * (StreamingSpec).
    */
  def verdicts(spark: SparkSession, docs: DataFrame, evalSet: Set[Long],
               minHits: Int = 3): Dataset[DeconVerdict] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(evalSet)
    docs.select(col("doc_id"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, Seq[String])]
      .map { case (id, shs) =>
        var hits = 0L
        shs.foreach { s =>
          if (bc.value.contains(
            TextHashes.polyHash31(UTF8String.fromString(s)))) hits += 1
        }
        DeconVerdict(id, shs.length.toLong, hits, hits >= minHits)
      }
  }

  /** Shared in-row MinHash band kernel — identical arithmetic to the
    * batch tier (TextOps.minhashSignatures + bandBucket): k affine
    * min-hashes over the doc's shingle poly-hashes, Horner-combined into
    * one bucket per band. Returns the per-band bucket ids (index =
    * band). Empty input must be guarded by the caller.
    */
  private[streaming] def bandBuckets(shs: Seq[String], k: Int,
                                     bands: Int): Array[Long] = {
    val r = k / bands
    val phs = shs.map(s => TextHashes.polyHash31(UTF8String.fromString(s)))
    val mins = Array.tabulate(k) { i =>
      var m = Long.MaxValue
      phs.foreach { ph =>
        val h = (ph * (2L * i + 1) + i.toLong * i + 1) % P31
        if (h < m) m = h
      }
      m
    }
    Array.tabulate(bands) { b =>
      var acc = b.toLong
      var j = 0
      while (j < r) { acc = (acc * 1000003L + mins(b * r + j)) % P31; j += 1 }
      acc
    }
  }

  /** Per-document (band, bucket) keys, computed IN-ROW via a typed
    * flatMap — a plain JVM loop per row. (The batch form's explode →
    * groupBy signature aggregation cannot precede a stateful operator in
    * a stream; a per-row loop has no such restriction and no shuffle.)
    */
  def bandHits(spark: SparkSession, docs: DataFrame, k: Int = 32,
               bands: Int = 8): Dataset[BandHit] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, shs) =>
        hitsOf(shs, k, bands).map { case (b, bucket) =>
          BandHit(b, bucket, id)
        }
      }
  }

  /** THE shingle→(band, bucket) kernel — one definition shared by the
    * evicting and non-evicting tiers, so they can never bucket the same
    * document differently (the within-horizon-identical-semantics
    * contract depends on it).
    */
  private def hitsOf(shs: Seq[String], k: Int,
                     bands: Int): Iterator[(Int, Long)] =
    if (shs.isEmpty) Iterator.empty
    else bandBuckets(shs, k, bands).iterator.zipWithIndex
      .map { case (bucket, b) => (b, bucket) }

  /** Shared candidate kernel: fold a sorted batch of arrivals into the
    * bucket's representative set. Every arrival not already a
    * representative pairs against ALL current representatives; while the
    * set holds fewer than `maxReps`, the arrival then joins it. One
    * representative (the r3 form) had a recall gap the spec itself
    * exhibited: if the single representative is a false-positive bucket
    * member (fails downstream exact-Jaccard verify), every true pair
    * between LATER same-bucket arrivals is lost. A small representative
    * set (default 3) emits those later-twin pairs too — at ≤ maxReps
    * longs of state and ≤ maxReps pairs per arrival, still bounded — so
    * one bad representative cannot orphan its bucket. (maxReps = 1
    * reproduces the old keep-first-only behavior; the batch tier's
    * all-pairs-per-bucket join remains the full-recall reference.)
    */
  private def foldArrivals(reps0: Seq[Long], ids: Array[Long], band: Int,
                           maxReps: Int): (Seq[Long], List[CandPair]) = {
    var reps = reps0
    val out = List.newBuilder[CandPair]
    ids.foreach { id =>
      if (!reps.contains(id)) {
        reps.foreach { r =>
          out += CandPair(math.min(r, id), math.max(r, id), band)
        }
        if (reps.length < maxReps) reps = reps :+ id
      }
    }
    (reps, out.result())
  }

  /** Incremental candidate emission: per-(band, bucket) state keeps the
    * first `maxReps` documents seen (the bucket representatives — see
    * [[foldArrivals]]); every later arrival emits candidate pairs against
    * them. Within a micro-batch arrivals are ordered by doc_id so the
    * representative choice is deterministic under replay. State survives
    * restarts via the checkpoint (StreamingSpec proves a post-restart
    * twin still pairs against its pre-restart representatives, with no
    * re-emission of old pairs).
    *
    * State here never expires (NoTimeout) — the batch-analog posture for
    * bounded replays, RocksDB keeping the store off-heap. A TAILING
    * deployment (unbounded stream) must bound the store in time: use
    * [[candidatesEvicting]], which retires buckets the watermark has
    * passed.
    */
  def candidates(spark: SparkSession, docs: DataFrame, k: Int = 32,
                 bands: Int = 8, maxReps: Int = 3): Dataset[CandPair] = {
    import spark.implicits._
    bandHits(spark, docs, k, bands)
      .groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), hits: Iterator[BandHit],
         state: GroupState[Seq[Long]]) =>
          val ids = hits.map(_.doc_id).toArray.sorted.distinct
          val (reps, pairs) =
            foldArrivals(state.getOption.getOrElse(Seq.empty), ids,
              key._1, maxReps)
          state.update(reps)
          pairs.iterator
      }
  }

  /** [[BandHit]] carrying the document's event time, for the evicting
    * form's watermark bookkeeping.
    */
  case class BandHitT(band: Int, bucket: Long, doc_id: Long,
                      ts: java.sql.Timestamp)

  /** The TAILING form of [[candidates]] — r3 verdict item 6: bucket state
    * is retired once the EVENT-TIME watermark passes the bucket's last
    * arrival by `horizonMs`, so the (band, bucket) store is bounded by
    * the buckets touched within one horizon instead of growing with the
    * whole history of the stream. Docs need a `ts` column; `delay` is the
    * out-of-orderness tolerance passed to withWatermark.
    *
    * Semantics inside the horizon are identical to [[candidates]]
    * (same kernel, same determinism); ACROSS an eviction the recall
    * contract is explicitly horizon-bounded: a twin arriving after its
    * bucket was retired re-opens the bucket as a fresh representative
    * and pairs only with arrivals from then on — exactly the trade a
    * production tailing dedup makes (near-dups separated by more than
    * the horizon are handled by the periodic batch ladder, not the
    * stream). StreamingSpec drives the watermark forward and asserts
    * both the eviction and the intact within-horizon pairing.
    */
  def candidatesEvicting(spark: SparkSession, docs: DataFrame,
                         horizonMs: Long, delay: String = "0 seconds",
                         k: Int = 32, bands: Int = 8,
                         maxReps: Int = 3): Dataset[CandPair] = {
    import spark.implicits._
    val hits = docs
      .select(col("doc_id"), col("ts"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, java.sql.Timestamp, Seq[String])]
      .flatMap { case (id, ts, shs) =>
        hitsOf(shs, k, bands).map { case (b, bucket) =>
          BandHitT(b, bucket, id, ts)
        }
      }
    // watermark AFTER the typed flatMap: the event-time tag does not
    // survive the object (de)serialization boundary, so tagging the input
    // column fails the unsupported-operation check — tag the BandHitT
    // dataset's own ts instead (same event times, same semantics)
    hits.withWatermark("ts", delay)
      .groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), batch: Iterator[BandHitT],
         state: GroupState[Seq[Long]]) =>
          if (batch.isEmpty) { // timeout fired: watermark passed the bucket
            state.remove()
            Iterator.empty
          } else {
            val arr = batch.toArray
            val ids = arr.map(_.doc_id).sorted.distinct
            val (reps, pairs) =
              foldArrivals(state.getOption.getOrElse(Seq.empty), ids,
                key._1, maxReps)
            state.update(reps)
            // retire when the watermark passes last-arrival + horizon;
            // the max() guard keeps the timestamp ahead of the current
            // watermark even for a late straggler batch (setting a
            // timeout at-or-before the watermark is an error)
            val lastMs = arr.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastMs, state.getCurrentWatermarkMs() + 1) + horizonMs)
            pairs.iterator
          }
      }
  }

  // --------------------------------------------------- fuzzy decontamination

  case class FuzzyVerdict(doc_id: Long, is_contaminated: Boolean,
                          contaminated_by: Option[Long])

  /** Driver-built index of the (benchmark-sized) eval table for
    * streaming fuzzy decontamination: each eval doc's banded
    * (band, bucket) keys and its distinct shingle STRING set. Strings,
    * not hashes, on the verify side so the exact-Jaccard intersection is
    * bit-identical to the batch tier's shingle-equality join
    * (TextOps.fuzzyDecon) even under poly-hash collisions. Size is
    * O(|eval| × shingles/doc) — the same benchmark-sized-broadcast
    * posture as [[evalHashSet]].
    */
  def evalFuzzyIndex(evalDocs: DataFrame, k: Int = 32, bands: Int = 8)
      : (Map[(Int, Long), Seq[Long]], Map[Long, Set[String]]) = {
    val spark = evalDocs.sparkSession
    import spark.implicits._
    val rows = evalDocs.select(col("doc_id"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, Seq[String])].collect()
    val shingleSets = rows.map { case (id, s) => id -> s.toSet }.toMap
    val buckets = scala.collection.mutable.Map
      .empty[(Int, Long), List[Long]]
    rows.foreach { case (id, shs) =>
      if (shs.nonEmpty)
        bandBuckets(shs, k, bands).zipWithIndex.foreach { case (bucket, b) =>
          buckets((b, bucket)) = id :: buckets.getOrElse((b, bucket), Nil)
        }
    }
    (buckets.view.mapValues(_.sorted).toMap, shingleSets)
  }

  /** Streaming fuzzy decontamination — the stateless stream form of
    * TextOps.fuzzyDecon (d14): per arriving doc, one in-row loop
    * computes its band buckets (same kernel as the batch signatures),
    * votes candidate eval partners from the broadcast index
    * (≥ `minBandHits` shared bands), then exact-Jaccard-verifies
    * candidates in ascending eval-id order against the broadcast shingle
    * sets, stopping at the FIRST pass — which IS the batch op's
    * min(verified partner). Zero state, no watermark, composes anywhere
    * in a stream; verdicts match the batch op row-for-row
    * (StreamingSpec).
    *
    * Arrivals whose doc_id IS an eval doc (a key of `evalShingles`) are
    * DROPPED, mirroring batch fuzzyDecon's output contract (eval docs
    * are never verdicted) — without the guard an eval doc streamed in
    * would self-match at Jaccard 1 and be reported contaminated_by
    * itself (ADVICE r4).
    */
  def fuzzyVerdicts(spark: SparkSession, docs: DataFrame,
                    index: Map[(Int, Long), Seq[Long]],
                    evalShingles: Map[Long, Set[String]],
                    k: Int = 32, bands: Int = 8,
                    minBandHits: Int = 2): Dataset[FuzzyVerdict] = {
    import spark.implicits._
    val bcIdx = spark.sparkContext.broadcast(index)
    val bcSh = spark.sparkContext.broadcast(evalShingles)
    docs.select(col("doc_id"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, shs) =>
        if (bcSh.value.contains(id)) None
        else if (shs.isEmpty)
          Some(FuzzyVerdict(id, is_contaminated = false, None))
        else {
          val votes = scala.collection.mutable.Map.empty[Long, Int]
          bandBuckets(shs, k, bands).zipWithIndex.foreach { case (bucket, b) =>
            bcIdx.value.get((b, bucket)).foreach(_.foreach { e =>
              votes(e) = votes.getOrElse(e, 0) + 1
            })
          }
          val n1 = shs.length // shingles3 is distinct per doc
          val hit = votes.iterator
            .collect { case (e, v) if v >= minBandHits => e }
            .toArray.sorted
            .find { e =>
              val es = bcSh.value(e)
              val inter = shs.count(es.contains)
              inter * 10 >= (n1 + es.size - inter) * 5
            }
          Some(FuzzyVerdict(id, hit.isDefined, hit))
        }
      }
  }
}
