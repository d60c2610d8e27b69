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

  /** Per-document (band, bucket) keys, computed IN-ROW via a typed
    * flatMap — a plain JVM loop per row. (The batch form's explode →
    * groupBy signature aggregation cannot precede a stateful operator in
    * a stream; a per-row loop has no such restriction and no shuffle.)
    */
  def bandHits(spark: SparkSession, docs: DataFrame, k: Int = 32,
               bands: Int = 8): Dataset[BandHit] = {
    import spark.implicits._
    val r = k / bands
    docs.select(col("doc_id"),
        graft.functions.shingles3(split(col("text"), " ")).as("shs"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, shs) =>
        if (shs.isEmpty) Iterator.empty
        else {
          val phs = shs.map(s =>
            TextHashes.polyHash31(UTF8String.fromString(s)))
          val mins = Array.tabulate(k) { i =>
            var m = Long.MaxValue
            phs.foreach { ph =>
              val h = (ph * (2L * i + 1) + i.toLong * i + 1) % P31
              if (h < m) m = h
            }
            m
          }
          (0 until bands).iterator.map { b =>
            var acc = b.toLong
            var j = 0
            while (j < r) { acc = (acc * 1000003L + mins(b * r + j)) % P31; j += 1 }
            BandHit(b, acc, id)
          }
        }
      }
  }

  /** Incremental candidate emission: per-(band, bucket) state keeps the
    * FIRST document seen (the bucket representative — the keep-first
    * policy of the batch dedup); every later arrival emits one candidate
    * pair against it. Within a micro-batch arrivals are ordered by doc_id
    * so the representative choice is deterministic under replay. State
    * survives restarts via the checkpoint (StreamingSpec proves a
    * post-restart twin still pairs against its pre-restart
    * representative, with no re-emission of old pairs).
    */
  def candidates(spark: SparkSession, docs: DataFrame, k: Int = 32,
                 bands: Int = 8): Dataset[CandPair] = {
    import spark.implicits._
    bandHits(spark, docs, k, bands)
      .groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), hits: Iterator[BandHit], state: GroupState[Long]) =>
          val ids = hits.map(_.doc_id).toArray.sorted.distinct
          val rep = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(rep)
          ids.iterator.filter(_ != rep).map(id =>
            CandPair(math.min(rep, id), math.max(rep, id), key._1))
      }
  }
}
