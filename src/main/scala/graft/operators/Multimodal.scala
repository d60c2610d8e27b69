package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The Spark-side contract is real and tested — schema, partition-batch
  * shape (mapPartitions over an iterator, one decoder init per partition,
  * not per row), deterministic outputs. The DECODE ITSELF IS A STUB
  * (`StubDecoder.decode`): this container has no image/audio libs, so it
  * derives deterministic fake dimensions from the bytes; a real deployment
  * swaps in e.g. a JNI decoder behind the same per-partition boundary.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
                       width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake in place of a codec library. The
    * per-partition init cost a real decoder would pay is modeled by the
    * mapPartitions boundary in [[decodeMeta]].
    */
  object StubDecoder {
    def decode(docId: Long, mediaType: String, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      MediaMeta(docId, mediaType, n,
        width = n % 640 + 1,
        height = (n * 7) % 480 + 1,
        n_frames = if (mediaType == "video") n % 30 + 1 else 1)
    }
  }

  /** Attach an opaque binary payload (here: the utf-8 text bytes standing
    * in for image/audio content) + a media_type tag. Pure projection.
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      element_at(
        typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** Batch decode: typed Dataset + mapPartitions — decoder state is
    * initialized once per partition (the real-codec pattern), rows stream
    * through the iterator without materializing the partition.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real decoder: init codec context here, once per partition
        rows.map(r => StubDecoder.decode(r.doc_id, r.media_type, r.media))
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame index
    * (every ceil(n/4)th frame) — the explode-shaped fan-out a frame-level
    * feature extractor consumes.
    */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          greatest((col("n_frames") / 4).cast("int"), lit(1)))).as("frame_idx"))

  /** Resize planning: longest-side-to-`target` output dimensions per media
    * row (the aspect-preserving letterbox arithmetic every image pipeline
    * runs before decode-resize). Integer-exact — the actual pixel resample
    * belongs inside the per-partition decoder; the PLAN is engine-side and
    * oracle-checkable.
    */
  def resizeDims(meta: DataFrame, target: Int = 224): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    // clamp to 1px: an extreme aspect ratio (1×480) would otherwise floor
    // the short side to 0 — an invalid plan no decoder can execute
    def out(side: Column) =
      greatest(floor(side * target / longest), lit(1)).cast("int")
    meta.select(col("doc_id"), col("width"), col("height"),
      out(col("width")).as("out_w"),
      out(col("height")).as("out_h"))
  }

  case class MediaFeature(doc_id: Long, feat_idx: Int, value: Long)

  /** STUB feature extraction over the raw bytes — the embedding-model slot.
    * Same per-partition contract as [[decodeMeta]] (a real extractor loads
    * model weights once per partition, then streams rows); the stub emits
    * deterministic integer features of (length, byte-sum) so the plumbing
    * is end-to-end oracle-checkable. Exploded (doc_id, feat_idx, value)
    * rows — the long-format feature table a trainer consumes.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      nFeatures: Int = 8): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real extractor: load weights / open the accelerator here, once
        rows.flatMap { r =>
          var byteSum = 0L
          r.media.foreach(b => byteSum += (b & 0xff))
          val n = r.media.length.toLong
          (0 until nFeatures).iterator.map { k =>
            MediaFeature(r.doc_id, k,
              (n * (k + 1) + byteSum * (k.toLong * k + 1)) % 100000L)
          }
        }
      }
  }
}
