package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MediaCodecs

/** Multimodal-column tier: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The media bytes are REAL container formats, built and parsed by the
  * pure-JVM codecs in [[graft.functions.MediaCodecs]] (PNG with zlib
  * IDAT + CRCs, RIFF/WAV PCM, animated GIF with genuine LZW — all
  * cross-validated against javax.imageio / javax.sound.sampled in
  * MediaCodecsSpec). [[synthesizeMedia]] derives each asset
  * deterministically from the document row, so the DuckDB oracle can
  * replay the dimension/size arithmetic while the engine round-trips
  * the actual bytes: generator → real file → sniff → parse → metadata.
  *
  * Scale shape: generation, decode, and feature extraction are all
  * mapPartitions over a typed Dataset — one decoder/codec context per
  * PARTITION (the real-codec init-cost pattern), rows streaming through
  * the iterator, no shuffle anywhere in the tier. At 100 TB the media
  * column dominates row size; nothing here ever moves it across an
  * exchange — metadata (a few ints per row) is all that leaves the scan
  * stage.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])

  /** Unified per-asset metadata: image/video rows fill width/height/
    * n_frames, audio rows fill sample_rate/n_samples/duration_ms, the
    * other family's fields are 0 — one long-format relation a curation
    * pipeline can filter by `media_type` without schema gymnastics.
    */
  case class MediaMeta(doc_id: Long, media_type: String, format: String,
                       n_bytes: Long, width: Int, height: Int, n_frames: Int,
                       sample_rate: Int, n_samples: Long, duration_ms: Long)

  /** Deterministic real-asset generator (the test/bench data source —
    * a production deployment reads existing media bytes instead):
    *
    *  - image rows (doc_id % 3 == 0): the text's UTF-8 bytes as 8-bit
    *    grayscale pixels in a REAL PNG, width = n % 64 + 1, height =
    *    ceil(n/width) (zero-padded last row);
    *  - audio rows (% 3 == 1): the text bytes as 8-bit PCM samples in a
    *    REAL WAV at 8 kHz mono;
    *  - video rows (% 3 == 2): an animated 4×4 GIF with n % 30 + 1
    *    frames, frame f's 16 pixels all (doc_id + f) % 256.
    *
    * Byte-for-byte deterministic (no timestamps/metadata in the
    * encoders), so every downstream query is hash-exact cross-engine.
    */
  def synthesizeMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"),
        element_at(
          typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, mt) =>
          val bytes =
            if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
          val media = mt match {
            case "image" => MediaCodecs.encodePng(bytes, bytes.length % 64 + 1)
            case "audio" => MediaCodecs.encodeWav(bytes)
            case _ =>
              val f = bytes.length % 30 + 1
              MediaCodecs.encodeGif(
                (0 until f).map(i =>
                  Array.fill(16)(((id + i) % 256).toByte)), 4, 4)
          }
          MediaRow(id, mt, media)
        }
      }
  }

  private def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P') "png"
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F') "wav"
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else throw new IllegalArgumentException(
      s"unrecognized media container (${b.length} bytes)")

  /** Batch decode: sniff the container by magic bytes (real decoders
    * trust the bytes, not the tag — the tag rides through for
    * downstream filters) and parse with the full-format codecs. Typed
    * Dataset + mapPartitions: decoder state once per partition, rows
    * stream through the iterator.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.media.length.toLong
          sniff(r.media) match {
            case "png" =>
              val p = MediaCodecs.decodePng(r.media)
              MediaMeta(r.doc_id, r.media_type, "png", n,
                p.width, p.height, 1, 0, 0L, 0L)
            case "wav" =>
              val w = MediaCodecs.decodeWav(r.media)
              MediaMeta(r.doc_id, r.media_type, "wav", n, 0, 0, 0,
                w.sampleRate, w.nSamples.toLong,
                w.nSamples.toLong * 1000L / w.sampleRate)
            case _ =>
              val g = MediaCodecs.decodeGif(r.media)
              MediaMeta(r.doc_id, r.media_type, "gif", n,
                g.width, g.height, g.frames.length, 0, 0L, 0L)
          }
        }
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

  /** Resize planning: longest-side-to-`target` output dimensions per
    * IMAGE row (the aspect-preserving letterbox arithmetic every image
    * pipeline runs before decode-resize). Integer-exact — the actual
    * pixel resample belongs inside the per-partition decoder; the PLAN
    * is engine-side and oracle-checkable.
    */
  def resizeDims(meta: DataFrame, target: Int = 224): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    // clamp to 1px: an extreme aspect ratio (1×480) would otherwise floor
    // the short side to 0 — an invalid plan no decoder can execute
    def out(side: Column) =
      greatest(floor(side * target / longest), lit(1)).cast("int")
    meta.filter(col("media_type") === "image")
      .select(col("doc_id"), col("width"), col("height"),
        out(col("width")).as("out_w"),
        out(col("height")).as("out_h"))
  }

  case class MediaFeature(doc_id: Long, feat_idx: Int, value: Long)

  /** Feature extraction over the DECODED payload — pixels for PNG
    * (including the zero pad of the last row), PCM samples for WAV,
    * all frames' pixel indexes concatenated for GIF — not the raw file
    * bytes: a real embedding model consumes decoded content, and the
    * decode here is the genuine parse (inflate, un-filter, LZW). The
    * integer feature family over (payload length, byte sum) stands in
    * for the model forward pass so the plumbing stays oracle-exact;
    * same per-partition contract as [[decodeMeta]] (a real extractor
    * loads weights once per partition, then streams rows).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      nFeatures: Int = 8): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real extractor: load weights / open the accelerator here, once
        rows.flatMap { r =>
          val payload: Array[Byte] = sniff(r.media) match {
            case "png" => MediaCodecs.decodePng(r.media).pixels
            case "wav" => MediaCodecs.decodeWav(r.media).samples
            case _     => MediaCodecs.decodeGif(r.media).frames.toArray.flatten
          }
          var byteSum = 0L
          payload.foreach(b => byteSum += (b & 0xff))
          val n = payload.length.toLong
          (0 until nFeatures).iterator.map { k =>
            MediaFeature(r.doc_id, k,
              (n * (k + 1) + byteSum * (k.toLong * k + 1)) % 100000L)
          }
        }
      }
  }

  case class MediaFingerprint(doc_id: Long, width: Int, height: Int,
                              ahash: Long, shash: Long)

  /** m5 — perceptual fingerprints over DECODED image pixels (the media
    * arm of the dedup ladder): `ahash` is the classic average-hash on an
    * 8×8 block grid over the image's own dimensions (bit = block mean >
    * global mean — resize-robust, the pHash-family screen every image
    * dedup pipeline runs first), `shash` is its 1D sibling over the raw
    * pixel STREAM in 64 equal segments (reflow-robust: two images whose
    * byte streams are near-identical but whose widths differ — re-wrapped
    * scans, row-major re-encodes — keep close shash where ahash
    * diverges). All comparisons are exact-integer cross-multiplied
    * (blockSum·N > globalSum·blockCount), so the DuckDB oracle replays
    * both hashes bit-for-bit from the generator's pixel arithmetic while
    * the engine round-trips REAL container bytes through the full PNG
    * decode (zlib, CRCs).
    *
    * Scale shape: per-row mapPartitions over the decoded payload —
    * embarrassingly parallel, media bytes never cross an exchange; what
    * shuffles downstream ([[mediaNearDupPairs]]) is two longs per image.
    */
  def perceptualHash(spark: SparkSession,
                     media: DataFrame): Dataset[MediaFingerprint] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = MediaCodecs.decodePng(bytes)
          val w = img.width; val h = img.height
          val px = img.pixels
          val n = w.toLong * h
          var gs = 0L
          var i = 0
          while (i < px.length) { gs += px(i) & 0xff; i += 1 }
          var ah = 0L
          var bi = 0
          while (bi < 8) {
            val r0 = bi * h / 8; val r1 = (bi + 1) * h / 8
            var bj = 0
            while (bj < 8) {
              val c0 = bj * w / 8; val c1 = (bj + 1) * w / 8
              var bs = 0L
              var r = r0
              while (r < r1) {
                var c = c0
                while (c < c1) { bs += px(r * w + c) & 0xff; c += 1 }
                r += 1
              }
              val bc = (r1 - r0).toLong * (c1 - c0)
              if (bs * n > gs * bc) ah |= 1L << (bi * 8 + bj)
              bj += 1
            }
            bi += 1
          }
          var sh = 0L
          var s = 0
          while (s < 64) {
            val p0 = s * px.length / 64; val p1 = (s + 1) * px.length / 64
            var ss = 0L
            var p = p0
            while (p < p1) { ss += px(p) & 0xff; p += 1 }
            if (ss * n > gs * (p1 - p0).toLong) sh |= 1L << s
            s += 1
          }
          MediaFingerprint(id, w, h, ah, sh)
        }
      }
  }

  case class AudioSpan(doc_id: Long, win_idx: Long, win_len: Long,
                         energy: Long, active: Boolean)

  /** m6 — windowed audio energy segmentation (the VAD-shaped first pass
    * every speech-data pipeline runs before transcription: cut the
    * stream into fixed windows, score each window's energy, keep the
    * active spans). The engine round-trips REAL WAV bytes — the RIFF
    * walk + 8-bit PCM extraction is the genuine parse — then computes
    * per-window energy Σ(sample−128)² in-row; `active` is the
    * cross-multiplied integer threshold energy ≥ thrPerSample·win_len
    * (length-robust for the short tail window, no float ratios). A real
    * VAD model replaces the energy formula inside the same
    * per-partition boundary; everything around it — decode, window
    * fan-out, schema, threshold gate — is the production plumbing.
    *
    * Scale shape: per-row mapPartitions over the decoded payload,
    * embarrassingly parallel; media bytes never cross an exchange; the
    * fan-out is bounded by samples/window per row.
    */
  def audioEnergyWindows(spark: SparkSession, media: DataFrame,
                         window: Int = 50,
                         thrPerSample: Long = 2000L): Dataset[AudioSpan] = {
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val s = MediaCodecs.decodeWav(r.media).samples
          s.grouped(window).zipWithIndex.map { case (w, i) =>
            var e = 0L
            w.foreach { b => val v = (b & 0xff) - 128L; e += v * v }
            AudioSpan(r.doc_id, i.toLong, w.length.toLong, e,
              e >= thrPerSample * w.length)
          }
        }
      }
  }

  case class FrameCut(doc_id: Long, frame_idx: Long, luma_sum: Long,
                      delta: Long, is_cut: Boolean)

  /** m7 — scene-cut detection over decoded video frames: per frame, the
    * exact luma sum (Σ of the frame's pixel bytes), the absolute delta
    * vs the PREVIOUS frame, and a cut verdict
    * `delta ≥ thrPerPixel · n_pixels` (cross-multiplied integers — a
    * per-pixel mean-luma threshold that's frame-size-robust). Mean-luma
    * frame difference is the classic cheap first pass of scene-cut /
    * keyframe detection (the shot-boundary screen a video curation
    * pipeline runs before sampling m4's frames, so keyframes land on
    * content changes instead of a blind stride); a histogram or SSIM
    * detector replaces the delta formula inside the same per-partition
    * boundary. Frame 0 reports delta 0, never a cut.
    *
    * The engine round-trips REAL GIF bytes — genuine LZW decode — and
    * the frame lag runs IN-ROW over the decoded frame sequence (a
    * video's frames live in one row; no window function, no shuffle).
    * The oracle replays the generator's pixel arithmetic (frame f of
    * doc d is 16 bytes of (d+f)%256, so luma_sum = 16·((d+f)%256) and
    * the only big deltas are the 255→0 wraps — real cuts, replayable).
    *
    * Scale shape: per-row mapPartitions, embarrassingly parallel, media
    * bytes never cross an exchange; fan-out bounded by frames/row.
    */
  def sceneCuts(spark: SparkSession, media: DataFrame,
                thrPerPixel: Long = 64L): Dataset[FrameCut] = {
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val g = MediaCodecs.decodeGif(r.media)
          var prev = 0L
          g.frames.zipWithIndex.map { case (px, f) =>
            var s = 0L
            var i = 0
            while (i < px.length) { s += px(i) & 0xff; i += 1 }
            val d = if (f == 0) 0L else math.abs(s - prev)
            prev = s
            FrameCut(r.doc_id, f.toLong, s, d,
              f > 0 && d >= thrPerPixel * px.length)
          }
        }
      }
  }

  /** Media near-dup pairs over the stream fingerprint: d3's SimHash
    * screen transplanted to decoded pixels — 4×16-bit bands of `shash`
    * bucket-join (ids + one long only), exact 64-bit hamming verify on
    * collisions. A pair survives iff ≥1 band matches exactly AND total
    * hamming ≤ maxHamming — linear candidate volume, never n² images.
    */
  def mediaNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 8): DataFrame = {
    val fp = perceptualHash(spark, media).toDF()
    val banded = fp.select(col("doc_id"), col("shash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("shash"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.shash").as("h1"), col("b.shash").as("h2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc1"), col("doc2"), col("hamming"))
  }
}
