package graft

import org.apache.spark.sql.functions._
import graft.functions.MediaCodecs
import graft.operators.Multimodal

/** Multimodal tier: real-container generation, per-partition decode,
  * resize planning, frame sampling, payload feature extraction. The
  * codecs themselves are validated against the JDK's ImageIO /
  * AudioSystem in MediaCodecsSpec; these specs pin the Spark-side
  * contract — schemas, partition-batch shape, the generator↔decoder
  * round-trip, edge arithmetic, determinism.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("synthesizeMedia emits real containers tagged by doc_id mod 3") {
    val out = Multimodal.synthesizeMedia(spark,
        docs(0L -> "aa", 1L -> "bbb", 2L -> "c"))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    // image: a genuine PNG whose pixels are the text bytes
    val png = MediaCodecs.decodePng(out(0).media)
    assert(png.width == 3 && png.height == 1) // "aa": n=2, w=2%64+1=3, pad 1
    assert(png.pixels.toSeq == "aa".getBytes("UTF-8").toSeq :+ 0.toByte)
    // audio: a genuine WAV whose samples are the text bytes
    val wav = MediaCodecs.decodeWav(out(1).media)
    assert(wav.sampleRate == 8000 &&
      wav.samples.toSeq == "bbb".getBytes("UTF-8").toSeq)
    // video: a genuine animated GIF, n%30+1 = 2 frames of (id+f)%256
    val gif = MediaCodecs.decodeGif(out(2).media)
    assert(gif.width == 4 && gif.height == 4 && gif.frames.length == 2)
    assert(gif.frames(0).forall(_ == 2.toByte) &&
      gif.frames(1).forall(_ == 3.toByte))
  }

  test("decodeMeta parses the real containers back: dims, frames, samples") {
    val src = docs(0L -> "hello", 1L -> "x", 2L -> ("y" * 700))
    val metas = Multimodal.decodeMeta(spark,
        Multimodal.synthesizeMedia(spark, src).toDF())
      .collect().sortBy(_.doc_id)
    val img = metas(0) // n=5: w=6, h=1
    assert(img.format == "png" && img.width == 6 && img.height == 1 &&
      img.n_frames == 1 && img.sample_rate == 0)
    // PNG size closed-form: 8 + 25 + (12 + 2 + 5 + L + 4) + 12, L=h*(w+1)
    assert(img.n_bytes == 8 + 25 + 12 + 2 + 5 + 1 * 7 + 4 + 12)
    val aud = metas(1) // n=1 sample
    assert(aud.format == "wav" && aud.sample_rate == 8000 &&
      aud.n_samples == 1L && aud.duration_ms == 0L && aud.width == 0)
    assert(aud.n_bytes == 44 + 1 + 1) // odd data → RIFF pad byte
    val vid = metas(2) // n=700: 700%30+1 = 11 frames
    assert(vid.format == "gif" && vid.width == 4 && vid.height == 4 &&
      vid.n_frames == 11)
    assert(vid.n_bytes == 782 + 42 * 11)
  }

  test("audio duration_ms is integer-exact n_samples*1000/rate") {
    val meta = Multimodal.decodeMeta(spark,
        Multimodal.synthesizeMedia(spark, docs(1L -> ("s" * 900))).toDF())
      .collect().head
    assert(meta.n_samples == 900L && meta.duration_ms == 900L * 1000 / 8000)
  }

  test("resizeDims keeps image rows only, preserves aspect, clamps to 1px") {
    val meta = Seq(
      (1L, "image", 640, 480), // landscape
      (2L, "image", 480, 640), // portrait
      (3L, "image", 100, 100), // square
      (4L, "image", 1, 480),   // extreme aspect: short side clamps to 1
      (5L, "image", 224, 224), // already target
      (6L, "audio", 0, 0)      // dropped (no dims to resize)
    ).toDF("doc_id", "media_type", "width", "height")
    val out = Multimodal.resizeDims(meta).orderBy("doc_id")
      .select("out_w", "out_h").as[(Int, Int)].collect().toSeq
    assert(out == Seq((224, 168), (168, 224), (224, 224), (1, 224), (224, 224)))
  }

  test("sampleFrames keeps only video rows, stride max(n/4,1)") {
    val meta = Seq(
      (1L, "video", 10), // stride 2 -> 0,2,4,6,8
      (2L, "video", 3),  // stride max(0,1)=1 -> 0,1,2
      (3L, "image", 1)   // dropped
    ).toDF("doc_id", "media_type", "n_frames")
    val out = Multimodal.sampleFrames(meta)
      .groupBy("doc_id").agg(collect_list("frame_idx").as("f"))
      .orderBy("doc_id").as[(Long, Seq[Int])].collect().toSeq
    assert(out == Seq((1L, Seq(0, 2, 4, 6, 8)), (2L, Seq(0, 1, 2))))
  }

  test("extractFeatures computes over the DECODED payload per format") {
    val media = Multimodal.synthesizeMedia(spark,
      docs(0L -> "abc", 1L -> "abc", 2L -> "abc"))
    val feats = Multimodal.extractFeatures(spark, media.toDF(), nFeatures = 2)
      .collect().map(f => (f.doc_id, f.feat_idx) -> f.value).toMap
    def expect(n: Long, bsum: Long, k: Int): Long =
      (n * (k + 1) + bsum * (k.toLong * k + 1)) % 100000L
    // image doc 0: "abc" n=3 → w=4, h=1 → 4 pixels incl 1 pad zero
    val tsum = "abc".getBytes("UTF-8").map(_ & 0xff).sum.toLong
    assert(feats((0L, 0)) == expect(4L, tsum, 0))
    assert(feats((0L, 1)) == expect(4L, tsum, 1))
    // audio doc 1: samples are exactly the text bytes
    assert(feats((1L, 0)) == expect(3L, tsum, 0))
    // video doc 2: 3%30+1=4 frames × 16 pixels of (2+f)%256
    val vsum = (0 until 4).map(f => 16L * ((2 + f) % 256)).sum
    assert(feats((2L, 0)) == expect(64L, vsum, 0))
    assert(feats((2L, 1)) == expect(64L, vsum, 1))
  }

  test("empty text is a valid asset in every format") {
    val metas = Multimodal.decodeMeta(spark,
        Multimodal.synthesizeMedia(spark,
          docs(0L -> "", 1L -> "", 2L -> "")).toDF())
      .collect().sortBy(_.doc_id)
    assert(metas(0).width == 1 && metas(0).height == 1) // 1 pad pixel
    assert(metas(1).n_samples == 0L)
    assert(metas(2).n_frames == 1)
    val feats = Multimodal.extractFeatures(spark,
        Multimodal.synthesizeMedia(spark, docs(1L -> "")).toDF(),
        nFeatures = 2)
      .collect().map(_.value).toSeq
    assert(feats == Seq(0L, 0L)) // empty payload → all-zero features
  }

  test("perceptualHash: identical pixels → identical prints; a 1-pixel " +
    "edit stays hamming-close; near-dup pairs verify through the bands") {
    // content whose global mean lands BETWEEN the two letter values
    // (mostly-'z' with an 'a' minority): mean ≈ 116 ∈ ('a'=97, 'z'=122),
    // so segment bits actually track WHERE the 'a' run sits — a
    // balanced half/half profile is degenerate (zero padding drags the
    // mean below every letter and all content bits read 1)
    val base = "a" * 41 + "z" * 150              // n=191 ⇒ w=64, 1 pad px
    val onePx = base.updated(100, 'y')           // same length ⇒ same layout
    val unrelated = "z" * 150 + "a" * 41         // 'a' run at the far end
    val media = Multimodal.synthesizeMedia(spark,
      docs(3L -> base, 6L -> base, 9L -> onePx, 12L -> unrelated)).toDF()
    val fp = Multimodal.perceptualHash(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(fp.keySet == Set(3L, 6L, 9L, 12L))
    // identical pixel streams → bit-identical prints
    assert(fp(3L).ahash == fp(6L).ahash && fp(3L).shash == fp(6L).shash)
    // one substituted pixel flips at most a couple of mean comparisons
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(3L).shash, fp(9L).shash) <= 4)
    assert(ham(fp(3L).ahash, fp(9L).ahash) <= 4)
    // unrelated content is far in the stream hash
    assert(ham(fp(3L).shash, fp(12L).shash) > 8)
    // the banded pair op finds exactly the dup + near-dup family
    val pairs = Multimodal.mediaNearDupPairs(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 6L)) && pairs.contains((3L, 9L)), pairs)
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L), pairs)
  }

  test("generate/decode/extract stay partition-batched (no shuffle)") {
    val media = Multimodal.synthesizeMedia(spark,
      docs((1L to 20L).map(i => i -> s"doc$i"): _*)).toDF()
    for (plan <- Seq(
      Multimodal.decodeMeta(spark, media).queryExecution.executedPlan,
      Multimodal.extractFeatures(spark, media).queryExecution.executedPlan)) {
      val s = plan.toString
      assert(!s.contains("Exchange"), s"unexpected shuffle in:\n$s")
    }
  }

  test("audioEnergyWindows: hand-computed energies over a real WAV " +
      "round-trip; tail window length-robust; audio rows only") {
    // doc 1 (audio): 5 chars — one window of 3, one tail of 2 at window=3
    val media = Multimodal.synthesizeMedia(spark,
      docs(0L -> "img", 1L -> "ab cd", 2L -> "vid")).toDF()
    val out = Multimodal.audioEnergyWindows(spark, media, window = 3,
        thrPerSample = 1000L)
      .collect().sortBy(_.win_idx)
    assert(out.forall(_.doc_id == 1L))       // image/video rows excluded
    assert(out.map(w => (w.win_idx, w.win_len)).toSeq ==
      Seq((0L, 3L), (1L, 2L)))
    def e(cs: String) = cs.map { c => val v = c.toLong - 128; v * v }.sum
    assert(out(0).energy == e("ab "))        // 31² + 30² + 96² = 11 077
    assert(out(1).energy == e("cd"))         // 29² + 28² = 1 625
    // threshold is per-sample cross-multiplied: 11077 >= 3000 active,
    // 1625 < 2000 inactive — the short tail is judged on ITS length
    assert(out(0).active && !out(1).active)
  }

  test("sceneCuts: hand-built GIF — luma sums from decoded frames, " +
      "in-row lag, per-pixel threshold flags only the real cut") {
    import spark.implicits._
    // four 2x2 frames: two near-identical dark shots, a hard cut to a
    // bright shot, then a near-identical bright frame
    val frames = Seq(
      Array.fill(4)(10.toByte), Array.fill(4)(12.toByte),
      Array.fill(4)(200.toByte), Array.fill(4)(195.toByte))
    val gif = graft.functions.MediaCodecs.encodeGif(frames, 2, 2)
    val media = Seq((7L, "video", gif), (8L, "audio", gif))
      .toDF("doc_id", "media_type", "media")
    val out = Multimodal.sceneCuts(spark, media, thrPerPixel = 64L)
      .collect().sortBy(_.frame_idx)
    assert(out.forall(_.doc_id == 7L))       // non-video rows excluded
    assert(out.map(_.luma_sum).toSeq == Seq(40L, 48L, 800L, 780L))
    assert(out.map(_.delta).toSeq == Seq(0L, 8L, 752L, 20L))
    // only the 12→200 transition clears 64/pixel × 4 pixels = 256
    assert(out.map(_.is_cut).toSeq == Seq(false, false, true, false))
    // the generator's videos: every cut is a 255→0 wrap of (d+f)%256
    val gen = Multimodal.synthesizeMedia(spark,
      docs(250L -> ("x " * 6), 251L -> ("y " * 6))).toDF()
    // doc 251 % 3 == 2 is the video row: 13 frames, lumas 16·((251+f)%256)
    // wrap at f=5 (255→0): delta 16·255 = 4080 — the single cut
    val cuts = Multimodal.sceneCuts(spark, gen).collect()
      .filter(_.is_cut).map(c => (c.doc_id, c.frame_idx, c.delta)).toSeq
    assert(cuts == Seq((251L, 5L, 4080L)), cuts.toString)
  }
}
