package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal-column plumbing: binary attach, per-partition stub decode,
  * resize planning, frame sampling, feature extraction. The decode/extract
  * bodies are stubs (no codec libs in this container) — these specs pin the
  * Spark-side contract: schemas, partition-batch shape, edge arithmetic,
  * determinism.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("withBinary tags media_type by doc_id mod 3 and casts text to bytes") {
    val out = Multimodal.withBinary(docs(0L -> "aa", 1L -> "bbb", 2L -> "c"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("media_type")).toSeq ==
      Seq("image", "audio", "video"))
    assert(out(0).getAs[Array[Byte]]("media").toSeq == "aa".getBytes("UTF-8").toSeq)
  }

  test("decodeMeta matches StubDecoder row-for-row and keeps one decode per row") {
    val src = docs(0L -> "hello", 1L -> "x", 2L -> ("y" * 700))
    val metas = Multimodal.decodeMeta(spark, Multimodal.withBinary(src))
      .collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.media_type, m.n_bytes)).toSeq ==
      Seq((0L, "image", 5), (1L, "audio", 1), (2L, "video", 700)))
    // arithmetic parity with the stub, including the wraparound row (700 % 640)
    val m2 = metas(2)
    assert(m2.width == 700 % 640 + 1 && m2.height == (700 * 7) % 480 + 1 &&
      m2.n_frames == 700 % 30 + 1)
  }

  test("resizeDims preserves aspect: longest side hits target, other floors") {
    val meta = Seq(
      (1L, 640, 480), // landscape
      (2L, 480, 640), // portrait
      (3L, 100, 100), // square
      (4L, 1, 480),   // extreme aspect: short side would floor to 0 — clamped to 1
      (5L, 224, 224)  // already target
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.resizeDims(meta).orderBy("doc_id")
      .select("out_w", "out_h").as[(Int, Int)].collect().toSeq
    assert(out == Seq((224, 168), (168, 224), (224, 224), (1, 224), (224, 224)))
  }

  test("sampleFrames keeps only video rows, stride ceil-free max(n/4,1)") {
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

  test("extractFeatures emits nFeatures long-format rows per doc, deterministic") {
    val media = Multimodal.withBinary(docs(7L -> "abc"))
    val feats = Multimodal.extractFeatures(spark, media, nFeatures = 4)
      .collect().sortBy(_.feat_idx)
    assert(feats.map(_.feat_idx).toSeq == Seq(0, 1, 2, 3))
    // byteSum("abc") = 97+98+99 = 294, n = 3
    val expected = (0 until 4).map(k => (3L * (k + 1) + 294L * (k.toLong * k + 1)) % 100000L)
    assert(feats.map(_.value).toSeq == expected)
    // empty payload is defined (all zero-derived), not a crash
    val empty = Multimodal.extractFeatures(spark,
      Multimodal.withBinary(docs(1L -> "")), nFeatures = 2).collect()
    assert(empty.map(_.value).toSeq == Seq(0L, 0L))
  }

  test("decode/extract stay partition-batched (single mapPartitions, no shuffle)") {
    val media = Multimodal.withBinary(docs((1L to 20L).map(i => i -> s"doc$i"): _*))
    for (plan <- Seq(
      Multimodal.decodeMeta(spark, media).queryExecution.executedPlan,
      Multimodal.extractFeatures(spark, media).queryExecution.executedPlan)) {
      val s = plan.toString
      assert(!s.contains("Exchange"), s"unexpected shuffle in:\n$s")
    }
  }
}
