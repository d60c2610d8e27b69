package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Transcripts
import graft.streaming.TranscriptStream

/** Streaming variant: file-source micro-batches through the same operators,
  * exactly-once foreachBatch sinks, watermarked windows, and custom
  * per-conversation state.
  */
class StreamingSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_stream").toString

  private lazy val batchTurns =
    Transcripts.transcripts(spark, "/root/testdata/sf0.001").cache()
  private lazy val toolDim = Transcripts.toolDim(spark)

  test("streaming routing equals batch pipeline; restart resumes, no dupes") {
    val base = tmp()
    val in = s"$base/in"
    val sink = s"$base/sink"
    val ledger = s"$base/ledger"
    val ckpt = s"$base/ckpt"

    val half1 = batchTurns.filter(col("ts") <= lit("2024-01-15").cast("timestamp"))
    half1.write.mode("append").parquet(in)

    val q1 = TranscriptStream.startRouting(
      TranscriptStream.readTurns(spark, in), toolDim, sink, ledger, ckpt)
    q1.awaitTermination()

    // second tranche arrives; a NEW query resumes from the same checkpoint
    batchTurns.filter(col("ts") > lit("2024-01-15").cast("timestamp"))
      .write.mode("append").parquet(in)
    val q2 = TranscriptStream.startRouting(
      TranscriptStream.readTurns(spark, in), toolDim, sink, ledger, ckpt)
    q2.awaitTermination()

    val expected = Pipeline.route(Pipeline.enrich(
      parsedValid(batchTurns), toolDim))
    val committed = spark.read.parquet(sink)
    assert(committed.count() == expected.count())
    assert(committed.select("conv_id", "turn_idx").distinct().count() ==
      committed.count())
    val got = committed.groupBy("sink").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Pipeline.sinkCounts(expected).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("streaming near-dup candidates: state survives restart, no pair re-emission") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val base = tmp()
    val in = s"$base/in"
    val out = s"$base/out"
    val ck = s"$base/ck"
    def doc(id: Long, seed: String) =
      (id, (1 to 30).map(i => s"$seed$i").mkString(" "))
    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .parquet(in)
      val q = StreamDedup.candidates(spark, stream).toDF().writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // tranche 1: doc 2 is an exact twin of doc 1; 3-5 unrelated
    Seq(doc(1, "a"), doc(2, "a"), doc(3, "b"), doc(4, "c"), doc(5, "d"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    run()
    val first = spark.read.parquet(out).as[StreamDedup.CandPair].collect()
    assert(first.map(p => (p.doc1, p.doc2)).toSet == Set((1L, 2L)))
    assert(first.length == 8, "twin collides in all 8 bands")
    // tranche 2 after restart: doc 6 twins doc 1 again, doc 7 unrelated.
    // The representatives (docs 1 AND 2 — doc 2 joined the set when it
    // arrived) live only in CHECKPOINTED state — the new query must pair
    // 6 against BOTH, and must NOT re-emit (1,2). (2,6) is exactly the
    // pair the r3 single-representative form lost: had doc 1 been a
    // false-positive bucket member, its verification failure would have
    // orphaned the true 2~6 twin relation.
    Seq(doc(6, "a"), doc(7, "e")).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    run()
    val all = spark.read.parquet(out).as[StreamDedup.CandPair].collect()
    assert(all.map(p => (p.doc1, p.doc2)).toSet ==
      Set((1L, 2L), (1L, 6L), (2L, 6L)))
    assert(all.length == 24, s"8 bands per twin pair, no re-emission: ${all.length}")
    // cross-mode parity: the batch tier surfaces the SAME candidate set
    // (multi-representative buckets closed the r3 (2,6) recall gap)
    val batchCand = graft.operators.TextOps.minhashCandidates(
      spark.read.parquet(in).withColumn("lang", lit("en"))
        .withColumn("source", lit("s")).withColumn("n_chars", length(col("text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchCand == all.map(p => (p.doc1, p.doc2)).toSet,
      s"batch all-pairs form: $batchCand")
  }

  test("evicting near-dup candidates: watermark retires bucket state; within-horizon pairing intact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamDedup
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def txt(seed: String) = (1 to 30).map(i => s"$seed$i").mkString(" ")
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    // horizon 10 min, no out-of-orderness allowance: the watermark is
    // max-seen-event-time, so bucket state for a doc at minute m retires
    // once an arrival is seen past m + 10.
    val q = StreamDedup.candidatesEvicting(spark,
        ms.toDF().toDF("doc_id", "ts", "text"), horizonMs = 10 * 60000L)
      .toDF().writeStream.format("memory").queryName("evict")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 at t=0 (rep); unrelated doc 9 far in the future
      // drives the watermark past 0+10min so doc 1's buckets retire
      ms.addData((1L, ts(0), txt("a")))
      q.processAllAvailable()
      ms.addData((9L, ts(60), txt("z")))
      q.processAllAvailable() // wm -> 60min; timeout fires for doc-1 buckets
      ms.addData((9L, ts(61), txt("z"))) // extra batch: timeouts process
      q.processAllAvailable()
      // batch 2: doc 2 twins doc 1 AFTER eviction — no (1,2) pair may
      // appear (the bucket re-opens with 2 as a fresh representative);
      // doc 3 twins doc 2 within the horizon — (2,3) must appear.
      ms.addData((2L, ts(62), txt("a")))
      q.processAllAvailable()
      ms.addData((3L, ts(63), txt("a")))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.sql("SELECT doc1, doc2 FROM evict").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)),
      s"evicted rep must not pair, within-horizon twin must: $pairs")
  }

  test("perceptual media fingerprints are stream-transparent: a tailing " +
    "media ingest hashes identically to batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Multimodal
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // real PNG containers from the committed generator (ids ≡ 0 mod 3)
    val docs = Seq(3L -> ("a" * 41 + "z" * 150), 6L -> ("z" * 150 + "a" * 41))
      .toDF("doc_id", "text")
    val media = Multimodal.synthesizeMedia(spark, docs).collect()
    val batch = Multimodal.perceptualHash(spark,
        media.toSeq.map(m => (m.doc_id, m.media_type, m.media))
          .toDF("doc_id", "media_type", "media"))
      .collect().map(f => (f.doc_id, f.ahash, f.shash)).sortBy(_._1).toSeq

    val ms = MemoryStream[(Long, String, Array[Byte])]
    val q = Multimodal.perceptualHash(spark,
        ms.toDF().toDF("doc_id", "media_type", "media"))
      .toDF().writeStream.format("memory").queryName("mediafp")
      .outputMode("append").start()
    try {
      ms.addData(media.toSeq.map(m => (m.doc_id, m.media_type, m.media)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT doc_id, ahash, shash FROM mediafp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch.size == 2)
  }

  test("streaming decontamination: stateless verdicts match the batch op row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamDedup
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def txt(seed: String) = (1 to 12).map(i => s"$seed$i").mkString(" ")
    val evalDocs = Seq((100L, txt("e"))).toDF("doc_id", "text")
    // doc 1 copies the eval text (contaminated), 2 disjoint, 3 shingle-less
    val corpus = Seq((1L, txt("e")), (2L, txt("z")), (3L, "too short"))
    val evalSet = StreamDedup.evalHashSet(evalDocs)

    val ms = MemoryStream[(Long, String)]
    val q = StreamDedup
      .verdicts(spark, ms.toDF().toDF("doc_id", "text"), evalSet)
      .toDF().writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      ms.addData(corpus: _*)
      q.processAllAvailable()
      // progress events post from the micro-batch thread; give the
      // reporter a bounded grace period so the state assertion below
      // can never be skipped for lack of a captured event
      val deadline = System.currentTimeMillis + 10000
      while (q.recentProgress.forall(_.numInputRows == 0) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM decon").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq

    // batch reference: same corpus + explicit eval table
    val batchDf = corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val batch = graft.operators.TextOps
      .decontaminate(batchDf, evalDocs = Some(evalDocs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.map(t => t._1 -> t._4).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false))
    // stateless: REQUIRE a captured progress event (a null lastProgress
    // would make the check vacuous) and assert it shows no state ops
    val progressed = q.recentProgress.filter(_.numInputRows > 0)
    assert(progressed.nonEmpty, "no progress event captured — assertion would be vacuous")
    assert(progressed.forall(_.stateOperators.isEmpty),
      progressed.map(_.stateOperators.length).mkString(","))
  }

  test("streaming FUZZY decontamination: stateless verdicts match batch fuzzyDecon row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamDedup
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val far = (1 to 60).map(i => s"z$i").mkString(" ")
    // id 3 is the carve-out eval member (3 % 29 == 3) the batch op uses
    val all = Seq(3L -> base, 1L -> near, 2L -> far, 4L -> base,
      5L -> "too short")
    val train = all.filterNot(_._1 % 29 == 3)
    val evalDocs = all.filter(_._1 % 29 == 3).toDF("doc_id", "text")

    val (idx, evSh) = StreamDedup.evalFuzzyIndex(evalDocs)
    val ms = MemoryStream[(Long, String)]
    val q = StreamDedup
      .fuzzyVerdicts(spark, ms.toDF().toDF("doc_id", "text"), idx, evSh)
      .toDF().writeStream.format("memory").queryName("fuzzydecon")
      .outputMode("append").start()
    try {
      // stream EVERYTHING, eval carve-out member included: the op must
      // drop the eval doc (ADVICE r4 — it would otherwise self-match at
      // Jaccard 1) so the output still equals batch fuzzyDecon's, which
      // never verdicts eval docs
      ms.addData(all: _*)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis + 10000
      while (q.recentProgress.forall(_.numInputRows == 0) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    } finally q.stop()
    assert(train.nonEmpty) // silence unused-warning; batch parity is below
    val streamed = spark.sql("SELECT * FROM fuzzydecon").collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq

    val batchDf = all.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val batch = graft.operators.TextOps.fuzzyDecon(batchDf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.map(t => t._1 -> ((t._2, t._3))).toMap ==
      Map(1L -> ((true, 3L)), 2L -> ((false, -1L)), 4L -> ((true, 3L)),
        5L -> ((false, -1L))))
    // stateless: no state operators may appear in the progress events
    val progressed = q.recentProgress.filter(_.numInputRows > 0)
    assert(progressed.nonEmpty, "no progress event captured — assertion would be vacuous")
    assert(progressed.forall(_.stateOperators.isEmpty),
      progressed.map(_.stateOperators.length).mkString(","))
  }

  test("per-row text ops are stream-transparent: split/mix/redact/quality identical on stream vs batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = (1L to 40L).map(i =>
      (i, s"doc $i mail x$i@ex.org " + ("w " * (i % 7).toInt).trim,
        "en", s"src${i % 3}", 20L + i))
    val batch = rows.toDF("doc_id", "text", "lang", "source", "n_chars")

    def check(name: String,
              f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val want = f(batch).collect().map(_.toString).sorted.toSeq
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val q = f(ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
        .writeStream.format("memory").queryName(s"rowops_$name")
        .outputMode("append").start()
      try {
        // two micro-batches — per-row determinism must not depend on
        // batch boundaries
        ms.addData(rows.take(25): _*)
        q.processAllAvailable()
        ms.addData(rows.drop(25): _*)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.sql(s"SELECT * FROM rowops_$name").collect()
        .map(_.toString).sorted.toSeq
      assert(got == want, s"$name: stream != batch")
    }
    check("redact", TextOps.redactPii)
    check("quality", TextOps.qualityCounts)
    check("split", TextOps.deterministicSplit)
    check("mix", TextOps.weightedSample(_,
      when(col("source") === "src0", lit(100)).otherwise(lit(50))))
    // DSIR scoring against a fixed weight table is stateless per-row —
    // the model is a literal map, so the stream scores exactly like the
    // batch pass (the decontamination pattern)
    check("dsir", TextOps.dsirScoreInRow(_, TextOps.dsirWeightTable(batch)))
    // NB classifier serving is the same fixed-model in-row pattern: the
    // trained log-odds table scores a tailing stream exactly like batch
    check("nb", TextOps.nbScoreInRow(_, TextOps.nbWeightTable(batch)))
    // the Gopher rule gate is a pure projection — a tailing ingest can
    // apply the same admission rules the batch tier does
    check("gopher", TextOps.gopherRules)
    // mixture resampling broadcasts a literal weight table; per-row
    // explode is stateless, so stream copies == batch copies
    check("upsample", TextOps.upsample(_, Map("src0" -> 2500L,
      "src1" -> 500L, "src2" -> 0L)))
    // the fertility gate's serving form: merge table + corpus-mean both
    // literals (the trained artifact), scoring a pure projection
    val fertMerges = TextOps.bpeTrainMerges(batch, 4)
    check("fertility",
      TextOps.bpeFertilityScoreInRow(_, fertMerges, 700L))
  }

  test("vector-ingest encode from a persisted AnnModel is stream-transparent: " +
    "cells and PQ codes identical on stream vs batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // two orthogonal-ish clusters in R^4 (the SimilaritySpec corpus shape)
    val rows = (0 until 24).map { i =>
      val eps = 0.01f * (i / 2)
      val v = if (i % 2 == 0) Array(1.0f, eps, 0.0f, 0.0f)
              else Array(eps, 1.0f, 0.0f, 0.0f)
      (i.toLong, v, i % 2)
    }
    val batch = rows.toDF("vec_id", "embedding", "label")
    val model = Similarity.trainAnnModel(batch, sampleEvery = 2, nCells = 4,
      cIters = 2, m = 2, kCb = 4, pqIters = 2, dim = 4)

    val want = Similarity.encodeIvfPq(batch, model).collect()
      .map(_.toString).sorted.toSeq
    val ms = MemoryStream[(Long, Array[Float], Int)]
    val q = Similarity.encodeIvfPq(
      ms.toDF().toDF("vec_id", "embedding", "label"), model)
      .writeStream.format("memory").queryName("vec_ingest")
      .outputMode("append").start()
    try {
      // codes must not depend on micro-batch boundaries
      ms.addData(rows.take(13): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(13): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT * FROM vec_ingest").collect()
      .map(_.toString).sorted.toSeq
    assert(got == want, "streamed encode != batch encode")
    // and the encode really is the serving representation: every cell in
    // range, every code a valid codebook index
    val enc = Similarity.encodeIvfPq(batch, model).collect()
    enc.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 4)
      r.getSeq[Int](2).foreach(c => assert(c >= 0 && c < 4, s"code $c"))
    }
  }

  test("kill-resume: shutdown-hook drain stops queries; restart loses nothing, dupes nothing (K4)") {
    val base = tmp()
    val in = s"$base/in"
    val sink = s"$base/sink"
    val ledger = s"$base/ledger"
    val ckpt = s"$base/ckpt"

    val half1 = batchTurns.filter(col("ts") <= lit("2024-01-15").cast("timestamp"))
    half1.write.mode("append").parquet(in)

    // a LONG-LIVED query (ProcessingTime trigger, not AvailableNow) — the
    // tailing mode a signal would actually interrupt
    val q1 = TranscriptStream.readTurns(spark, in)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val routed = Pipeline.route(Pipeline.enrich(
          Pipeline.filterValid(Pipeline.parse(batch)), toolDim))
        if (!routed.isEmpty)
          graft.operators.Checkpoint.commitBatch(routed, sink, ledger, batchId)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    q1.processAllAvailable() // first tranche fully committed

    // simulate SIGTERM: run the installed shutdown hook directly
    val hook = TranscriptStream.installShutdownHook(spark)
    Runtime.getRuntime.removeShutdownHook(hook) // test owns its lifecycle
    hook.run()
    assert(spark.streams.active.isEmpty, "drain left queries running")
    assert(!q1.isActive)

    // second tranche lands while "down"; restart from the same checkpoint
    batchTurns.filter(col("ts") > lit("2024-01-15").cast("timestamp"))
      .write.mode("append").parquet(in)
    val q2 = TranscriptStream.startRouting(
      TranscriptStream.readTurns(spark, in), toolDim, sink, ledger, ckpt)
    q2.awaitTermination()

    val expected = Pipeline.route(Pipeline.enrich(parsedValid(batchTurns), toolDim))
    val committed = spark.read.parquet(sink)
    assert(committed.count() == expected.count())
    assert(committed.select("conv_id", "turn_idx").distinct().count() ==
      committed.count())
  }

  test("watermarked windowed per-sink counts match batch windows") {
    val base = tmp()
    val in = s"$base/in"
    batchTurns.write.mode("append").parquet(in)

    val q = TranscriptStream.windowedSinkCounts(
        TranscriptStream.readTurns(spark, in), toolDim)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // normalize LTZ (stream file source) vs NTZ (batch derivation) window
    // starts through CAST AS STRING in the UTC session
    val got = spark.sql(
        "SELECT CAST(win_start AS STRING) w, sink, n FROM win_counts")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Pipeline.route(Pipeline.enrich(parsedValid(batchTurns), toolDim))
      .groupBy(window(col("ts"), "1 hour"), col("sink"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("sink"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("event-time sessions close via timeout; late data beyond watermark is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TranscriptStream.TurnEvent
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[TurnEvent]
    val q = graft.streaming.TranscriptStream
      .eventTimeSessions(spark, ms.toDF())
      .toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // batch 1: conv A gets 2 turns at 10:00/10:05
    ms.addData(TurnEvent("A", 1, t("2024-01-01 10:00:00")),
      TurnEvent("A", 2, t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // batch 2: conv B far later → watermark jumps past A's timeout (10:35)
    ms.addData(TurnEvent("B", 1, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // batch 3: drives timeout processing under the advanced watermark; the
    // A-turn here is LATE (event time far behind watermark 11:50) and must
    // NOT reopen a counted session row with wrong counts
    ms.addData(TurnEvent("B", 2, t("2024-01-01 12:10:00")))
    q.processAllAvailable()
    q.stop()

    val closed = spark.sql("SELECT conv_id, n_turns FROM sessions WHERE closed")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(closed.get("A").contains(2L), s"closed=$closed")
    assert(!closed.contains("B")) // B's session still open at stop
  }

  test("stream-stream join: tool status attaches within its validity interval") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    case class T(conv_id: String, turn_idx: Int, tool: String, ts: java.sql.Timestamp)
    case class M(tool: String, status: String, mts: java.sql.Timestamp)
    val turns = MemoryStream[(String, Int, String, java.sql.Timestamp)]
    val status = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = graft.streaming.TranscriptStream.streamStreamEnrich(
      turns.toDF().toDF("conv_id", "turn_idx", "tool", "ts"),
      status.toDF().toDF("tool", "status", "mts"))
    val q = joined.select("conv_id", "turn_idx", "status")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()

    status.addData(("tool_0", "ok", t("2024-01-01 09:30:00")))
    // in-interval turn (30min after status) and out-of-interval turn (2h)
    turns.addData(("A", 1, "tool_0", t("2024-01-01 10:00:00")),
      ("A", 2, "tool_0", t("2024-01-01 11:45:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT conv_id, turn_idx, status FROM ss_join")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(("A", 1, "ok")), s"got=$got")
  }

  /** Replay-dedup scenario shared by the provider variants: an
    * at-least-once upstream re-sends turn (A,1) (the reference's $gte
    * resume overlap); exactly one copy must survive.
    */
  private def runReplayDedup(sinkName: String): Seq[(String, Int)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TranscriptStream.TurnEvent
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[TurnEvent]
    val q = graft.streaming.TranscriptStream
      .dedupedTurns(ms.toDF())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      ms.addData(TurnEvent("A", 1, t("2024-01-01 10:00:00")),
        TurnEvent("A", 2, t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // replay batch: same turns again
      ms.addData(TurnEvent("A", 1, t("2024-01-01 10:00:00")),
        TurnEvent("A", 3, t("2024-01-01 10:02:00")))
      q.processAllAvailable()
    } finally q.stop()
    spark.sql(s"SELECT conv_id, turn_idx FROM $sinkName").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
  }

  test("replay dedup: at-least-once duplicates collapse within the watermark") {
    assert(runReplayDedup("deduped") == Seq(("A", 1), ("A", 2), ("A", 3)))
  }

  test("replay dedup is identical under the RocksDB state store (at-scale conf)") {
    // the 100 TB configuration: state on local disk, bounded memtable —
    // StreamBench measures its cost; this proves it changes no results
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try
      assert(runReplayDedup("deduped_rocks") == Seq(("A", 1), ("A", 2), ("A", 3)))
    finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("mapGroupsWithState tracks per-conversation running state") {
    val base = tmp()
    val in = s"$base/in"
    batchTurns.write.mode("append").parquet(in)

    val q = TranscriptStream.sessionState(spark,
        TranscriptStream.readTurns(spark, in))
      .toDF()
      .writeStream.format("memory").queryName("conv_state")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT conv_id, n_turns, last_turn FROM conv_state")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val want = batchTurns.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), max(col("turn_idx")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got == want)
  }
}
