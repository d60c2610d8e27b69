package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Checkpoint, Pipeline}
import graft.sources.Transcripts

/** Checkpoint/resume semantics (reference K1-K3, main_test.go:60-91
  * pipeline-level analog): kill-resume equals single-run, replays are
  * no-ops — exactly-once where the reference is at-least-once.
  */
class CheckpointSpec extends SparkSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_ckpt").toString

  private lazy val allTurns = Transcripts.transcripts(spark, "/root/testdata/sf0.001")
  private lazy val toolDim = Transcripts.toolDim(spark)

  test("incremental runs equal single-run; no duplicates; replay is a no-op") {
    val base = tmp()
    val sink = s"$base/sink"
    val ledger = s"$base/ledger"
    val cut = "2024-01-15 00:00:00"
    val half1 = allTurns.filter(col("ts") <= lit(cut).cast("timestamp"))

    // batch 0: only the first half has arrived
    val n1 = Checkpoint.runIncrement(half1, toolDim, sink, ledger)
    assert(n1 > 0)
    // batch 1: full table visible — watermark must exclude the first half
    val n2 = Checkpoint.runIncrement(allTurns, toolDim, sink, ledger)
    assert(n2 > 0)

    val expected = Pipeline.route(Pipeline.enrich(
      parsedValid(allTurns), toolDim))
    assert(n1 + n2 == expected.count())

    val committed = spark.read.parquet(sink)
    assert(committed.count() == expected.count())
    // no dupes: (conv_id, turn_idx) unique
    assert(committed.select("conv_id", "turn_idx").distinct().count() ==
      committed.count())
    // per-sink counts equal the single-run pipeline (north rule invariant)
    val got = committed.groupBy("sink").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Pipeline.sinkCounts(expected).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)

    // replay: nothing newer than the watermark → zero rows, ledger stable
    val n3 = Checkpoint.runIncrement(allTurns, toolDim, sink, ledger)
    assert(n3 == 0L)
    assert(Checkpoint.committedBatches(spark, ledger) == 2L)
    assert(spark.read.parquet(sink).count() == expected.count())
  }

  test("commitBatch is idempotent: same batch id overwrites, never duplicates") {
    val base = tmp()
    val sink = s"$base/sink"
    val ledger = s"$base/ledger"
    val routed = Pipeline.route(Pipeline.enrich(
      parsedValid(allTurns), toolDim)).cache()
    val n = routed.count()
    Checkpoint.commitBatch(routed, sink, ledger, 0L)
    Checkpoint.commitBatch(routed, sink, ledger, 0L) // crash-replay analog
    assert(spark.read.parquet(sink).count() == n)
    routed.unpersist()
  }

  test("compactSink bin-packs per (batch_id, sink); data identical, replay still idempotent") {
    val base = tmp()
    val sink = s"$base/sink"
    val ledger = s"$base/ledger"
    val routed = Pipeline.route(Pipeline.enrich(
      parsedValid(allTurns), toolDim))
      // many tasks per commit → the many-tiny-files shape under every
      // (batch_id, sink) directory that maintenance must clean up
      .repartition(16).cache()
    val n = routed.count()
    (0L to 2L).foreach(b => Checkpoint.commitBatch(routed, sink, ledger, b))
    // batch_id comes back as a partition-inferred int — compare as string
    val pre = spark.read.parquet(sink)
      .groupBy("batch_id", "sink").count().collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap

    val stats = Checkpoint.compactSink(spark, sink)
    assert(stats.rows == 3 * n)
    // one file per (batch_id, sink) partition directory afterwards
    val nParts = pre.size
    assert(stats.filesAfter == nParts,
      s"want $nParts files, got ${stats.filesAfter} (before: ${stats.filesBefore})")
    assert(stats.filesBefore > stats.filesAfter * 4, // genuinely tiny-file input
      s"before=${stats.filesBefore} after=${stats.filesAfter}")
    // data unchanged, partition values intact
    val post = spark.read.parquet(sink)
      .groupBy("batch_id", "sink").count().collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(post == pre)
    // a crash-replay of batch 1 AFTER compaction still overwrites in place
    Checkpoint.commitBatch(routed, sink, ledger, 1L)
    assert(spark.read.parquet(sink).count() == 3 * n)

    // crash-window recovery: a kill inside the two-rename window leaves
    // the sink path absent with the staging copy (and possibly the
    // moved-aside old copy) on disk — heal completes the swap and drops
    // the old copy
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(sink).getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(p(sink), p(sink + ".compact-staging"))
    fs.mkdirs(p(sink + ".compact-old")) // stand-in for the moved-aside copy
    assert(!fs.exists(p(sink)))
    assert(Checkpoint.healCompaction(spark, sink))
    assert(spark.read.parquet(sink).count() == 3 * n)
    assert(!fs.exists(p(sink + ".compact-old")), "old copy not cleaned")
    // swap completed but the old copy's delete was lost: heal drops it
    fs.mkdirs(p(sink + ".compact-old"))
    assert(Checkpoint.healCompaction(spark, sink))
    assert(!fs.exists(p(sink + ".compact-old")))
    assert(spark.read.parquet(sink).count() == 3 * n)
    routed.unpersist()
  }
}
