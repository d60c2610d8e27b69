package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Transcripts
import graft.streaming.TranscriptStream

/** Streaming throughput benchmark — the tailing-mode analog of Bench's
  * batch headline. Drives the SAME materialized transcript table through
  * the file-source stream in bounded micro-batches (maxFilesPerTrigger,
  * AvailableNow) and measures end-to-end turns/sec for:
  *
  *   - `route`: the stateless parse→filter→enrich→route pipeline (the
  *     reference's tailing hot path);
  *   - `dedup_hdfs` / `dedup_rocksdb`: the stateful replay-dedup tier
  *     (dropDuplicatesWithinWatermark) under both state-store providers,
  *     run with a watermark wider than the data's event-time span so ALL
  *     input keys accumulate in state (round-robin file order would
  *     otherwise let the watermark discard later batches as late and the
  *     bench would measure the late-row filter, not the store).
  *     The HDFS-backed store holds every key on the executor HEAP — at
  *     100 TB (billions of in-horizon keys) that is an OOM, so the RocksDB
  *     provider (state on local SSD, bounded memtable) is the at-scale
  *     configuration. Measured: RocksDB pays ~1.24× on this heap-sized
  *     state (2M keys — the heap store at its best; RocksDB only adds
  *     snapshot/compaction overhead) — the trade is bounded memory, which
  *     the heap store cannot offer at all once state outgrows executors;
  *   - `window_agg`: watermarked event-time windowed counts (append mode).
  *
  * Prints exactly ONE JSON line (same contract as graft.Bench).
  */
object StreamBench {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete(): Unit
  }

  /** Seconds + actual (triggers, rows-read) for one run. */
  case class Run(sec: Double, batches: Int, rowsIn: Long)

  /** Run `build(stream)` to a noop sink over `turnsPath`, AvailableNow in
    * micro-batches of `filesPerTrigger` files. The noop sink fully
    * evaluates every row without sink IO, so the number is engine
    * throughput (scan + pipeline + state), comparable across providers.
    * Rows-read and trigger counts come from the query's own progress —
    * a stale checkpoint or an empty rerun would otherwise benchmark zero
    * work as an inflated throughput (callers assert rowsIn).
    */
  private def runStream(spark: SparkSession, path: String,
                        schema: org.apache.spark.sql.types.StructType,
                        name: String, filesPerTrigger: Int)
                       (build: DataFrame => DataFrame): Run = {
    val ck = new java.io.File(s"target/streambench_ck_$name")
    rmrf(ck)
    require(!ck.exists(), s"stale checkpoint survived delete: $ck")
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(path)
    val t0 = System.nanoTime()
    val q = build(in).writeStream
      .format("noop")
      .option("checkpointLocation", ck.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    Run(sec, progress.length, progress.map(_.numInputRows).sum)
  }

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  /** Streaming text-tier dedup run: the documents table replicated
    * `mult`× with offset doc_ids (replicas are exact near-dups of the
    * originals — every replica collides with its bucket representative,
    * the state-heaviest realistic shape), driven through StreamDedup's
    * incremental banded candidates to a noop sink.
    */
  /** Streaming decontamination run over the same replicated docs: the
    * stateless tier (in-row shingle hash + broadcast eval-set membership)
    * — its throughput is the ceiling any stateful text stage is measured
    * against, and it needs no state-store provider at all. The eval set
    * is derived from the UN-replicated base table: replicas duplicate
    * text content, so the shingle-hash set is identical, and the driver
    * materialization stays bounded by the base corpus instead of growing
    * with the replication mult (the carve-out-scales-with-corpus trap
    * decontaminate's own Scaladoc warns about).
    */
  private def runTextDecon(spark: SparkSession, sfDir: String,
                           docsPath: String, filesPerTrigger: Int): Run = {
    import org.apache.spark.sql.functions.col
    val evalSet = graft.streaming.StreamDedup.evalHashSet(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 29 === 3))
    runStream(spark, docsPath, docSchema, "textdecon", filesPerTrigger)(
      graft.streaming.StreamDedup.verdicts(spark, _, evalSet).toDF())
  }

  private def runTextDedup(spark: SparkSession, sfDir: String, mult: Int,
                           filesPerTrigger: Int): (Run, Long, String) = {
    // layout key includes the trigger sizing (it shapes the micro-batch
    // count being measured); reuse is gated on a CONTENT fingerprint of
    // the source files (name:size:mtime) + the replication scheme, not
    // just row count — a regenerated source with the SAME count would
    // otherwise silently stream stale replicas (the same trap
    // Bench.materializeTurns guards with its derivation fingerprint)
    val docsPath = s"target/bench_docs_${sfDir.replaceAll("[^0-9.]", "")}" +
      s"_${mult}_$filesPerTrigger"
    val srcFile = new java.io.File(s"$sfDir/documents.parquet")
    val srcSig =
      if (srcFile.isDirectory)
        srcFile.listFiles().sortBy(_.getName)
          .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
          .mkString(",")
      else s"${srcFile.length}:${srcFile.lastModified}"
    val fingerprint =
      s"${(srcSig + "|docs-rep-v1|" + mult + "|" + filesPerTrigger).hashCode}"
    val fpFile = java.nio.file.Paths.get(docsPath, "_fingerprint")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    val fresh = java.nio.file.Files.exists(fpFile) &&
      java.nio.file.Files.readString(fpFile).trim == fingerprint
    if (!fresh) {
      rmrf(new java.io.File(docsPath))
      import org.apache.spark.sql.functions._
      (0 until mult).map(i =>
          base.select((col("doc_id") + lit(i.toLong * n)).as("doc_id"),
            col("text")))
        .reduce(_.unionByName(_))
        .repartition(filesPerTrigger * 8)
        .write.mode("overwrite").parquet(docsPath)
      java.nio.file.Files.writeString(fpFile, fingerprint)
    }
    val run = runStream(spark, docsPath, docSchema, "textdedup",
      filesPerTrigger)(graft.streaming.StreamDedup.candidates(spark, _).toDF())
    (run, n * mult, docsPath)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STREAM_MULT", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val turnsPath = s"target/bench_turns_${sfDir.replaceAll("[^0-9.]", "")}_$mult"
    val nTurns = Bench.materializeTurns(spark, sfDir, mult, turnsPath,
      cpus.toInt * 4)
    val files = cpus.toInt * 4
    val perTrigger = math.max(files / 8, 1) // ≥8 micro-batches per run
    val toolDim = Transcripts.toolDim(spark)

    // the materialized table is round-robin partitioned, so micro-batches
    // arrive in arbitrary EVENT-TIME order; a production-width watermark
    // (10 min) would advance to ~max(ts) after batch 1 and discard nearly
    // everything after it as late — benchmarking the late-row filter, not
    // the state store. A watermark wider than the data's ts span keeps
    // every key in state, so the dedup runs are a true nTurns-key
    // state-store stress (the worst case: nothing ever evicts).
    val wideWm = "60 days"

    val turnSchema = TranscriptStream.turnSchema
    def route() = runStream(spark, turnsPath, turnSchema, "route", perTrigger)(
      TranscriptStream.routed(_, toolDim))
    def dedup(provider: String, tag: String) = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      try runStream(spark, turnsPath, turnSchema, s"dedup_$tag", perTrigger)(
        TranscriptStream.dedupedTurns(_, wideWm))
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    def windowAgg() = runStream(spark, turnsPath, turnSchema, "window",
      perTrigger)(TranscriptStream.windowedSinkCounts(_, toolDim, wideWm))

    route() // warmup: codegen + parquet footers + page cache
    val rRoute = (1 to 3).map(_ => route()).minBy(_.sec)
    val rDedupHdfs = dedup(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "hdfs")
    val rDedupRocks = dedup(RocksDb, "rocksdb")
    val rWindow = windowAgg()

    // text-tier incremental near-dup candidates (StreamDedup) — RocksDB
    // provider, the at-scale configuration for bucket state
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    val (rText, nDocs, docsPath) =
      try runTextDedup(spark, sfDir, mult, perTrigger)
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    // stateless decontamination over the same docs (no provider needed)
    val rDecon = runTextDecon(spark, sfDir, docsPath, perTrigger)
    // the TAILING form: same banded kernel with event-time eviction
    // (bucket state retired once the watermark passes last-arrival +
    // horizon). Event time is synthesized deterministically from doc_id
    // (1 doc/sec), horizon 1h — so eviction genuinely fires across the
    // stream and the measured path includes timeout processing.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    val rTextEvict =
      try runStream(spark, docsPath, docSchema, "textdedupevict", perTrigger)(
        df => graft.streaming.StreamDedup.candidatesEvicting(spark,
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_seconds(
              org.apache.spark.sql.functions.col("doc_id"))),
          horizonMs = 3600L * 1000L).toDF())
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    for ((tag, r) <- Seq("route" -> rRoute, "dedup_hdfs" -> rDedupHdfs,
        "dedup_rocksdb" -> rDedupRocks, "window" -> rWindow))
      require(r.rowsIn == nTurns,
        s"$tag read ${r.rowsIn} of $nTurns rows — stale checkpoint or lost input")
    for ((tag, r) <- Seq("text_dedup" -> rText, "text_decon" -> rDecon,
        "text_dedup_evict" -> rTextEvict))
      require(r.rowsIn == nDocs,
        s"$tag read ${r.rowsIn} of $nDocs docs — stale checkpoint or lost input")

    val thr = nTurns / rRoute.sec
    println(
      s"""{"metric":"streaming_route_throughput","value":$thr,"unit":"turns_per_sec","turns":$nTurns,"micro_batches":${rRoute.batches},"streams":{"route_sec":${rRoute.sec},"dedup_hdfs_sec":${rDedupHdfs.sec},"dedup_rocksdb_sec":${rDedupRocks.sec},"window_agg_sec":${rWindow.sec},"text_dedup_sec":${rText.sec},"text_decon_sec":${rDecon.sec},"text_dedup_evict_sec":${rTextEvict.sec}},"dedup_throughput":{"hdfs":${nTurns / rDedupHdfs.sec},"rocksdb":${nTurns / rDedupRocks.sec}},"text_dedup":{"docs":$nDocs,"docs_per_sec":${nDocs / rText.sec}},"text_decon":{"docs":$nDocs,"docs_per_sec":${nDocs / rDecon.sec}},"text_dedup_evict":{"docs":$nDocs,"docs_per_sec":${nDocs / rTextEvict.sec}},"state_keys":$nTurns,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
