package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch checkpoint/resume (reference K1-K3, SURVEY.md §2.6) with
  * EXACTLY-ONCE sink commits — deliberately stronger than the reference's
  * at-least-once replay (offset advanced before sink write,
  * /root/reference/main.go:291-297; mongo resume uses $gte so the last
  * entry replays, /root/reference/database/mongodb/mongo.go:89-91).
  *
  * Two pieces:
  *  - a tiny ledger table (parquet) of committed (batch_id, max_ts) — the
  *    analog of checkpoint.gob (/root/reference/main.go:312-355);
  *  - idempotent sink commits: data lands under batch_id=N partitions with
  *    dynamic partition overwrite, so a replayed batch REPLACES itself
  *    instead of duplicating (the Iceberg-snapshot-commit analog, SURVEY.md
  *    §7.6).
  *
  * Resume = read ledger → watermark = max committed ts → source filter
  * `ts > watermark`, which prunes partitions at the scan (the distributed
  * replacement for the reference's byte-offset Seek, main.go:244-248).
  */
object Checkpoint {

  /** Ledger-missing is the ONLY condition treated as "no checkpoint yet":
    * a transient read failure (permissions, corrupt footer, FS hiccup) must
    * PROPAGATE — swallowing it would silently reset the watermark and
    * reprocess the full input under batch_id 0 while committed batches
    * 1..N stay in the sink, duplicating data and breaking exactly-once.
    */
  private def ledgerExists(spark: SparkSession, ledgerPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Highest committed event time, if any batch committed yet. Returned as
    * the engine's own timestamp representation (NTZ → LocalDateTime, LTZ →
    * Instant/Timestamp) and only ever fed back through lit() — never
    * interpreted driver-side.
    */
  def lastWatermark(spark: SparkSession, ledgerPath: String): Option[Any] =
    if (!ledgerExists(spark, ledgerPath)) None
    else {
      val rows = spark.read.parquet(ledgerPath)
        .agg(max(col("max_ts"))).collect()
      Option(rows(0).get(0))
    }

  def committedBatches(spark: SparkSession, ledgerPath: String): Long =
    if (!ledgerExists(spark, ledgerPath)) 0L
    else spark.read.parquet(ledgerPath).count()

  /** Idempotent data commit: everything in `routed` lands under its
    * batch_id partition; re-running the same batch overwrites in place.
    * Ledger append AFTER data commit — a crash between the two replays the
    * batch on resume, and the overwrite makes the replay a no-op.
    */
  def commitBatch(routed: DataFrame, sinkPath: String, ledgerPath: String,
                  batchId: Long): Unit = {
    routed.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "sink")
      .parquet(sinkPath)
    routed.agg(max(col("ts")).as("max_ts"))
      .filter(col("max_ts").isNotNull)
      .select(lit(batchId).as("batch_id"), col("max_ts"))
      .write.mode("append").parquet(ledgerPath)
  }

  /** One resumable pipeline increment: filter past the ledger watermark,
    * route, commit. Returns rows committed this run.
    */
  def runIncrement(turns: DataFrame, toolDim: DataFrame, sinkPath: String,
                   ledgerPath: String): Long = {
    val spark = turns.sparkSession
    val wm = lastWatermark(spark, ledgerPath)
    val fresh = wm.fold(turns)(w => turns.filter(col("ts") > lit(w)))
    val routed = Pipeline.route(
      Pipeline.enrich(Pipeline.filterValid(Pipeline.parse(fresh)), toolDim))
    val batchId = committedBatches(spark, ledgerPath)
    val cached = routed.cache()
    try {
      val n = cached.count()
      if (n > 0) commitBatch(cached, sinkPath, ledgerPath, batchId)
      n
    } finally cached.unpersist()
  }
}
