package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-analog materialized transcript table: partitioned by event day
  * (`days(ts)` layout, SURVEY.md §7.6/SCALE.md) so checkpoint resume and
  * time-range queries prune partitions at planning time instead of
  * scanning — the distributed replacement for the reference's byte-offset
  * Seek (/root/reference/main.go:244-248).
  */
object TranscriptTable {

  /** Write turns partitioned by day. (Real deployment: an Iceberg table
    * with `PARTITIONED BY (days(ts), bucket(4096, conv_id))`; the sandbox
    * analog keeps the days dimension, which is what pruning needs.)
    */
  def materialize(turns: DataFrame, path: String): Unit =
    turns.withColumn("event_day", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_day")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("event_day")

  /** Resume-style scan: everything after the watermark. The predicate on
    * the partition column prunes whole directories — assert via
    * [[prunedPartitionCount]].
    */
  def readAfter(spark: SparkSession, path: String, watermark: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_day") >= to_date(lit(watermark)) &&
        col("ts") > lit(watermark).cast("timestamp"))
      .drop("event_day")

  /** Number of partition directories the plan actually reads (from the
    * scan's selected partitions) — proof of pruning for tests/audits.
    */
  def scannedFileCount(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().map {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
      case _ => 0L
    }.sum
}
