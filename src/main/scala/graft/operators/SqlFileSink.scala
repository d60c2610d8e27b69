package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Append-only .sql text sink — the reference's primary output
  * (W1, /root/reference/main.go:205-226), kept for golden-file equality;
  * production sinks are the partitioned tables written by Checkpoint.
  *
  * The reference appends serially from one consumer loop; the equality-
  * preserving distributed analog is a deterministic global order
  * (conv_id, turn_idx) into one file per commit — explicitly a test/audit
  * sink, not the scale path (a single writer is the point of the format).
  */
object SqlFileSink {

  def write(stmts: DataFrame, path: String): Unit =
    stmts.orderBy(col("conv_id"), col("turn_idx"))
      .select(col("stmt"))
      .coalesce(1)
      .write.mode("append").text(path)

  def readBack(spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] =
    spark.read.text(path).collect().map(_.getString(0)).toSeq
}
