package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** One shared local session for the whole test run (suites run
  * sequentially; Test/parallelExecution := false).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Transcript-shaped fixture: (conv_id, turn_idx, role, text, tool, ts). */
  def turns(rows: (String, Int, String, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  def parsedValid(df: DataFrame): DataFrame =
    Pipeline.filterValid(Pipeline.parse(df))

  def stmtsOrdered(df: DataFrame): Seq[String] =
    df.orderBy("conv_id", "turn_idx").select("stmt")
      .collect().map(_.getString(0)).toSeq

  def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
