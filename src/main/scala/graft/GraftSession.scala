package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession pre-configured the way the pipeline
  * wants it (AQE + skew split per the north rule, UTC, sane local shuffle
  * parallelism) with the custom expressions SQL-registered.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[*]",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.registerAll(spark)
    spark
  }
}
