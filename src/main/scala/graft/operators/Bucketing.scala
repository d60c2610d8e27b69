package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins (SCALE.md:
  * `bucket(conv_id)` is the second partition dimension of the 10¹²-turn
  * table; two tables bucketed the same way join without ANY exchange of
  * either side — the difference between moving 100 TB and moving nothing).
  */
object Bucketing {

  def saveBucketed(df: DataFrame, tableName: String, buckets: Int = 8,
                   byCol: String = "conv_id",
                   sortCols: Seq[String] = Nil): Unit = {
    val sort = if (sortCols.nonEmpty) sortCols else Seq(byCol)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, byCol)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on the bucket column. With matching
    * bucket counts the planner proves co-partitioning and emits NO
    * ShuffleExchange on either side (asserted in BucketingSpec).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    byCol: String = "conv_id"): DataFrame =
    spark.table(left).join(spark.table(right), byCol)

  /** Number of shuffle exchanges in the executed plan — 0 proves the
    * co-located join. AQE hides exchanges inside leaf ShuffleQueryStageExec
    * nodes, so unwrap the final adaptive plan and count both forms.
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def count(p: SparkPlan): Int = p.collect {
      case s: ShuffleQueryStageExec => count(s.plan) // stage wraps its exchange
      case _: ShuffleExchangeLike => 1
    }.sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => count(a.finalPhysicalPlan)
      case p => count(p)
    }
  }
}
