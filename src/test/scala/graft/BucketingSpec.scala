package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing
import graft.sources.Transcripts

/** Co-located bucketed join: zero shuffle exchanges on either side. */
class BucketingSpec extends SparkSuite {

  test("same-bucketed tables join with NO shuffle exchange") {
    val turns = Transcripts.transcripts(spark, "/root/testdata/sf0.001")
    Bucketing.saveBucketed(
      turns.select("conv_id", "turn_idx", "role"), "bkt_left", buckets = 8)
    Bucketing.saveBucketed(
      turns.groupBy("conv_id").agg(count(lit(1)).as("n")), "bkt_right",
      buckets = 8)

    // force a real join (the tables are tiny; broadcast would hide the
    // co-location proof)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "bkt_left", "bkt_right")
      val n = joined.count()
      assert(n == turns.count()) // every turn matched its conv aggregate
      joined.collect()
      assert(Bucketing.shuffleCount(joined) == 0,
        joined.queryExecution.executedPlan.toString)

      // control: the same join over NON-bucketed tables shuffles
      turns.select("conv_id", "turn_idx", "role")
        .createOrReplaceTempView("plain_left")
      turns.groupBy("conv_id").agg(count(lit(1)).as("n"))
        .createOrReplaceTempView("plain_right")
      val plain = Bucketing.coLocatedJoin(spark, "plain_left", "plain_right")
      plain.collect()
      assert(Bucketing.shuffleCount(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("sessionize over a bucketed+sorted transcripts table plans ZERO shuffles") {
    // SCALE.md's ordering-tier claim: with the 10^12-turn table laid out
    // bucket(conv_id), the per-conversation window (ClusteredDistribution
    // on conv_id) AND the downstream groupBy(conv_id, session_id) (conv_id
    // is a subset of the grouping keys) are both satisfied by the scan's
    // HashPartitioning — storage-partitioned execution moves NOTHING for
    // the whole sessionize job, vs one full exchange of every turn on a
    // plain table.
    val turns = Transcripts.transcripts(spark, "/root/testdata/sf0.001")
      .select("conv_id", "turn_idx", "role", "ts")
    Bucketing.saveBucketed(turns, "bkt_turns", buckets = 8,
      sortCols = Seq("conv_id", "turn_idx"))
    try {
      val bucketed = graft.operators.Pipeline.sessionize(spark.table("bkt_turns"))
      val got = bucketed.collect()
      assert(Bucketing.shuffleCount(bucketed) == 0,
        bucketed.queryExecution.executedPlan.toString)

      // control + correctness: the plain path shuffles, and both paths
      // agree row-for-row
      val plain = graft.operators.Pipeline.sessionize(turns)
      val want = plain.collect()
      assert(Bucketing.shuffleCount(plain) > 0)
      assert(got.map(_.toSeq).toSet == want.map(_.toSeq).toSet && got.length == want.length)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_turns")
  }
}
