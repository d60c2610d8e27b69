package graft

import graft.operators.{Metrics, Pipeline}
import graft.sources.Transcripts

/** Lineage + row-count metrics via observe() + QueryExecutionListener
  * (north rule: accumulators + custom listener).
  */
class MetricsSpec extends SparkSuite {

  test("observed stage metrics and scan lineage are captured per query") {
    val listener = new Metrics.GraftListener
    spark.listenerManager.register(listener)
    try {
      val turns = Transcripts.transcripts(spark, "/root/testdata/sf0.001")
      val routed = Metrics.instrumentedPipeline(turns, Transcripts.toolDim(spark))
      val total = routed.count()

      // QueryExecutionListener is notified asynchronously — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      var parsed: Option[org.apache.spark.sql.Row] = None
      while (parsed.isEmpty && System.nanoTime() < deadline) {
        parsed = listener.observed("parsed")
        if (parsed.isEmpty) Thread.sleep(100)
      }
      assert(parsed.isDefined, "no observed metrics arrived")

      val parsedRows = parsed.get.getAs[Long]("rows")
      val validRows = listener.observed("valid").get.getAs[Long]("rows")
      val routedRows = listener.observed("routed").get.getAs[Long]("rows")
      assert(parsedRows == turns.count())
      assert(validRows == parsedValid(turns).count())
      assert(routedRows == total)
      assert(validRows <= parsedRows)
      // event-time bounds ride along for free
      assert(parsed.get.getAs[Any]("min_ts") != null)

      // lineage: the scan's input files are recorded
      val withFiles = listener.all.values.filter(_.inputFiles.nonEmpty)
      assert(withFiles.exists(_.inputFiles.exists(_.contains("events.parquet"))))
    } finally spark.listenerManager.unregister(listener)
  }

  test("per-partition lineage counts sum to the total and expose balance") {
    val turns = graft.sources.Transcripts
      .transcripts(spark, "/root/testdata/sf0.001")
    val salted = graft.operators.Pipeline.saltedRepartition(turns, 4, 8)
    val per = graft.operators.Metrics.perPartitionCounts(salted).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(per.values.sum == turns.count())
    assert(per.keys.forall(p => p >= 0 && p < 4))
  }
}
