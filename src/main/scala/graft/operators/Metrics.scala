package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-stage lineage + row-count metrics (north rule: "per-partition
  * lineage + row-count metrics emitted through Spark accumulators and a
  * custom QueryExecutionListener").
  *
  * Stages are instrumented with Dataset.observe — named accumulator-backed
  * metrics that ride the existing plan (NO extra pass, NO extra action);
  * the listener harvests them plus scan lineage (input files) per query.
  */
object Metrics {

  final case class QueryMetrics(
      observed: Map[String, Row],
      inputFiles: Seq[String],
      durationNs: Long)

  /** Collects observed metrics + lineage per completed query. Register
    * once per session: `spark.listenerManager.register(new GraftListener)`.
    */
  final class GraftListener extends QueryExecutionListener {
    private val store = new ConcurrentHashMap[String, QueryMetrics]()

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val obs = qe.observedMetrics
      val files = try qe.analyzed.collectLeaves().flatMap {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.inputFiles.toSeq
            case _ => Nil
          }
        case _ => Nil
      } catch { case _: Exception => Nil }
      store.put(s"$funcName@${System.nanoTime()}",
        QueryMetrics(obs, files, durationNs))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    def all: Map[String, QueryMetrics] = store.asScala.toMap

    /** Latest observation of a named stage metric across recorded queries —
      * ordered by the nanoTime embedded in the store key (a
      * ConcurrentHashMap's iteration order is hash-based, so `.lastOption`
      * over values would return an arbitrary entry).
      */
    def observed(name: String): Option[Row] =
      store.asScala.toSeq
        .sortBy { case (key, _) => key.substring(key.lastIndexOf('@') + 1).toLong }
        .flatMap { case (_, m) => m.observed.get(name) }
        .lastOption
  }

  /** Instrument a stage boundary: rows passing + min/max event time —
    * rides the plan as accumulators, zero extra actions.
    */
  def observeStage(df: DataFrame, stage: String): DataFrame =
    df.observe(stage,
      count(lit(1)).as("rows"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      approx_count_distinct(col("conv_id")).as("approx_convs"))

  /** Per-partition row counts — partition-level lineage for skew and
    * balance audits (north rule "per-partition lineage"); a tiny aggregate,
    * usable as a side observation on any stage.
    */
  def perPartitionCounts(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))

  /** Fully-instrumented pipeline: parse→filter→enrich→route with an
    * observation point at each stage boundary.
    */
  def instrumentedPipeline(turns: DataFrame, toolDim: DataFrame): DataFrame = {
    val parsed = observeStage(Pipeline.parse(turns), "parsed")
    val valid = observeStage(Pipeline.filterValid(parsed), "valid")
    val enriched = Pipeline.enrich(valid, toolDim)
    observeStage(Pipeline.route(enriched), "routed")
  }
}
