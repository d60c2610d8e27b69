package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a same-named DuckDB oracle in `oracleSql`
  * unless the op is not SQL-expressible (then the driver records a weaker
  * rows-only check). Column names/aliases match pairwise — the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Transcripts.table(s, dir, name)

  /** Parsed+filtered transcript turns — the pipeline front half. */
  private def valid(s: SparkSession, dir: String): DataFrame =
    Pipeline.filterValid(Pipeline.parse(Transcripts.transcripts(s, dir)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full parse→enrich→route→aggregate pipeline.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Pipeline.sinkCounts(Pipeline.route(
      Pipeline.enrich(valid(spark, dir), Transcripts.toolDim(spark))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------- core pipeline (SURVEY §2)
    "p1_parse" -> ((s, dir) => valid(s, dir)),
    "p2_filter_counts" -> ((s, dir) =>
      valid(s, dir).groupBy(col("op")).agg(count(lit(1)).as("n"))),
    "p3_enrich" -> ((s, dir) =>
      Pipeline.enrich(valid(s, dir), Transcripts.toolDim(s))
        .groupBy(col("tool_kind"))
        .agg(count(lit(1)).as("n"), countDistinct(col("tool")).as("n_tools"))),
    "p4_route_counts" -> ((s, dir) =>
      Pipeline.sinkCounts(Pipeline.route(
        Pipeline.enrich(valid(s, dir), Transcripts.toolDim(s))))),
    "p13_dead_letter" -> ((s, dir) =>
      Pipeline.rejects(Pipeline.parse(Transcripts.transcripts(s, dir)))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))),
    // --------------------------------------- relational coverage (SURVEY §2.7)
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(BigDecimal(1)) - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),
  )

  /** DuckDB equivalents over the same parquet tables (events-derived
    * transcript CTE shared verbatim — Oracles.withAll).
    */
  def oracleSql: Map[String, String] = Map(
    "p1_parse" -> (Oracles.withAll +
      "SELECT conv_id, turn_idx, role, tool, ts, op, db, tbl, payload FROM valid"),
    "p2_filter_counts" -> (Oracles.withAll +
      "SELECT op, count(*) AS n FROM valid GROUP BY op"),
    "p3_enrich" -> (Oracles.withAll +
      """SELECT tool_kind, count(*) AS n, count(DISTINCT tool) AS n_tools
         FROM valid JOIN tool_dim USING (tool) GROUP BY tool_kind"""),
    "p4_route_counts" -> (Oracles.withAll +
      """SELECT (CASE op WHEN 'INS' THEN 'ins' WHEN 'UPD' THEN 'upd' ELSE 'del' END)
                || '_' || tool_kind AS sink, count(*) AS n
         FROM valid JOIN tool_dim USING (tool) GROUP BY 1"""),
    "p13_dead_letter" -> (Oracles.withAll +
      """SELECT op, count(*) AS n FROM parsed
         WHERE NOT (op IN ('INS','UPD','DEL')
                    AND db NOT IN ('admin','config','local'))
         GROUP BY op"""),
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus""",
  )
}
