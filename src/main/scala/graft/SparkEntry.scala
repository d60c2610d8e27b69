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
    "p5_render_insert" -> ((s, dir) => Pipeline.renderInsert(valid(s, dir))),
    "p6_render_update" -> ((s, dir) => Pipeline.renderUpdate(valid(s, dir))),
    "p7_render_delete" -> ((s, dir) => Pipeline.renderDelete(valid(s, dir))),
    "p8_flatten_children" -> ((s, dir) => Pipeline.flattenChildren(valid(s, dir))),
    "p9_ddl_schemas" -> ((s, dir) =>
      Pipeline.ddlCreateSchemas(Pipeline.parse(Transcripts.transcripts(s, dir)))),
    "p10_ddl_tables" -> ((s, dir) => Pipeline.ddlCreateTables(valid(s, dir))),
    "p11_ddl_alter" -> ((s, dir) => Pipeline.ddlAlterTables(valid(s, dir))),
    "p12_transitions" -> ((s, dir) =>
      Pipeline.turnTransitions(Transcripts.transcripts(s, dir))),
    "p13_dead_letter" -> ((s, dir) =>
      Pipeline.rejects(Pipeline.parse(Transcripts.transcripts(s, dir)))
        .groupBy(col("op")).agg(count(lit(1)).as("n"))),
    "p14_sessionize" -> ((s, dir) =>
      Pipeline.sessionize(Transcripts.transcripts(s, dir))),
    "p15_resume_filter" -> ((s, dir) =>
      valid(s, dir)
        .filter(col("ts") > lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"),
          min(col("ts")).as("min_ts"))),
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
    "p5_render_insert" -> (Oracles.withAll + """
      , ins AS (
        SELECT conv_id, turn_idx, db, tbl,
          regexp_extract(payload, '"_id":"([^"]+)"', 1) AS _id,
          NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '') AS extra,
          regexp_extract(payload, '"k":([0-9]+)', 1) AS k
        FROM valid WHERE op = 'INS')
      SELECT conv_id, turn_idx,
        'INSERT INTO ' || db || '.' || tbl || ' ('
        || CASE WHEN extra IS NULL THEN '_id, k' ELSE '_id, extra, k' END
        || ') VALUES (''' || _id || ''''
        || CASE WHEN extra IS NULL THEN '' ELSE ', ''' || extra || '''' END
        || ', ' || k || ');' AS stmt
      FROM ins"""),
    "p6_render_update" -> (Oracles.withAll + """
      SELECT conv_id, turn_idx,
        'UPDATE ' || db || '.' || tbl
        || ' SET k = ' || regexp_extract(payload, '"k":([0-9]+)', 1)
        || ', obsolete = NULL WHERE _id = '''
        || regexp_extract(payload, '"_id":"([^"]+)"', 1) || ''';' AS stmt
      FROM valid WHERE op = 'UPD'"""),
    "p7_render_delete" -> (Oracles.withAll + """
      SELECT conv_id, turn_idx,
        'DELETE FROM ' || db || '.' || tbl || ' WHERE _id = '''
        || regexp_extract(payload, '"_id":"([^"]+)"', 1) || ''';' AS stmt
      FROM valid WHERE op = 'DEL'"""),
    "p8_flatten_children" -> (Oracles.withAll + """
      , ins AS (
        SELECT conv_id, turn_idx, db, tbl,
          regexp_extract(payload, '"_id":"([^"]+)"', 1) AS parent_id,
          CAST(regexp_extract(payload, '"k":([0-9]+)', 1) AS INT) AS k
        FROM valid WHERE op = 'INS'),
      exploded AS (
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               0 AS pos, 'tag' || CAST(k % 5 AS STRING) AS value FROM ins
        UNION ALL
        SELECT conv_id, turn_idx, db, tbl, parent_id,
               1 AS pos, 'tag' || CAST(k % 7 AS STRING) AS value FROM ins)
      SELECT conv_id, turn_idx, db, tbl || '_tags' AS child_tbl,
        sha256(parent_id || '|' || tbl || '_tags|' || CAST(pos AS STRING)) AS _id,
        parent_id, pos, value
      FROM exploded"""),
    "p9_ddl_schemas" -> (Oracles.withAll + """
      SELECT db, 'CREATE SCHEMA IF NOT EXISTS ' || db || ';' AS stmt
      FROM (SELECT DISTINCT db FROM valid)"""),
    "p10_ddl_tables" -> (Oracles.withAll + """
      , ins AS (
        SELECT db, tbl,
          NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '') AS extra,
          row_number() OVER (PARTITION BY db, tbl
                             ORDER BY ts, conv_id, turn_idx) AS rn
        FROM valid WHERE op = 'INS')
      SELECT db, tbl,
        'CREATE TABLE ' || db || '.' || tbl || ' (_id VARCHAR(255) PRIMARY KEY'
        || CASE WHEN extra IS NULL THEN '' ELSE ', extra VARCHAR(255)' END
        || ', k INTEGER);' AS stmt
      FROM ins WHERE rn = 1"""),
    "p11_ddl_alter" -> (Oracles.withAll + """
      , ins AS (
        SELECT db, tbl,
          (NULLIF(regexp_extract(payload, '"extra":"([^"]+)"', 1), '')
             IS NOT NULL) AS has_extra,
          row_number() OVER (PARTITION BY db, tbl
                             ORDER BY ts, conv_id, turn_idx) AS rn
        FROM valid WHERE op = 'INS')
      SELECT db, tbl,
        'ALTER TABLE ' || db || '.' || tbl || ' ADD extra VARCHAR(255);' AS stmt
      FROM (SELECT db, tbl,
              max(CASE WHEN rn = 1 THEN has_extra END) AS first_has,
              max(has_extra) AS any_has
            FROM ins GROUP BY db, tbl)
      WHERE any_has AND NOT first_has"""),
    "p12_transitions" -> (Transcripts.oracleWith + """
      SELECT prev_role, role, count(*) AS n
      FROM (SELECT role, lag(role) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx) AS prev_role
            FROM transcripts)
      WHERE prev_role IS NOT NULL
      GROUP BY prev_role, role"""),
    "p14_sessionize" -> (Transcripts.oracleWith + """
      , g AS (
        SELECT conv_id, turn_idx,
          epoch_us(ts) // 1000000
            - lag(epoch_us(ts) // 1000000)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        FROM transcripts),
      s AS (
        SELECT conv_id, turn_idx,
          sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g)
      SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_turns, max(turn_idx) AS last_turn
      FROM s GROUP BY conv_id, session_id"""),
    "p15_resume_filter" -> (Oracles.withAll + """
      SELECT op, count(*) AS n, max(ts) AS max_ts, min(ts) AS min_ts
      FROM valid WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY op"""),
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
