package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic transcript-table derivation.
  *
  * The pipeline's primary input (per BASELINE.json `input_hint`) is a table
  * of multi-turn conversation transcripts:
  *   (conv_id string, turn_idx int, role string, text string, tool string,
  *    ts timestamp)
  * mirroring the reference's oplog-entry stream
  * (/root/reference/models/model.go:9-15): conv_id<->namespace,
  * turn_idx<->ts.I ordinal, role<->op, text<->payload document, ts<->ts.T.
  *
  * The sandbox test data has no transcript-shaped table, so we derive one
  * deterministically from `events.parquet` using a single SQL text that is
  * valid in BOTH Spark SQL and DuckDB. The same string is executed by Spark
  * (over a temp view of events) and embedded as a CTE prefix in every
  * DuckDB oracle query — one source of truth, zero drift between the engine
  * under test and the oracle.
  *
  * The generated `text` grammar mirrors the reference's oplog op dispatch
  * (/root/reference/transformer/transformer.go:15-31):
  *   `<OPTOKEN> <db>.<table> <json-payload>`
  * with OPTOKEN in {INS, UPD, DEL} (role user/assistant/tool) plus a SYS
  * reject-path token (~1% of rows, exercising the unknown-op guard at
  * transformer.go:26-28). Insert payloads carry a `tags` array (nested-value
  * flatten, transformer.go:83-93) and a schema-drift `extra` column on
  * event_id % 11 == 0 (ALTER path, transformer.go:176-195). Update payloads
  * carry `diff.u` / `diff.d` (transformer.go:260-282); deletes carry only
  * the key (transformer.go:301-319).
  */
object Transcripts {

  /** CTE clauses (no leading WITH) shared verbatim between Spark SQL and
    * DuckDB. Restrict to the common dialect: `||`, CASE, lpad, CAST AS
    * STRING/INT, regexp_extract(s, re, group), row_number() OVER.
    */
  val derivationCte: String = """
_ev AS (
  SELECT event_id, ts, user_id,
         regexp_extract(props, '([0-9]+)', 1) AS k,
         CASE WHEN event_id % 97 = 0 THEN 'system'
              WHEN event_type IN ('signup','click') THEN 'user'
              WHEN event_type IN ('view','purchase') THEN 'assistant'
              ELSE 'tool' END AS role,
         CASE WHEN event_id % 53 = 0 THEN 'admin'
              WHEN event_id % 59 = 0 THEN 'config'
              ELSE 'db' || CAST(user_id % 3 AS STRING) END AS db,
         't' || CAST(event_id % 4 AS STRING) AS tbl
  FROM events
),
transcripts AS (
  SELECT
    'conv_' || lpad(CAST(user_id % 100 AS STRING), 4, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id % 100 ORDER BY event_id) AS INT) AS turn_idx,
    role,
    CASE role
      WHEN 'user' THEN
        'INS ' || db || '.' || tbl || ' {"_id":"e' || CAST(event_id AS STRING)
        || '","k":' || k
        || CASE WHEN event_id % 11 = 0 THEN ',"extra":"x' || k || '"' ELSE '' END
        || ',"tags":["tag' || CAST(CAST(k AS INT) % 5 AS STRING)
        || '","tag' || CAST(CAST(k AS INT) % 7 AS STRING) || '"]}'
      WHEN 'assistant' THEN
        'UPD ' || db || '.' || tbl || ' {"_id":"e' || CAST(event_id AS STRING)
        || '","diff":{"u":{"k":' || k || '},"d":{"obsolete":true}}}'
      WHEN 'tool' THEN
        'DEL ' || db || '.' || tbl || ' {"_id":"e' || CAST(event_id AS STRING) || '"}'
      ELSE 'SYS ' || db || '.' || tbl || ' {}'
    END AS text,
    'tool_' || CAST(event_id % 8 AS STRING) AS tool,
    ts
  FROM _ev
)"""

  /** Broadcast-side enrich dimension (SURVEY.md §2.7 joins row; FIXTURES.md
    * §2). VALUES-literal so the identical text runs in both dialects.
    */
  val toolDimCte: String = """
tool_dim AS (
  SELECT tool, tool_kind, kind_priority FROM (VALUES
    ('tool_0','retrieval',1),('tool_1','action',2),('tool_2','generation',3),
    ('tool_3','retrieval',1),('tool_4','action',2),('tool_5','generation',3),
    ('tool_6','retrieval',1),('tool_7','action',2)
  ) AS t(tool, tool_kind, kind_priority)
)"""

  /** Oracle prefix for DuckDB queries over the derived transcript table. */
  val oracleWith: String = s"WITH $derivationCte, $toolDimCte"

  private def registerEvents(spark: SparkSession, sfDir: String): Unit =
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("events")

  // the derived table is immutable per (session, sfDir): cache it so each
  // of the driver's 36 queries doesn't re-run the derivation window
  private val derived =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** The transcript table, derived in Spark from the same SQL text the
    * oracle uses. Scan-level note: derivation is a projection over a single
    * parquet scan plus one window; at real scale the transcripts are a
    * pre-materialized Iceberg table and this function is replaced by a
    * partition-pruned scan (SURVEY.md §7.6).
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame =
    derived.getOrElseUpdate((spark, sfDir), {
      registerEvents(spark, sfDir)
      spark.sql(s"WITH $derivationCte SELECT * FROM transcripts").cache()
    })

  def toolDim(spark: SparkSession): DataFrame =
    spark.sql(s"WITH $toolDimCte SELECT * FROM tool_dim")

  /** Typed face of the transcript table (input_hint: "typed
    * Dataset/DataFrame + Catalyst throughout").
    */
  def typedTurns(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[graft.model.Turn] = {
    import spark.implicits._
    transcripts(spark, sfDir).as[graft.model.Turn]
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
