package graft

import graft.sources.Transcripts

/** DuckDB-dialect oracle building blocks. The transcript derivation CTE is
  * shared VERBATIM with the Spark side (graft.sources.Transcripts); only the
  * parse stage differs in dialect (DuckDB regexp_extract vs our fused
  * ParseTurn expression) — same substring semantics by construction.
  */
object Oracles {

  /** Parse + filter stages in DuckDB dialect, mirroring Pipeline.parse /
    * Pipeline.filterValid exactly.
    */
  val parsedCte: String = """
parsed AS (
  SELECT conv_id, turn_idx, role, tool, ts,
    regexp_extract(text, '^([^ ]+) ', 1) AS op,
    regexp_extract(text, '^[^ ]+ ([^ .]+)[.]', 1) AS db,
    regexp_extract(text, '^[^ ]+ [^ .]+[.]([^ ]+) ', 1) AS tbl,
    regexp_extract(text, '^[^ ]+ [^ ]+ (.*)$', 1) AS payload
  FROM transcripts
),
valid AS (
  SELECT * FROM parsed
  WHERE op IN ('INS','UPD','DEL') AND db NOT IN ('admin','config','local')
)"""

  /** Full WITH prefix: events→transcripts→tool_dim→parsed→valid. */
  val withAll: String = Transcripts.oracleWith + "," + parsedCte + " "
}
