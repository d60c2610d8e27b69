package graft.model

/** The transcript turn record (input_hint shape) — the typed face of the
  * engine; internals stay DataFrame so Catalyst codegen applies
  * (SURVEY.md §1.2). ts is TIMESTAMP_NTZ in the parquet test corpus,
  * hence LocalDateTime.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.time.LocalDateTime)

/** A parsed turn after the grok stage (oplog-entry analog). */
case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: java.time.LocalDateTime,
    op: String,
    db: String,
    tbl: String,
    payload: String)
