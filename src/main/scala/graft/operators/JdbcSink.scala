package graft.operators

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** Transactional JDBC statement sink — the reference's Postgres sink
  * (W2, /root/reference/database/postgres/postgres.go:41-60), rebuilt with
  * two deliberate fixes:
  *  - errors PROPAGATE and roll back the transaction (the reference
  *    swallows them: `if err != nil { return nil }`, postgres.go:55-57);
  *  - one connection per PARTITION, not per batch (the reference re-runs
  *    InitializePostgres inside the consume loop, main.go:100).
  *
  * Executes the pipeline's rendered DML per partition in a transaction;
  * statement count comes back through an accumulator. For table-shaped
  * data prefer [[append]] (Spark's own JDBC writer with batching).
  */
object JdbcSink {

  def executeStatements(stmts: DataFrame, url: String): Long = {
    val acc = stmts.sparkSession.sparkContext.longAccumulator("stmts_executed")
    stmts.select("stmt").foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try {
            // statement terminator is renderer syntax, not JDBC's (Derby
            // rejects it; Postgres tolerates both)
            rows.foreach { r =>
              st.execute(r.getString(0).stripSuffix(";")); acc.add(1)
            }
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally st.close()
        } finally conn.close()
      }
    }
    acc.value
  }

  /** Table-shaped append through Spark's JDBC writer. */
  def append(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("append")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .save()
}
