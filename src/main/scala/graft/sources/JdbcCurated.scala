package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K5: the curated-layer JDBC sink with duplicate-skip insert semantics —
  * the reference's Postgres writer inserts row-at-a-time and treats a
  * unique-key violation as "skip, count it, move on"
  * (`services/data_connector/src/db_writer.py:187-225`, table DDL with the
  * DECIMAL(20,8) curated columns at `db_writer.py:73-111`).
  *
  * Spark-first re-expression: the per-row try/except-UniqueViolation loop
  * becomes ONE left-anti join of the incoming batch against the target
  * table's existing keys, then a single distributed `df.write.jdbc` append
  * of the survivors. Same observable result (a re-delivered batch inserts
  * zero rows; an overlapping batch inserts only its new keys) without a
  * round-trip per row — the database sees only non-conflicting inserts, so
  * no constraint bounce is ever paid.
  *
  * Scale shape: the key scan reads ONLY the key columns through the JDBC
  * source, and the anti-join is a plain equi-join — broadcast when the
  * existing key set is small, shuffle otherwise. Either join flavor puts an
  * exchange/broadcast barrier between the target-table read and the first
  * insert, so the scan completes before any write task opens a connection
  * (no read-your-own-writes window). Inserts run with
  * `numPartitions`-bounded parallelism, the JDBC-sink analog of the
  * reference's connection pool cap (`db_writer.py:43-48`).
  *
  * Within-batch duplicates are the CALLER's contract (compose with
  * [[graft.operators.SetOps.dedupFirst]] for the reference's first-arrival-
  * wins semantics, as the d1 query does) — this op dedups batch-vs-table,
  * not batch-vs-itself, and `require`s the keys to be batch-unique is not
  * checkable without a shuffle, so it is documented instead.
  *
  * The test target is embedded Derby (in the Spark distribution); the
  * production target is any JDBC database — the code path is identical,
  * only the URL changes.
  */
object JdbcCurated {

  /** True if `table` exists per the connection's metadata (Derby and most
    * databases store unquoted identifiers upper-case; Spark-created tables
    * keep the exact name — check both spellings).
    */
  def tableExists(url: String, table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData
      def has(name: String): Boolean = {
        val rs = meta.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      has(table) || has(table.toUpperCase(java.util.Locale.ROOT))
    } finally conn.close()
  }

  /** Append `batch` to `table` at `url`, skipping rows whose `keys` already
    * exist in the table. Creates the table from the batch schema on first
    * write (Spark's dialect type mapping — DecimalType(20,8) maps to the
    * DECIMAL(20,8) the reference's DDL declares, and string columns are
    * pinned to `VARCHAR(stringWidth)` like the reference's `VARCHAR(20)`
    * columns: Derby's dialect default is CLOB, which cannot be COMPARED —
    * a pushed-down key predicate then fails server-side), then backs the
    * keys with a UNIQUE INDEX — the same constraint the reference's DDL
    * declares, and the line of defense the anti-join alone cannot be:
    * a RETRIED write task (its inserts committed, its success report lost)
    * or a concurrent writer re-inserts keys the pre-insert anti-join could
    * not see. With the index those duplicates BOUNCE LOUDLY (the job
    * fails; a writeDedup re-run then converges via the anti-join) instead
    * of corrupting the table silently. Returns the number of rows actually
    * inserted.
    *
    * `writeParallelism` caps the insert connections (coalesce, not
    * repartition: no shuffle just to write). The existing-key scan is a
    * single JDBC stream (Spark's partitioned JDBC read needs a numeric
    * split column + bounds the caller would have to provide); it reads
    * ONLY the key columns, and the curated tables this sink mirrors are
    * the reference's Postgres layer — far smaller than bronze. For a
    * genuinely huge target, export its key projection to parquet and
    * anti-join against that instead.
    */
  def writeDedup(
      batch: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      writeParallelism: Int = 8,
      stringWidth: Int = 256): Long = {
    require(keys.nonEmpty, "at least one key column")
    val spark = batch.sparkSession
    val props = new java.util.Properties()
    val creating = !tableExists(url, table)
    val fresh =
      if (creating) batch
      else {
        val existing = spark.read.jdbc(url, table, props)
          .select(keys.map(col): _*)
        batch.join(existing, keys, "left_anti")
      }
    val toWrite = fresh.coalesce(writeParallelism)
    // One pass: stage the survivors once (count + write would otherwise run
    // the anti-join twice, re-reading the target table mid-write).
    val staged = graft.operators.Materialize.stage(
      toWrite, checkpointDir = None, eager = true)
    val n = staged.count()
    if (n > 0) {
      val stringCols = batch.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
        .map(f => s"${f.name} VARCHAR($stringWidth)")
      val writer = staged.write.mode("append")
      val withTypes =
        if (stringCols.isEmpty) writer
        else writer.option("createTableColumnTypes", stringCols.mkString(", "))
      withTypes.jdbc(url, table, props)
      if (creating) {
        // Spark quotes column identifiers at CREATE TABLE, so the index DDL
        // must too (unquoted names would upper-case and miss them)
        val cols = keys.map(k => "\"" + k + "\"").mkString(", ")
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try st.executeUpdate(
            s"""CREATE UNIQUE INDEX "${table}_dedup_key" ON $table ($cols)""")
          finally st.close()
        } finally conn.close()
      }
    }
    n
  }
}
