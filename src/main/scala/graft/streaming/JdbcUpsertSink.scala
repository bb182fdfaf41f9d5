package graft.streaming

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.sink.Jdbc

/** Streaming → JDBC upsert via foreachBatch: the production landing path
  * for an incremental pipeline whose warehouse table is keyed (the
  * reference's daily job appends to Postgres and can only ever insert —
  * /root/reference/fetch_youtube_data.py:194; replays duplicate). This
  * sink makes every micro-batch an idempotent MERGE, so retries,
  * checkpoint replays, and overlapping captures converge to
  * latest-wins-per-key.
  *
  * Mechanics per micro-batch: (1) the batch DataFrame is written
  * DISTRIBUTED (executor JDBC writers) into a staging table — the driver
  * never materializes rows; (2) one transactional statement pair on the
  * driver moves staging into the target: DELETE the colliding keys, then
  * INSERT ... SELECT from staging — the portable upsert (MERGE where the
  * dialect has it is the same shape, still one statement). Scale: the
  * data path is the distributed stage write; the driver does O(1) DDL/DML
  * strings, never O(rows).
  *
  * At-least-once note: foreachBatch can re-deliver a batch after a crash
  * between the stage write and the commit; the upsert is idempotent, so
  * re-delivery converges (the staging table is replaced per batch).
  */
object JdbcUpsertSink {

  /** Attach this sink to a keyed stream. `df` must contain `keyCol`;
    * rows within a batch should already be unique per key (dedupe
    * upstream — e.g. latest-per-key — or the stage insert order decides).
    */
  def writeStream(df: DataFrame, url: String, table: String, keyCol: String,
      props: Properties, checkpoint: String): DataStreamWriter[Row] = {
    // explicit function value: foreachBatch has a Java VoidFunction2
    // overload that makes an inline lambda ambiguous in Scala 2.13
    val f: (DataFrame, Long) => Unit =
      (batch, batchId) => upsertBatch(batch, url, table, keyCol, props, batchId)
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(f)
  }

  /** One micro-batch upsert: distributed stage write + driver-side
    * transactional DELETE-colliding + INSERT-from-stage. Exposed for the
    * spec and for batch callers wanting the same landing semantics. */
  def upsertBatch(batch: DataFrame, url: String, table: String,
      keyCol: String, props: Properties, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val stage = s"${table}_stage"
    // replace (not append) — a replayed batch must not double the stage
    batch.write.mode(SaveMode.Overwrite).option("truncate", "true")
      .jdbc(url, stage, props)
    if (!Jdbc.tableExists(batch.sparkSession, url, table, props)) {
      // first batch bootstraps the target with the stage's schema
      batch.limit(0).write.mode(SaveMode.Append).jdbc(url, table, props)
    }
    val cols = batch.columns.map(c => s""""$c"""").mkString(", ")
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        // table names stay UNQUOTED so the engine folds them exactly as
        // it did for Spark's JDBC writer (Derby→upper, Postgres→lower —
        // the reference's :155 case-folding trap); columns were created
        // quoted by the writer, so they are quoted here
        st.executeUpdate(
          s"""DELETE FROM $table WHERE "$keyCol" IN
             | (SELECT "$keyCol" FROM $stage)""".stripMargin)
        st.executeUpdate(
          s"INSERT INTO $table ($cols) SELECT $cols FROM $stage")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }
}
