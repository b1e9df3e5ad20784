package graft.api

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.DriverManager
import java.util.UUID

import org.apache.spark.sql.Row

import graft.sink.{JdbcLwwExecutor, ParquetStateStore}

/** GDPR right-to-erasure (reference `src/api/routes/gdpr.py:37-216`):
  * delete one record from BOTH stores — source state and JDBC target —
  * with a compensating re-insert if the second delete fails after the
  * first succeeded, and an audit-log entry either way. Identifier inputs
  * are validated against `^[a-zA-Z0-9_]+$` (T14, `gdpr.py:235-254`)
  * before ever reaching SQL text.
  */
object Gdpr {

  private val IdentifierRe = "^[a-zA-Z0-9_]+$".r

  def validIdentifier(s: String): Boolean = IdentifierRe.matches(s)

  final case class DeleteResult(
      primaryKey: String,
      deletedFromSource: Boolean,
      deletedFromTarget: Boolean,
      compensated: Boolean,
      auditLogId: String)

  /** Append-only audit trail (`gdpr.py:163-196`). Free-text fields
    * (requester/reason — and pk/outcome defensively) are sanitized: a tab
    * or newline inside a value would shift fields / fabricate phantom
    * records in the TSV, corrupting the trail the reference keeps in
    * typed DB columns.
    */
  private def sanitize(s: String): String =
    s.flatMap {
      // backslash first: otherwise a literal "\t" in the input is
      // indistinguishable from an escaped real tab (ambiguous/forgeable
      // audit entries)
      case '\\' => "\\\\"
      case '\t' => "\\t"; case '\n' => "\\n"; case '\r' => "\\r"
      case c => c.toString
    }

  private def audit(auditPath: String, table: String, pk: String,
      requester: String, reason: String, outcome: String): String = {
    val id = UUID.randomUUID().toString
    val line = (Seq(id, System.currentTimeMillis().toString, table) ++
      Seq(pk, requester, reason, outcome).map(sanitize)).mkString("", "\t", "\n")
    Files.writeString(Paths.get(auditPath), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    id
  }

  /** Dual-store delete with compensation:
    *  1. backup the source row (404 if absent);
    *  2. delete from source;
    *  3. delete from target; on failure, COMPENSATE by re-upserting the
    *     source backup (`gdpr.py:134-155`) so the stores stay consistent;
    *  4. audit either way.
    */
  def deleteRecord(
      source: ParquetStateStore, target: JdbcLwwExecutor.Target,
      auditPath: String, table: String, pkValue: Any,
      requester: String = "api_user",
      reason: String = "GDPR erasure request"): Either[String, DeleteResult] = {
    if (!validIdentifier(table)) return Left(s"invalid identifier: $table")
    val pk = pkValue.toString

    // 1. backup before delete (compensating-transaction support); a
    //    not-yet-created state store is the same 404 as a missing row,
    //    not an AnalysisException out of spark.read.parquet
    if (!source.exists) return Left(s"record $pk not found in source $table")
    val keyCol = target.pk.head
    // ALL rows under the erasure identifier, not just the first: a
    // composite-pk store holds several rows per leading key, and
    // deleteKeys removes every one of them — backing up / target-deleting
    // / compensating a single row would leave PII in the target and lose
    // rows on compensation
    val backup: Array[Row] = source.read()
      .filter(org.apache.spark.sql.functions.col(keyCol) === pkValue)
      .collect()
    if (backup.isEmpty) return Left(s"record $pk not found in source $table")

    // 2. delete from source
    val deletedSource = source.deleteKeys(Seq(pkValue)) > 0

    // 3. delete from target; compensate source ONLY on target-delete
    //    failure. The audit write happens OUTSIDE this scope — an audit
    //    I/O failure after a successful dual delete must not trigger
    //    compensation (that would resurrect the PII in the source while
    //    the target stays deleted, the one inconsistent state).
    val targetResult: Either[Exception, Long] =
      try {
        val conn = JdbcLwwExecutor.connect(target.url)
        try Right(JdbcLwwExecutor.deletePartition(conn, target, backup.iterator))
        finally conn.close()
      } catch { case e: Exception => Left(e) }

    targetResult match {
      case Right(n) =>
        val id =
          try audit(auditPath, table, pk, requester, reason, "deleted_both")
          catch { case e: Exception =>
            s"audit-write-failed: ${graft.util.Redact.secrets(e.getMessage)}" }
        Right(DeleteResult(pk, deletedSource, n > 0, compensated = false, id))
      case Left(e) =>
        // compensating re-insert of the source backup. Exception text is
        // redacted everywhere it lands (audit file, API error body): a
        // JDBC failure message can echo the URL's credentials.
        val df = source.read().sparkSession.createDataFrame(
          java.util.Arrays.asList(backup: _*), backup.head.schema)
        source.upsert(df)
        try audit(auditPath, table, pk, requester, reason,
          s"compensated: ${graft.util.Redact.secrets(e.getMessage)}")
        catch { case _: Exception => () } // compensation outcome already decided
        Left(s"target delete failed, source restored: ${graft.util.Redact.secrets(e.getMessage)}")
    }
  }
}
