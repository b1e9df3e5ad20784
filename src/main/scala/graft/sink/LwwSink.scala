package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lww

/** LWW upsert sinks.
  *
  * Two implementations of the reference's conditional upsert
  * (`src/connectors/transforms/timestamp_conflict_resolver.py:247-285` —
  * `INSERT ... ON CONFLICT (pk) DO UPDATE ... WHERE EXCLUDED.ts > existing.ts
  * OR (= AND EXCLUDED.event_id > existing.event_id)`):
  *
  *  - [[JdbcUpsertSql]] generates exactly that SQL (plus the auto-create
  *    DDL of `postgresql_repository.py:128-177`) for a real JDBC target —
  *    executed inside `foreachBatch` in production; no live Postgres exists
  *    in this container, so it is exercised by unit tests on the SQL text.
  *  - [[ParquetStateStore]] is the runnable local target: a parquet-backed
  *    state table where upsert = LWW-fold of (current state ∪ batch).
  *    Because the fold is the same commutative/idempotent max-by, replaying
  *    a batch (foreachBatch is at-least-once) cannot regress state — this
  *    is the exactly-once construction of SURVEY.md §7.4(1).
  *
  * Scale note: ParquetStateStore rewrites the state table per batch, which
  * is the correct *semantic* model but at 100 TB the target would be a
  * partitioned/bucketed table (or JDBC/Delta) where the merge touches only
  * the partitions present in the batch; the LWW fold itself shuffles once
  * on the key either way.
  */
object JdbcUpsertSql {

  /** CDC metadata columns appended to every target table
    * (`postgresql_repository.py:149-153`, `init-db.sql:146-195`).
    */
  val MetaColumns: Seq[(String, String)] = Seq(
    "_cdc_deleted" -> "BOOLEAN NOT NULL DEFAULT FALSE",
    "_cdc_timestamp_micros" -> "BIGINT",
    "_ttl_expiry_timestamp" -> "TIMESTAMPTZ",
    // BIGINT, not VARCHAR: ParquetStateStore/ReplicationJob tie-break on
    // this column as a numeric long; a VARCHAR target would order
    // lexicographically ('9' > '10') and the two sink implementations
    // could resolve equal-timestamp conflicts differently. The reference
    // uses string UUIDs (where lexicographic IS the contract); for the
    // numeric event ids this engine carries, one numeric ordering is
    // pinned across both sinks.
    "_last_event_id" -> "BIGINT")

  def createTableDdl(table: String, cols: Seq[(String, String)], pk: Seq[String]): String = {
    val all = cols ++ MetaColumns
    val colsSql = all.map { case (n, t) => s"  $n $t" }.mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |$colsSql,
       |  PRIMARY KEY (${pk.mkString(", ")})
       |)""".stripMargin
  }

  /** The conditional LWW upsert: accept iff strictly newer, tie-broken on
    * `_last_event_id` (verbatim semantics of
    * `timestamp_conflict_resolver.py:247-285`).
    */
  def upsertSql(table: String, cols: Seq[String], pk: Seq[String]): String = {
    val nonPk = cols.filterNot(pk.contains)
    val sets = nonPk.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON CONFLICT (${pk.mkString(", ")}) DO UPDATE SET $sets
       |WHERE EXCLUDED._cdc_timestamp_micros > $table._cdc_timestamp_micros
       |   OR (EXCLUDED._cdc_timestamp_micros = $table._cdc_timestamp_micros
       |       AND EXCLUDED._last_event_id > $table._last_event_id)""".stripMargin
  }

  /** Hard/soft delete statements (`postgresql_repository.py:249-319`). */
  def hardDeleteSql(table: String, pk: Seq[String]): String =
    s"DELETE FROM $table WHERE ${pk.map(c => s"$c = ?").mkString(" AND ")}"

  def softDeleteSql(table: String, pk: Seq[String]): String =
    s"""UPDATE $table SET _cdc_deleted = TRUE, _cdc_timestamp_micros = ?,
       |_last_event_id = ? WHERE ${pk.map(c => s"$c = ?").mkString(" AND ")}""".stripMargin
}

/** Parquet-backed LWW state table. Thread-unsafe by design: one writer
  * (the streaming query's foreachBatch) at a time, like the reference's
  * single sink-connector instance per table.
  */
final class ParquetStateStore(
    spark: SparkSession, dir: String, key: String, tsCol: String, tieCol: String) {

  private val path: Path = Paths.get(dir)

  def exists: Boolean = Files.exists(path.resolve("_SUCCESS"))

  def read(): DataFrame = spark.read.parquet(dir)

  /** LWW-merge `batch` into the current state. Idempotent: merging the
    * same batch twice is a no-op (max-by fold).
    */
  def upsert(batch: DataFrame): Unit = {
    val merged =
      if (exists) {
        // Align columns (schema evolution: new columns null-padded on old state)
        val state = read()
        val allCols = (state.columns ++ batch.columns.filterNot(state.columns.contains)).toSeq
        def pad(df: DataFrame) = df.select(allCols.map(c =>
          if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
        Lww.latestPerKey(pad(state).unionByName(pad(batch)), Seq(key),
          Seq(col(tsCol), col(tieCol)))
      } else batch
    swapIn(merged)
  }

  /** TTL purge (S15 delete side — the PLpgSQL expiry trigger of
    * `init-db.sql:198-213` as a periodic batch job,
    * `test_ttl_preservation.py` semantics): hard-delete rows whose
    * expiry has passed. Returns rows purged.
    */
  def purgeExpired(expiryCol: String, nowUs: Long): Long = {
    if (!exists) return 0L
    val state = read()
    val deadPred = col(expiryCol).isNotNull && col(expiryCol) < nowUs
    val nDead = state.filter(deadPred).count()
    if (nDead > 0) swapIn(state.filter(!deadPred))
    nDead
  }

  /** TRUNCATE at an LWW watermark (reference `change_event.py:14,115-117`:
    * a TRUNCATE event clears the table at its position in the change
    * stream, carrying no before/after image). Only rows that LOSE the
    * (ts, tie) ordering against the watermark are cleared; strictly newer
    * rows — late-but-newer upserts already folded into state — survive.
    * Re-applying the same watermark is a no-op, so a replayed
    * truncate-bearing micro-batch converges (ST5). Returns rows cleared.
    */
  def truncate(tsUs: Long, tieId: Long): Long = {
    if (!exists) return 0L
    val state = read()
    // null-safe: a null (ts, tie) carries no ordering info and loses the
    // truncate deterministically (coalesce, not a null-dropping filter)
    val survives = coalesce(
      col(tsCol) > tsUs || (col(tsCol) === tsUs && col(tieCol) > tieId), lit(false))
    val nDead = state.filter(!survives).count()
    if (nDead > 0) swapIn(state.filter(survives))
    nDead
  }

  /** Hard-delete rows by key (S11 / the GDPR erasure path). Returns rows
    * removed.
    */
  def deleteKeys(values: Seq[Any]): Long = {
    if (!exists) return 0L
    val state = read()
    // null-safe: isin is NULL (not false) for a null key, and filter(!NULL)
    // drops the row — a null-key row must survive an unrelated delete
    val pred = coalesce(col(key).isin(values.map(_.asInstanceOf[AnyRef]): _*), lit(false))
    val n = state.filter(pred).count()
    if (n > 0) swapIn(state.filter(!pred))
    n
  }

  private def swapIn(next: DataFrame): Unit = {
    val tmp = dir + ".tmp"
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap: state readers see old or new, never partial
    val old = dir + ".old"
    if (Files.exists(path)) {
      deleteRec(Paths.get(old))
      Files.move(path, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(Paths.get(old))
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}

/** Hash-bucketed parquet LWW state table — the partitioned-target shape
  * [[ParquetStateStore]]'s scale note calls for: state lives under
  * `_bucket = pmod(hash(key), numBuckets)` partitions, and `upsert` reads
  * and rewrites ONLY the buckets present in the batch. Bytes read/written
  * per micro-batch therefore scale with the batch's key spread (≤
  * numBuckets buckets), not with total state size — at 100 TB of state a
  * trigger touching 1% of keys rewrites ~1% of files.
  *
  * The bucket list is collected to the driver, but it is a bounded set of
  * ≤ numBuckets small integers, not data rows. Dynamic partition
  * overwrite leaves untouched buckets' files byte-identical. The write is
  * not atomic ACROSS buckets: a crash mid-batch can persist some buckets
  * only — healed by the checkpoint replaying the batch into the
  * idempotent LWW fold (same argument as ST5); a production target would
  * be JDBC ([[JdbcLwwExecutor]]) or a transactional table format.
  */
final class BucketedParquetStateStore(
    spark: SparkSession, dir: String, key: String, tsCol: String, tieCol: String,
    numBuckets: Int = 64) {

  private val path: Path = Paths.get(dir)

  def exists: Boolean =
    Files.exists(path) && {
      val s = Files.list(path) // close the directory stream's fd
      try s.anyMatch(p => p.getFileName.toString.startsWith("_bucket="))
      finally s.close()
    }

  def read(): DataFrame = spark.read.parquet(dir).drop("_bucket")

  /** LWW-merge a (pre-compacted, one row per key) batch into state. */
  def upsert(batch: DataFrame): Unit = {
    val b = batch.withColumn("_bucket", pmod(hash(col(key)), lit(numBuckets)))
    val merged =
      if (!exists) b
      else {
        val present = b.select("_bucket").distinct().collect().map(_.getInt(0)).toSeq
        val state = spark.read.parquet(dir)
          .filter(col("_bucket").isin(present.map(Int.box): _*)) // partition-pruned scan
        val allCols = (state.columns ++ b.columns.filterNot(state.columns.contains)).toSeq
        def pad(df: DataFrame) = df.select(allCols.map(c =>
          if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
        // materialization barrier before overwriting the files the plan
        // reads from (same discipline as dropWhere / ParquetStateStore's
        // tmp+swap): with a lazy plan, a task retry after job commit
        // begins — or a non-deferred cluster committer — can re-read
        // partially deleted bucket files mid-overwrite.
        graft.util.Materialize.stable(
          Lww.latestPerKey(pad(state).unionByName(pad(b)), Seq(key),
            Seq(col(tsCol), col(tieCol))))
      }
    try merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(dir)
    finally graft.util.Materialize.release(merged) // per-trigger path: no cache buildup
  }

  /** TTL purge over the bucketed layout: rewrites ONLY buckets holding
    * expired rows (purge cost tracks expired volume, not state size); a
    * bucket left empty has its partition directory removed, since dynamic
    * overwrite only replaces partitions present in the output.
    */
  def purgeExpired(expiryCol: String, nowUs: Long): Long =
    dropWhere(col(expiryCol).isNotNull && col(expiryCol) < nowUs)

  /** TRUNCATE at an LWW watermark over the bucketed layout (same
    * semantics as [[ParquetStateStore.truncate]]): clears rows losing the
    * (ts, tie) ordering, rewriting ONLY buckets that hold losing rows —
    * a truncate whose watermark predates most of the state touches few
    * files. Replay-idempotent. Returns rows cleared.
    */
  def truncate(tsUs: Long, tieId: Long): Long =
    dropWhere(!coalesce(
      col(tsCol) > tsUs || (col(tsCol) === tsUs && col(tieCol) > tieId), lit(false)))

  /** Drop rows matching `deadPred`, rewriting only buckets that contain
    * such rows; a bucket left empty has its partition directory removed
    * (dynamic overwrite only replaces partitions present in the output).
    * Returns rows dropped.
    */
  private def dropWhere(deadPred: org.apache.spark.sql.Column): Long = {
    if (!exists) return 0L
    val state = spark.read.parquet(dir)
    val buckets = state.filter(deadPred).select("_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return 0L
    val touched = state.filter(col("_bucket").isin(buckets.map(Int.box): _*))
    // materialize survivors before overwriting the files they came from
    val live = graft.util.Materialize.stable(touched.filter(!deadPred))
    try {
      val nDead = touched.filter(deadPred).count()
      val liveBuckets = live.select("_bucket").distinct().collect().map(_.getInt(0)).toSet
      if (liveBuckets.nonEmpty)
        live.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_bucket")
          .parquet(dir)
      buckets.filterNot(liveBuckets).foreach { b =>
        val p = path.resolve(s"_bucket=$b")
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      }
      nDead
    } finally graft.util.Materialize.release(live)
  }
}
