package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{MetadataBuilder, StructType}

import graft.schema.SchemaRegistry

/** Multi-table, config-driven replication — the reference's deployment
  * model: ONE pipeline per table, each with its own primary key, schema
  * and topic, all declared in config (`docker/connectors/
  * cassandra-source.json:12-13` table list; per-table replication rules
  * `specs/001-cass-cdc-pg/data-model.md:396-421`; per-table topics
  * `contracts/kafka-topics.md:49-66`).
  *
  * The per-table identity (pk + StructType) lives in ONE registry row:
  * pk membership rides as field metadata on the registered schema
  * ([[withPk]]/[[pkOf]]), so [[configFor]] can rebuild a complete
  * [[ReplicationJob.Config]] from `(registry, table, dirs)` alone — the
  * schema *and* key evolve through the same versioned control table the
  * evolution path already maintains (FR-014..018).
  *
  * Scale: each table is an independent streaming query with its own
  * checkpoint, DLQ and state — exactly the reference's one-connector-
  * per-table isolation. On a cluster the N queries share the session's
  * scheduler pools; a hot table cannot starve another table's trigger
  * (distinct checkpoints ⇒ distinct micro-batch clocks).
  */
object MultiTableReplication {

  private val PkFlag = "graft_pk"

  /** Mark the pk columns in a schema's field metadata, so a single
    * registry row carries (schema, pk) — the analog of the reference's
    * `system_schema.columns.kind = partition_key`
    * (`src/repositories/cassandra_repository.py:110-168`).
    */
  def withPk(schema: StructType, pk: Seq[String]): StructType = {
    val missing = pk.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"pk columns not in schema: ${missing.mkString(", ")}")
    StructType(schema.fields.map { f =>
      if (pk.contains(f.name))
        f.copy(nullable = false, // partition keys are the only non-nullable columns (type_mapper.py:225)
          metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putBoolean(PkFlag, true).build())
      else f
    })
  }

  /** Recover the pk column list from marked field metadata, in schema
    * (declaration) order.
    */
  def pkOf(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(PkFlag) && f.metadata.getBoolean(PkFlag) => f.name
    }

  /** Strip the pk markers (for comparing/serializing data schemas where
    * key metadata is noise).
    */
  def withoutPk(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(PkFlag)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        f.copy(metadata = mb.remove(PkFlag).build())
      }
    })

  /** Conventional per-table directory layout under one base dir — the
    * analog of per-table topics/tables deriving from one naming rule
    * (`cdc-events-{table}` / `cdc_{table}`).
    */
  final case class Dirs(base: String) {
    def source(table: String): String = s"$base/$table/source"
    def target(table: String): String = s"$base/$table/target"
    def dlq(table: String): String = s"$base/$table/dlq"
    def checkpoint(table: String): String = s"$base/$table/checkpoint"
  }

  /** Per-table admission channel under a job-level prefix: FR-024's
    * one-channel-per-table rule as a naming convention, so a degraded
    * table's sink never throttles a sibling table's admission.
    */
  def channelFor(prefix: String, table: String): String = s"$prefix.$table"

  /** Build a complete per-table [[ReplicationJob.Config]] from the
    * registry's CURRENT schema version for `table` (pk from field
    * metadata, dirs from the naming rule). Per-table policy knobs
    * (validTypes, constrained column, ts unit, sink flavor) come in as
    * overrides on a `base` config; identity (table/schema/pk/dirs) is
    * always registry-derived. A `backpressureChannel` on the base is a
    * job-level PREFIX: each table gets its own [[channelFor]] channel
    * (the [[AdmissionControl]] design intent — one channel ties ONE
    * sink's health to ONE source's admission), which the caller
    * registers per table before starting.
    */
  def configFor(reg: SchemaRegistry, table: String, dirs: Dirs,
      base: ReplicationJob.Config = ReplicationJob.Config("", "", "", "")): ReplicationJob.Config = {
    val (_, schema) = reg.current(table).getOrElse(
      throw new IllegalArgumentException(s"no schema registered for table '$table'"))
    val pk = pkOf(schema)
    require(pk.nonEmpty, s"registered schema for '$table' marks no pk columns (withPk)")
    base.copy(
      sourceDir = dirs.source(table),
      targetDir = dirs.target(table),
      dlqDir = dirs.dlq(table),
      checkpointDir = dirs.checkpoint(table),
      table = table,
      schema = schema,
      pk = pk,
      backpressureChannel = base.backpressureChannel.map(channelFor(_, table)))
  }

  /** Start one streaming query per table config; returns them in order.
    * Queries run concurrently on the shared session. All-or-nothing: if a
    * later table's start throws, the already-started queries are stopped
    * before the exception propagates — otherwise they would keep running
    * (and keep their checkpoint locks) with no handle returned to stop
    * them by.
    */
  def start(spark: SparkSession, tables: Seq[ReplicationJob.Config],
      continuous: Boolean = false): Seq[StreamingQuery] = {
    val started = scala.collection.mutable.ArrayBuffer.empty[StreamingQuery]
    try {
      tables.foreach(t => started += ReplicationJob.start(spark, t, continuous))
      started.toSeq
    } catch {
      case scala.util.control.NonFatal(e) =>
        started.foreach(q => try q.stop() catch { case _: Exception => () })
        throw e
    }
  }

  /** Drain-and-stop all tables (`Trigger.AvailableNow` each): the S2
    * snapshot shape across the whole table list. Propagates the first
    * failed query's exception after stopping the rest.
    */
  def runAvailableNow(spark: SparkSession, tables: Seq[ReplicationJob.Config]): Unit = {
    val queries = start(spark, tables)
    try queries.foreach(_.awaitTermination())
    finally queries.foreach(q => if (q.isActive) q.stop())
  }
}
