package graft.schema

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned schema-metadata control table — the `_cdc_schema_metadata`
  * analog (`docker/postgres/init-db.sql:4-22`,
  * `src/models/schema_metadata.py:28-101`): per table, a version history
  * of StructTypes with effective intervals. Persisted as TSV lines
  * (version rows are tiny and append-only; a production deployment keeps
  * the same rows in the target database).
  *
  * This is what makes the replication stream restart-free under additive
  * schema change (FR-014..018): `from_json` parses the PERMISSIVE
  * envelope (before/after as string maps, `CdcSchemas.envelope`), and the
  * typed `castRow` projection is driven by THIS table, consulted per
  * micro-batch — so a new column only changes a control row, never the
  * streaming query plan.
  */
final class SchemaRegistry(path: String) {

  private def load(): Seq[Evolution.SchemaVersion] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val Array(table, v, from, to, json) = line.split("\t", 5)
      Evolution.SchemaVersion(table, v.toInt, json, from.toLong,
        if (to == "-") None else Some(to.toLong))
    }
  }

  private def rewrite(all: Seq[Evolution.SchemaVersion]): Unit = {
    val body = all.map(s => s"${s.table}\t${s.version}\t${s.effectiveFromUs}\t" +
      s"${s.effectiveToUs.getOrElse("-")}\t${s.schemaJson}").mkString("", "\n", "\n")
    // tmp + atomic move: an in-place truncate-then-write killed mid-flight
    // would tear EVERY table's version history, not just the row being
    // registered — the control table must never have a corrupt window
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def history(table: String): Seq[Evolution.SchemaVersion] =
    load().filter(_.table == table).sortBy(_.version)

  /** Latest (open-interval) schema version for a table. */
  def current(table: String): Option[(Int, StructType)] =
    history(table).lastOption.map(s => s.version -> Evolution.deserialize(s.schemaJson))

  /** Register a new schema version, closing the prior version's effective
    * interval (`schema_metadata.py:83-96` interval semantics). Returns
    * the new version number.
    */
  def register(table: String, schema: StructType, nowUs: Long): Int = this.synchronized {
    val all = load()
    val (mine, others) = all.partition(_.table == table)
    val closed = mine.map(s =>
      if (s.effectiveToUs.isEmpty) s.copy(effectiveToUs = Some(nowUs)) else s)
    val version = mine.map(_.version).maxOption.getOrElse(0) + 1
    rewrite(others ++ closed :+ Evolution.SchemaVersion(
      table, version, Evolution.serialize(schema), nowUs, None))
    version
  }
}

/** The per-batch schema-evolution gate of the replication path: consult
  * the registry, evolve on compatible change, reject to DLQ on
  * incompatible change (`tests/integration/test_schema_add_column.py`,
  * `test_schema_incompatible.py` semantics).
  */
object SchemaEvolvingBatch {

  /** Observe the batch's row-map columns and auto-evolve the registry with
    * any NEW columns (additive change — inferred StringType, nullable, the
    * type-mapper's fallback-TEXT rule). The distinct key set collected to
    * the driver is bounded by table width, not batch size. Returns the
    * schema version + StructType the batch should be cast with. Evolution
    * takes effect in the SAME micro-batch — well inside the reference's
    * ≤10 s propagation bound (SC-011), with no stream restart.
    */
  def observeAndEvolve(reg: SchemaRegistry, table: String, unwrapped: DataFrame,
      nowUs: Long): (Int, StructType) = {
    val observed = unwrapped
      .select(explode(map_keys(col("row"))).as("c")).distinct()
      .collect().map(_.getString(0)).toSet
    // An empty batch (routine before data arrives / on restart) must not
    // register an empty StructType as v1 — that would pollute the version
    // history permanently and shift every later version number.
    if (observed.isEmpty)
      return reg.current(table).map { case (v, s) => (v, s) }
        .getOrElse((0, StructType(Seq.empty)))
    reg.current(table) match {
      case None =>
        val schema = StructType(observed.toSeq.sorted.map(c => StructField(c, StringType)))
        (reg.register(table, schema, nowUs), schema)
      case Some((v, cur)) =>
        val newCols = observed -- cur.fieldNames.toSet
        if (newCols.isEmpty) (v, cur)
        else {
          val evolved = Evolution.evolve(cur,
            StructType(newCols.toSeq.sorted.map(c => StructField(c, StringType))))
          (reg.register(table, evolved, nowUs), evolved)
        }
    }
  }

  /** Apply an explicitly DECLARED incoming schema (the Avro-registry path,
    * where the producer announces types): compatible → evolve + register;
    * incompatible under `mode` → Left(reasons), caller routes the batch to
    * the DLQ with SCHEMA_MISMATCH (`test_schema_incompatible.py:68-305`).
    */
  def applyDeclared(reg: SchemaRegistry, table: String, declared: StructType,
      mode: Evolution.Mode, nowUs: Long): Either[Seq[String], (Int, StructType)] =
    reg.current(table) match {
      case None => Right((reg.register(table, declared, nowUs), declared))
      case Some((_, cur)) =>
        Evolution.check(cur, declared, mode) match {
          case Evolution.Compatible =>
            val evolved = Evolution.evolve(cur, declared)
            Right((reg.register(table, evolved, nowUs), evolved))
          case Evolution.Incompatible(reasons) => Left(reasons)
        }
    }
}
