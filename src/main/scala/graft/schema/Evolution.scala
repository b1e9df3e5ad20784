package graft.schema

import org.apache.spark.sql.types._

/** Schema evolution: StructType diffing and compatibility checking
  * (reference `src/services/schema_service.py:155-360`, FR-014..018 —
  * add-column propagates automatically, drop tolerated, type changes
  * checked for safe widening, incompatible changes → DLQ).
  */
object Evolution {

  sealed trait Change { def column: String }
  final case class AddColumn(column: String, dataType: DataType) extends Change
  final case class DropColumn(column: String, dataType: DataType) extends Change
  final case class TypeChange(column: String, from: DataType, to: DataType) extends Change
  /** Nullability tightening/loosening on an otherwise-unchanged column
    * (`test_schema_type_change.py:176` — nullable → NOT NULL must be
    * caught: old-schema rows may hold NULLs the new contract forbids).
    */
  final case class NullabilityChange(column: String, fromNullable: Boolean,
      toNullable: Boolean) extends Change

  sealed trait Compatibility
  case object Compatible extends Compatibility
  final case class Incompatible(reasons: Seq[String]) extends Compatibility

  /** Compat mode semantics per the reference's schema service
    * (`schema_service.py:299-360`, modes declared `schema_metadata.py`):
    * BACKWARD (the reference default) — consumers on the NEW schema must
    * read OLD-schema data: drops are fine (new reader ignores the absent
    * column), but an added column that is non-nullable/no-default cannot
    * be filled from old rows → incompatible;
    * FORWARD — consumers on the OLD schema must read NEW-schema data:
    * any add is fine (old reader ignores it), drops of columns the old
    * reader requires... the reference treats drops as graceful in both
    * modes (target columns are never dropped, `evolve` keeps them);
    * FULL — both constraints.
    */
  sealed trait Mode
  case object Backward extends Mode
  case object Forward extends Mode
  case object Full extends Mode

  def diff(from: StructType, to: StructType): Seq[Change] = {
    val f = from.fields.map(x => x.name -> x).toMap
    val t = to.fields.map(x => x.name -> x).toMap
    val added = to.fields.filterNot(x => f.contains(x.name))
      .map(x => AddColumn(x.name, x.dataType))
    val dropped = from.fields.filterNot(x => t.contains(x.name))
      .map(x => DropColumn(x.name, x.dataType))
    val changed = to.fields.filter(x => f.get(x.name).exists(_.dataType != x.dataType))
      .map(x => TypeChange(x.name, f(x.name).dataType, x.dataType))
    // independent of any dataType change on the same column — a widening
    // combined with a NOT NULL tightening must still surface the tightening
    val renulled = to.fields.filter(x => f.get(x.name).exists(o =>
        o.nullable != x.nullable))
      .map(x => NullabilityChange(x.name, f(x.name).nullable, x.nullable))
    (added ++ dropped ++ changed ++ renulled).toSeq
  }

  /** Safe widenings (int→bigint is the reference's canonical allowed
    * change, `test_schema_type_change.py`).
    */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (s: DecimalType, d: DecimalType) =>
      // precision alone is not enough: DECIMAL(10,0) → DECIMAL(11,5)
      // grows precision AND scale yet shrinks INTEGER digits 10 → 6,
      // truncating stored magnitudes — every represented value must stay
      // representable, so integer digits and scale must both widen
      (d.precision - d.scale) >= (s.precision - s.scale) && s.scale <= d.scale
    case (StringType, _) | (_, StringType) => false
    case _ => false
  }

  def check(from: StructType, to: StructType, mode: Mode): Compatibility = {
    val changes = diff(from, to)
    val reasons = changes.flatMap {
      case TypeChange(c, f, t) if !isWidening(f, t) =>
        Some(s"column $c: incompatible type change $f -> $t")
      case AddColumn(c, _) if (mode == Backward || mode == Full) &&
          !to.fields.find(_.name == c).forall(_.nullable) =>
        Some(s"column $c: non-nullable add without default cannot be read over old-schema data")
      case NullabilityChange(c, true, false) if mode == Backward || mode == Full =>
        Some(s"column $c: nullable -> NOT NULL cannot hold over old-schema data")
      // DropColumn: graceful in every mode (schema_service.py:299-360 —
      // the target keeps the column, readers ignore it); nullability
      // LOOSENING is always safe
      case _ => None
    }
    if (reasons.isEmpty) Compatible else Incompatible(reasons)
  }

  /** Evolve a target StructType by applying additive changes (the
    * auto.evolve behavior: adds appended nullable; drops kept — the
    * reference never drops target columns, `schema_service.py` graceful
    * drop semantics).
    */
  def evolve(current: StructType, incoming: StructType): StructType = {
    val have = current.fieldNames.toSet
    val adds = incoming.fields.filterNot(f => have.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(current.fields ++ adds)
  }

  /** Versioned schema-metadata control row (persisted to the `_cdc_schema_metadata`
    * analogue; serialize with `.json`, restore with `DataType.fromJson`).
    */
  final case class SchemaVersion(table: String, version: Int, schemaJson: String,
      effectiveFromUs: Long, effectiveToUs: Option[Long])

  def serialize(s: StructType): String = s.json
  def deserialize(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
