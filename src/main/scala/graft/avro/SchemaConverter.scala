package graft.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.Schema.Type._
import org.apache.spark.sql.types._

/** Avro schema ↔ Spark `StructType` conversion.
  *
  * Covers the full container-file surface the reference is transparently
  * schema-agnostic over (it delegates decoding to avro-tools'
  * GenericDatumReader, `/root/reference/src/services/repair-avro.ts:131`):
  * primitives, records, enums, arrays, maps, `[null, T]` unions, fixed,
  * and the logical types decimal / date / time / timestamp (SURVEY.md
  * §1.B-§1.C mapping table).
  */
object SchemaConverter {

  /** Avro → Spark. `[null, T]` unions collapse to nullable T; a union
    * with several non-null branches has no single relational type, so it
    * decodes as STRUCT-OF-BRANCHES — `struct<tag int, member_<branch>…>`
    * with exactly one member set per value (`tag` = index into the
    * non-null branch list). This keeps the source transparently
    * schema-agnostic like the reference's GenericDatumReader pass-through
    * (`repair-avro.ts:131`) while giving SQL a stable shape to filter and
    * project on. */
  def toSpark(schema: Schema): DataType = schema.getType match {
    case BOOLEAN => BooleanType
    case INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        // TIME is still flag-gated in Spark 4.1 (spark.sql.timeType
        // .enabled); honor the session's regime — raw millis-of-day int
        // (lossless) when the type is disabled, as before.
        case _: LogicalTypes.TimeMillis if timeTypeEnabled => TimeType(3)
        case _ => IntegerType
      }
    case LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis => TimestampType
        case _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.LocalTimestampMillis => TimestampNTZType
        case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
        case _: LogicalTypes.TimeMicros if timeTypeEnabled => TimeType(6)
        case _ => LongType
      }
    case FLOAT => FloatType
    case DOUBLE => DoubleType
    case STRING => StringType
    case ENUM => StringType
    case BYTES | FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case NULL => NullType
    case ARRAY => ArrayType(toSpark(schema.getElementType))
    case MAP => MapType(StringType, toSpark(schema.getValueType))
    case RECORD =>
      StructType(schema.getFields.asScala.toSeq.map { f =>
        StructField(f.name, toSpark(f.schema()), nullable = isNullable(f.schema()),
          metadata = aliasMetadata(f.aliases().asScala.toSeq))
      })
    case UNION =>
      nonNullBranch(schema) match {
        case Some(b) => toSpark(b)
        case None =>
          StructType(
            StructField("tag", IntegerType, nullable = false) +:
              unionBranches(schema).map(b =>
                StructField(s"member_${branchName(b)}", toSpark(b),
                  nullable = true)))
      }
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  def toSparkStruct(schema: Schema): StructType =
    toSpark(schema).asInstanceOf[StructType]

  /** StructField-metadata key carrying an Avro field's `aliases` (Avro
    * 1.x spec, "Aliases"): the field's FORMER names. A reader resolving
    * a writer schema that lacks the field by name falls back to these —
    * rename evolution (old files' values surface under the new name)
    * instead of the add+drop null-fill a pure name match degrades to. */
  val AliasesKey = "avro.aliases"

  def aliasMetadata(aliases: Seq[String]): Metadata =
    if (aliases.isEmpty) Metadata.empty
    else new MetadataBuilder()
      .putStringArray(AliasesKey, aliases.sorted.toArray).build()

  def aliasesOf(f: StructField): Seq[String] =
    if (f.metadata.contains(AliasesKey))
      f.metadata.getStringArray(AliasesKey).toSeq
    else Nil

  /** Avro-spec field resolution order: the writer field with the
    * reader's NAME if present, else the first declared alias the writer
    * schema has. Null when neither matches (add-column evolution —
    * callers null-fill). */
  def resolveField(writer: Schema, f: StructField): Schema.Field = {
    val direct = writer.getField(f.name)
    if (direct != null) direct
    else aliasesOf(f).iterator.map(writer.getField).collectFirst {
      case g if g != null => g
    }.orNull
  }

  /** Spark 4.1 ships TIME as a preview type behind
    * `spark.sql.timeType.enabled`; schema inference runs on the driver
    * with the active session's conf. */
  private def timeTypeEnabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get.isTimeTypeEnabled
    catch { case _: Throwable => false }

  def isNullable(s: Schema): Boolean =
    s.getType == NULL ||
      (s.getType == UNION && s.getTypes.asScala.exists(_.getType == NULL))

  /** The non-null branch of a `[null, T]` (or `[T, null]`) union. */
  def nonNullBranch(s: Schema): Option[Schema] = {
    val branches = s.getTypes.asScala.filter(_.getType != NULL)
    if (branches.size == 1) Some(branches.head) else None
  }

  /** The non-null branches of a union, in declaration order. */
  def unionBranches(s: Schema): Seq[Schema] =
    s.getTypes.asScala.toSeq.filter(_.getType != NULL)

  /** Stable field-name suffix per union branch: the Avro branch name
    * (type name for primitives, full name for named types) — unique
    * within a union by spec, so member fields can never collide. */
  def branchName(b: Schema): String = b.getType match {
    case RECORD | ENUM | FIXED => b.getFullName.replace('.', '_')
    case other => other.getName
  }

  /** Resolve a possibly-union schema to its effective value schema. */
  def resolve(s: Schema): Schema =
    if (s.getType == UNION) nonNullBranch(s).getOrElse(s) else s

  /** Spark → Avro (for the write path). Nullable fields become
    * `[null, T]` unions, timestamps become timestamp-micros. */
  def toAvro(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(INT)
      case LongType => Schema.create(LONG)
      case FloatType => Schema.create(FLOAT)
      case DoubleType => Schema.create(DOUBLE)
      case StringType => Schema.create(STRING)
      case BinaryType => Schema.create(BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(LONG))
      case _: TimeType => // any precision widens losslessly to micros
        LogicalTypes.timeMicros().addToSchema(Schema.create(LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvro(et, s"${name}_item", containsNull))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvro(vt, s"${name}_value", valueContainsNull))
      case st: StructType => toAvroRecord(st, name)
      case other =>
        throw new IllegalArgumentException(s"unsupported spark type: $other")
    }
    if (nullable && base.getType != UNION)
      Schema.createUnion(java.util.List.of(Schema.create(NULL), base))
    else base
  }

  def toAvroRecord(st: StructType, name: String): Schema = {
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(st.fields.map { f =>
      val fld =
        new Schema.Field(f.name, toAvro(f.dataType, s"${name}_${f.name}", f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      // rename-evolution fidelity on rewrite: a compaction of an evolved
      // directory re-embeds the aliases, so files written elsewhere under
      // the old name stay resolvable against the compacted generation
      aliasesOf(f).foreach(fld.addAlias)
      fld
    }.toList.asJava)
    rec
  }

  /** Reader-schema projection: a record schema containing only `fields`
    * (by name, original order) — Avro then skips the other columns during
    * decode, which is the scan's column pruning (SURVEY §4.B). */
  def prune(full: Schema, fields: Seq[String]): Schema = {
    val keep = fields.toSet
    val rec = Schema.createRecord(full.getName, full.getDoc, full.getNamespace, false)
    rec.setFields(full.getFields.asScala.filter(f => keep(f.name)).map { f =>
      new Schema.Field(f.name, f.schema(), f.doc(), f.defaultVal())
    }.toList.asJava)
    rec
  }
}
