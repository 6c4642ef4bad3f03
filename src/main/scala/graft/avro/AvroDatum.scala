package graft.avro

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.Type._
import org.apache.avro.generic.{GenericData, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro datum ↔ Catalyst value converters (the native path — no Row
  * round-trip, mirroring how a production Spark connector decodes).
  * Deserialization follows the SURVEY §1.C type mapping. */
object AvroDatum {

  type Conv = Any => Any

  /** Build a converter from an (already union-resolved) avro schema +
    * the matching Spark type to a Catalyst value. */
  def reader(schema: Schema, dt: DataType): Conv = {
    val s = SchemaConverter.resolve(schema)
    (s.getType, dt) match {
      case (_, NullType) => _ => null
      case (BOOLEAN, BooleanType) => identity
      case (INT, DateType) => identity // days since epoch
      case (INT, _: TimeType) => // time-millis → nanos-of-day
        v => java.lang.Long.valueOf(v.asInstanceOf[Int].toLong * 1000000L)
      case (INT, IntegerType) => identity
      case (LONG, _: TimeType) => // time-micros → nanos-of-day
        v => java.lang.Long.valueOf(v.asInstanceOf[Long] * 1000L)
      case (LONG, TimestampType) | (LONG, TimestampNTZType) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis |
               _: LogicalTypes.LocalTimestampMillis =>
            v => v.asInstanceOf[Long] * 1000L // ms → µs
          case _ => identity
        }
      case (LONG, LongType) => identity
      case (FLOAT, FloatType) => identity
      case (DOUBLE, DoubleType) => identity
      // Avro-spec reader-schema numeric promotions (r11): a merged
      // schema widened by a later generation (int→long, int/long/
      // float→double — AvroContainerSource.promoteNumeric) reads old
      // files' narrower writer values widened, mirroring
      // GenericDatumReader's resolution. The (INT, DateType)/TimeType/
      // Timestamp logical-type cases above stay first — promotions
      // apply only to plain numeric targets.
      case (INT, LongType) =>
        v => java.lang.Long.valueOf(v.asInstanceOf[Int].toLong)
      case (INT, DoubleType) =>
        v => java.lang.Double.valueOf(v.asInstanceOf[Int].toDouble)
      case (LONG, DoubleType) =>
        v => java.lang.Double.valueOf(v.asInstanceOf[Long].toDouble)
      case (FLOAT, DoubleType) =>
        v => java.lang.Double.valueOf(v.asInstanceOf[Float].toDouble)
      case (STRING, StringType) => v => UTF8String.fromString(v.toString)
      // Avro-spec string↔bytes promotions (r12): a merged schema that
      // resolved mixed string/bytes generations to BINARY
      // (AvroContainerSource.mergeTypes) reads old string-writer files
      // as their exact UTF-8 wire bytes; the reverse direction decodes
      // bytes as UTF-8 text for an explicit string reader schema.
      case (STRING, BinaryType) =>
        v => v match {
          case u: org.apache.avro.util.Utf8 =>
            java.util.Arrays.copyOf(u.getBytes, u.getByteLength)
          case other =>
            other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
      case (BYTES, StringType) =>
        v => {
          val bb = v.asInstanceOf[ByteBuffer]
          val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
          UTF8String.fromBytes(bytes)
        }
      case (ENUM, StringType) =>
        v => UTF8String.fromString(v.asInstanceOf[GenericEnumSymbol[_]].toString)
      case (BYTES, d: DecimalType) =>
        v => {
          val bb = v.asInstanceOf[ByteBuffer]
          val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
          Decimal(BigDecimal(new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
        }
      case (FIXED, d: DecimalType) =>
        v => {
          val bytes = v.asInstanceOf[GenericFixed].bytes()
          Decimal(BigDecimal(new java.math.BigInteger(bytes), d.scale), d.precision, d.scale)
        }
      case (BYTES, BinaryType) =>
        v => {
          val bb = v.asInstanceOf[ByteBuffer]
          val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
          bytes
        }
      case (FIXED, BinaryType) => v => v.asInstanceOf[GenericFixed].bytes().clone()
      case (ARRAY, ArrayType(et, _)) =>
        val elem = reader(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[Any]].asScala
          new GenericArrayData(in.map(x => if (x == null) null else elem(x)).toArray)
        }
      case (MAP, MapType(StringType, vt, _)) =>
        val value = reader(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
          ArrayBasedMapData(
            keys = in.map(kv => UTF8String.fromString(kv._1.toString)).toArray,
            values = in.map(kv => if (kv._2 == null) null else value(kv._2)).toArray)
        }
      // struct-of-branches decode for multi-branch unions (resolve()
      // leaves them as UNION): tag = dense index into the non-null
      // branch list, exactly one member populated. resolveUnion gives
      // the branch the datum was actually written with — the same
      // dispatch GenericDatumReader used to decode it.
      case (UNION, st: StructType) =>
        val types = s.getTypes.asScala.toArray
        val nonNullIdx = types.zipWithIndex
          .filter(_._1.getType != NULL).map(_._2)
        val denseOf = nonNullIdx.zipWithIndex.toMap // union idx → tag
        val convs: Map[Int, Conv] = nonNullIdx.zipWithIndex.map {
          case (ui, di) => ui -> reader(types(ui), st.fields(di + 1).dataType)
        }.toMap
        v => {
          val ui = GenericData.get().resolveUnion(s, v)
          val out = new Array[Any](st.fields.length)
          val di = denseOf(ui)
          out(0) = di
          out(di + 1) = convs(ui)(v)
          new GenericInternalRow(out)
        }
      case (RECORD, st: StructType) =>
        // pos -1 = nested evolution null-fill: the requested (merged)
        // struct carries a field this file's writer schema lacks — the
        // same add-column semantics the top-level assemble() applies,
        // recursed into nested records. Lookup is name-then-alias
        // (SchemaConverter.resolveField): a field RENAMED by a later
        // generation decodes old files' values under its new name.
        val fieldConvs: Array[(Int, Conv)] = st.fields.map { f =>
          val af = SchemaConverter.resolveField(s, f)
          if (af == null) (-1, null: Conv)
          else (af.pos(), reader(af.schema(), f.dataType))
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](fieldConvs.length)
          var i = 0
          while (i < fieldConvs.length) {
            val (pos, c) = fieldConvs(i)
            out(i) =
              if (pos < 0) null
              else {
                val raw = rec.get(pos)
                if (raw == null) null else c(raw)
              }
            i += 1
          }
          new GenericInternalRow(out)
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported avro→spark pair: $other")
    }
  }

  def rowReader(schema: Schema, st: StructType): GenericRecord => InternalRow = {
    val conv = reader(schema, st)
    rec => conv(rec).asInstanceOf[InternalRow]
  }

  /** Catalyst value → avro datum, for the write path. */
  def writer(dt: DataType, schema: Schema): (InternalRow, Int) => Any = {
    val s = SchemaConverter.resolve(schema)
    dt match {
      case BooleanType => (r, i) => java.lang.Boolean.valueOf(r.getBoolean(i))
      case ByteType => (r, i) => java.lang.Integer.valueOf(r.getByte(i).toInt)
      case ShortType => (r, i) => java.lang.Integer.valueOf(r.getShort(i).toInt)
      case IntegerType | DateType => (r, i) => java.lang.Integer.valueOf(r.getInt(i))
      case LongType => (r, i) => java.lang.Long.valueOf(r.getLong(i))
      case TimestampType | TimestampNTZType =>
        (r, i) => java.lang.Long.valueOf(r.getLong(i)) // µs
      case _: TimeType => // nanos-of-day → time-micros
        (r, i) => java.lang.Long.valueOf(r.getLong(i) / 1000L)
      case FloatType => (r, i) => java.lang.Float.valueOf(r.getFloat(i))
      case DoubleType => (r, i) => java.lang.Double.valueOf(r.getDouble(i))
      case StringType => (r, i) => r.getUTF8String(i).toString
      case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
      case d: DecimalType =>
        (r, i) => ByteBuffer.wrap(
          r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
            .unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val elemW = valueWriter(et, s.getElementType)
        (r, i) => {
          val arr = r.getArray(i)
          val out = new java.util.ArrayList[Any](arr.numElements())
          var j = 0
          while (j < arr.numElements()) {
            out.add(if (arr.isNullAt(j)) null else elemW(arr.get(j, et)))
            j += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val valW = valueWriter(vt, s.getValueType)
        (r, i) => {
          val m = r.getMap(i)
          val out = new java.util.HashMap[String, Any](m.numElements())
          val ks = m.keyArray(); val vs = m.valueArray()
          var j = 0
          while (j < m.numElements()) {
            out.put(ks.getUTF8String(j).toString,
              if (vs.isNullAt(j)) null else valW(vs.get(j, vt)))
            j += 1
          }
          out
        }
      case st: StructType =>
        val rw = recordWriter(st, s)
        (r, i) => rw(r.getStruct(i, st.fields.length))
      case other =>
        throw new IllegalArgumentException(s"unsupported spark→avro type: $other")
    }
  }

  private def valueWriter(dt: DataType, schema: Schema): Any => Any = {
    val s = SchemaConverter.resolve(schema)
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | TimestampNTZType => identity
      case _: TimeType => // nanos-of-day → time-micros
        v => java.lang.Long.valueOf(v.asInstanceOf[Long] / 1000L)
      case ByteType => v => java.lang.Integer.valueOf(v.asInstanceOf[Byte].toInt)
      case ShortType => v => java.lang.Integer.valueOf(v.asInstanceOf[Short].toInt)
      case StringType => v => v.toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType => v => ByteBuffer.wrap(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val elemW = valueWriter(et, s.getElementType)
        v => {
          val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          val out = new java.util.ArrayList[Any](arr.numElements())
          var j = 0
          while (j < arr.numElements()) {
            out.add(if (arr.isNullAt(j)) null else elemW(arr.get(j, et)))
            j += 1
          }
          out
        }
      case st: StructType =>
        val rw = recordWriter(st, s)
        v => rw(v.asInstanceOf[InternalRow])
      case other =>
        throw new IllegalArgumentException(s"unsupported nested spark→avro: $other")
    }
  }

  def recordWriter(st: StructType, schema: Schema): InternalRow => GenericRecord = {
    val writers = st.fields.zipWithIndex.map { case (f, i) =>
      (i, f.name, writer(f.dataType, schema.getField(f.name).schema()))
    }
    row => {
      val rec = new GenericData.Record(schema)
      writers.foreach { case (i, name, w) =>
        rec.put(name, if (row.isNullAt(i)) null else w(row, i))
      }
      rec
    }
  }
}
