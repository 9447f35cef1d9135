package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Confluent Schema Registry wire format: magic byte 0x00 + 4-byte
  * big-endian schema id + Avro binary body.
  *
  * Exact framing per the reference producer/consumer
  * (reference: internal/pipeline/producer.go:425-447 encode,
  * consumer.go:219-241 decode+validation: length >= 5, magic byte 0x00,
  * big-endian id, Avro body). SURVEY.md §1.2 flags this as one of the few
  * genuinely custom pieces — Spark's stock from_avro/to_avro (absent from
  * this sandbox anyway) does not strip the header.
  *
  * Both expressions are CodegenFallback: the per-row work is an Avro
  * runtime encode/decode (black-box library call), which codegen could
  * not inline anyway. Used at source/sink boundaries, not inside the
  * relational hot path.
  */
object ConfluentWire {

  /** column: decode a Confluent-framed binary column into a struct of the
    * given AVRO schema. Malformed rows (short, bad magic byte, Avro decode
    * failure) become null — the streaming analog of ignore-parse-errors;
    * pair with a `.filter(col.isNotNull)` + metric for validation. */
  def decode(bytes: Column, schemaJson: String): Column =
    Glue.toColumn(ConfluentDecodeExpr(Glue.toExpr(bytes), schemaJson))

  /** column: encode a struct column into Confluent framing with the given
    * schema id (as assigned by the registry for the subject). */
  def encode(payload: Column, schemaJson: String, schemaId: Int): Column =
    Glue.toColumn(ConfluentEncodeExpr(Glue.toExpr(payload), schemaJson, schemaId))

  /** Wire-format header check without decoding (consumer validation). */
  def isValidFrame(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 && bytes(0) == 0x00

  /** Extract the big-endian schema id (caller must have checked the frame). */
  def schemaId(bytes: Array[Byte]): Int =
    ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)

  // ---- Avro <-> Catalyst value conversion over the AvroSchemas matrix ----

  /** `schema` is the (union-resolved) writer schema of THIS value — the
    * authoritative source of logical types for values nested inside
    * collections, where Catalyst has no per-element metadata slot. The
    * StructField metadata is kept as a fallback for top-level fields. */
  private[avro] def toCatalyst(v: Any, dt: DataType, meta: Metadata,
                               schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (s, StringType) => UTF8String.fromString(s.toString) // Utf8, String, enum symbol
    case (i: Integer, IntegerType) => i.intValue()
    case (l: java.lang.Long, LongType) => l.longValue()
    // int-typed Avro mapped to a Spark long — e.g. time-millis, whose wire
    // type is int but whose Spark mapping is LongType (no Spark TIME type)
    case (i: Integer, LongType) => i.longValue()
    case (f: java.lang.Float, FloatType) => f.floatValue()
    case (d: java.lang.Double, DoubleType) => d.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case (arr: Array[Byte], BinaryType) => arr
    case (i: Integer, DateType) => i.intValue() // days since epoch on both sides
    case (l: java.lang.Long, TimestampType) =>
      if (isTsMillis(meta, schema)) l.longValue() * 1000L else l.longValue()
    case (coll: java.util.Collection[_], ArrayType(et, _)) =>
      val es = resolveUnion(schema.getElementType)
      new GenericArrayData(coll.asScala.map(toCatalyst(_, et, Metadata.empty, es)).toArray)
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val vs = resolveUnion(schema.getValueType)
      val entries = m.asScala.toSeq
      ArrayBasedMapData(
        entries.map(e => UTF8String.fromString(e._1.toString)).toArray[Any],
        entries.map(e => toCatalyst(e._2, vt, Metadata.empty, vs)).toArray[Any])
    case (rec: GenericRecord, st: StructType) =>
      val recSchema = rec.getSchema
      val row = new Array[Any](st.fields.length)
      var i = 0
      while (i < st.fields.length) {
        val f = st.fields(i)
        val fs = Option(recSchema.getField(f.name)).map(x => resolveUnion(x.schema()))
          .getOrElse(recSchema)
        row(i) = toCatalyst(rec.get(f.name), f.dataType, f.metadata, fs)
        i += 1
      }
      InternalRow.fromSeq(row.toIndexedSeq)
    case (other, t) =>
      throw new IllegalArgumentException(
        s"cannot convert Avro value of ${other.getClass.getName} to ${t.catalogString}")
  }

  private[avro] def toAvro(v: Any, dt: DataType, meta: Metadata, schema: Schema): AnyRef = {
    if (v == null) return null
    val resolved = resolveUnion(schema)
    (v, dt) match {
      case (s: UTF8String, StringType) =>
        if (resolved.getType == Schema.Type.ENUM)
          new GenericData.EnumSymbol(resolved, s.toString)
        else new Utf8(s.toString)
      case (i: Int, IntegerType) => Int.box(i)
      case (l: Long, LongType) =>
        // Spark LongType may back an int-typed Avro field (time-millis has
        // no Spark TIME type); the writer needs the schema's box, not the
        // Catalyst one
        if (resolved.getType == Schema.Type.INT) Int.box(l.toInt) else Long.box(l)
      case (f: Float, FloatType) => Float.box(f)
      case (d: Double, DoubleType) => Double.box(d)
      case (b: Boolean, BooleanType) => Boolean.box(b)
      case (bytes: Array[Byte], BinaryType) => ByteBuffer.wrap(bytes)
      case (days: Int, DateType) => Int.box(days)
      case (micros: Long, TimestampType) =>
        Long.box(if (isTsMillis(meta, resolved)) micros / 1000L else micros)
      case (arr: ArrayData, ArrayType(et, _)) =>
        val elemSchema = resolved.getElementType
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toAvro(arr.get(i, et), et, Metadata.empty, elemSchema))
          i += 1
        }
        out
      case (m: MapData, MapType(StringType, vt, _)) =>
        val valueSchema = resolved.getValueType
        val out = new java.util.HashMap[AnyRef, AnyRef](m.numElements())
        val keys = m.keyArray()
        val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          out.put(keys.getUTF8String(i).toString,
            toAvro(vals.get(i, vt), vt, Metadata.empty, valueSchema))
          i += 1
        }
        out
      case (row: InternalRow, st: StructType) =>
        val rec = new GenericData.Record(resolved)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          val fieldSchema = resolved.getField(f.name).schema()
          rec.put(f.name, toAvro(row.get(i, f.dataType), f.dataType, f.metadata, fieldSchema))
          i += 1
        }
        rec
      case (other, t) =>
        throw new IllegalArgumentException(
          s"cannot convert Catalyst value of ${other.getClass.getName} (${t.catalogString}) to Avro")
    }
  }

  private def resolveUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def logicalOf(meta: Metadata): String =
    if (meta.contains("avro.logicalType")) meta.getString("avro.logicalType") else ""

  /** timestamp-millis detection: StructField metadata for top-level fields,
    * the Avro schema's logicalType prop for values inside collections
    * (Catalyst has no per-element metadata). */
  private def isTsMillis(meta: Metadata, schema: Schema): Boolean =
    logicalOf(meta) == "timestamp-millis" ||
      (schema != null && schema.getProp("logicalType") == "timestamp-millis")
}

/** Strip + validate Confluent framing, decode the Avro body into a struct.
  * Malformed input → null (validating-consumer behavior is built on top). */
case class ConfluentDecodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](avroSchema)
  @transient private lazy val structType = AvroSchemas.parse(schemaJson).structType

  override def dataType: DataType = structType
  override def nullable: Boolean = true
  override def prettyName: String = "confluent_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"confluent_decode needs binary, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (!ConfluentWire.isValidFrame(bytes)) return null
    try {
      val decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
      val rec = reader.read(null, decoder)
      ConfluentWire.toCatalyst(rec, structType, Metadata.empty, avroSchema)
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentDecodeExpr =
    copy(child = newChild)
}

/** Encode a struct into Avro binary and prepend the Confluent header. */
case class ConfluentEncodeExpr(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](avroSchema)
  @transient private lazy val structType = AvroSchemas.parse(schemaJson).structType

  override def dataType: DataType = BinaryType
  override def prettyName: String = "confluent_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"confluent_encode needs a struct, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val rec = ConfluentWire.toAvro(row, structType, Metadata.empty, avroSchema)
      .asInstanceOf[GenericRecord]
    val body = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(body, null)
    writer.write(rec, encoder)
    encoder.flush()
    val avroBytes = body.toByteArray
    val out = new Array[Byte](5 + avroBytes.length)
    out(0) = 0x00
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(avroBytes, 0, out, 5, avroBytes.length)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentEncodeExpr =
    copy(child = newChild)
}
