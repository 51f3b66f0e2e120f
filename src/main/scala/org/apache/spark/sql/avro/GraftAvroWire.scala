package org.apache.spark.sql.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Column-level Avro wire codec — the `from_avro`/`to_avro` capability
  * this Spark distribution ships headless: the SQL functions exist but
  * throw `AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE` because the connector
  * expression classes are absent, while the actual codec machinery
  * (`AvroSerializer`/`AvroDeserializer`/`SchemaConverters`, public
  * constructors) IS bundled for the Avro file format. These expressions
  * rebuild the wire tier on that public machinery, so Kafka-style
  * binary payload columns round-trip without the missing module.
  *
  * CodegenFallback by design: the per-row work is dominated by the Avro
  * datum reader/writer, which generated Java could not inline anyway —
  * unlike the hot-path arithmetic expressions (DotProduct, SlidingMin)
  * where staying inside whole-stage codegen is the point.
  *
  * Scale shape: pure per-row projection — no shuffle, no state; the
  * (de)serializers are built once per task via transient lazy vals.
  */
case class AvroEncode(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_to_avro"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_to_avro requires a struct input, got ${dt.simpleString}")
  }

  @transient private lazy val avroSchema: Schema =
    SchemaConverters.toAvroType(child.dataType, nullable = false,
      "topLevelRecord", "")
  @transient private lazy val serializer =
    new AvroSerializer(child.dataType, avroSchema, false)
  @transient private lazy val writer =
    new GenericDatumWriter[Any](avroSchema)
  @transient private var encoder: BinaryEncoder = _
  @transient private lazy val out = new ByteArrayOutputStream()

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** Inverse of [[AvroEncode]]: decode a binary Avro payload against a
  * caller-supplied reader schema (JSON) into the equivalent Catalyst
  * struct. Corrupt payloads yield NULL rather than failing the task —
  * the PERMISSIVE-mode convention of this engine's sources — so a bad
  * message cannot kill an ingest job; pair with a `decoded IS NULL`
  * audit filter (the m6 decode-health pattern) to quantify them. */
case class AvroDecode(child: Expression, jsonSchema: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(jsonSchema)

  override lazy val dataType: DataType =
    SchemaConverters.toSqlType(avroSchema).dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_avro"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_from_avro requires a binary input, got ${dt.simpleString}")
  }

  @transient private lazy val deserializer =
    new AvroDeserializer(avroSchema, dataType, "CORRECTED",
      false, "", -1)
  @transient private lazy val reader =
    new GenericDatumReader[Any](avroSchema)
  @transient private var decoder: BinaryDecoder = _
  @transient private var datum: Any = _

  override def nullSafeEval(input: Any): Any = try {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    datum = reader.read(datum, decoder)
    deserializer.deserialize(datum).getOrElse(null)
  } catch {
    case _: Exception => null
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

object AvroWireFunctions {
  /** Struct column → Avro binary (writer schema derived from the
    * struct's Catalyst type, non-nullable record at the top level). */
  def to_avro_wire(c: Column): Column =
    GraftColumnBridge.column(AvroEncode(GraftColumnBridge.expression(c)))

  /** Avro binary → struct per the JSON reader schema; corrupt
    * payloads decode to NULL. */
  def from_avro_wire(c: Column, jsonSchema: String): Column =
    GraftColumnBridge.column(AvroDecode(GraftColumnBridge.expression(c), jsonSchema))

  /** JSON Avro schema for a Catalyst type — EXACTLY the writer schema
    * [[AvroEncode]] derives, so a decode against it is schema-identical
    * by construction. */
  def avroSchemaFor(dt: DataType): String =
    SchemaConverters.toAvroType(dt, nullable = false, "topLevelRecord", "")
      .toString
}
