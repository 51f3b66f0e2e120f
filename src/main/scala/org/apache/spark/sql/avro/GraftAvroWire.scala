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
  * struct. Two parse modes, mirroring upstream `from_avro`'s contract:
  * PERMISSIVE (`failFast = false`, this engine's source convention) —
  * corrupt payloads yield NULL so a bad message cannot kill an ingest
  * job; pair with a `decoded IS NULL` audit filter (the m6
  * decode-health pattern) to quantify them. FAILFAST
  * (`failFast = true`) — a malformed payload fails the task loudly,
  * the right default when silence would hide a producer bug. Matching
  * upstream's catch breadth, any non-fatal exception from the decode
  * path counts as a malformed record (Avro reader internals can throw
  * beyond IOException — e.g. ClassCastException off an odd datum
  * path — and a bad message must never kill a PERMISSIVE ingest job);
  * fatal JVM errors propagate in both modes. */
case class AvroDecode(child: Expression, jsonSchema: String,
                      failFast: Boolean = false)
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
    // upstream from_avro's breadth: any non-fatal exception off the
    // decode path is a malformed record (truncation/garbage surface as
    // IOException/AvroRuntimeException/out-of-bounds, but the reader
    // can also throw e.g. ClassCastException on odd datum paths) —
    // NULL in PERMISSIVE, loud task failure in FAILFAST
    case scala.util.control.NonFatal(e) =>
      if (failFast) throw new IllegalArgumentException(
        s"graft_from_avro: malformed Avro payload in FAILFAST mode " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
          "use PERMISSIVE mode to decode corrupt records as NULL", e)
      else null
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
    * payloads decode to NULL (PERMISSIVE, the source convention). */
  def from_avro_wire(c: Column, jsonSchema: String): Column =
    GraftColumnBridge.column(AvroDecode(GraftColumnBridge.expression(c), jsonSchema))

  /** Parse-mode form: "PERMISSIVE" (corrupt → NULL) or "FAILFAST"
    * (corrupt payload fails the task) — upstream `from_avro`'s two
    * modes. */
  def from_avro_wire(c: Column, jsonSchema: String, mode: String): Column = {
    // Locale.ROOT: under e.g. a Turkish default locale "failfast"
    // would uppercase to "FAİLFAST" and a valid mode would be rejected
    val ff = mode.toUpperCase(java.util.Locale.ROOT) match {
      case "FAILFAST" => true
      case "PERMISSIVE" => false
      case other => throw new IllegalArgumentException(
        s"from_avro_wire mode must be PERMISSIVE or FAILFAST, got '$other'")
    }
    GraftColumnBridge.column(
      AvroDecode(GraftColumnBridge.expression(c), jsonSchema, ff))
  }

  /** JSON Avro schema for a Catalyst type — EXACTLY the writer schema
    * [[AvroEncode]] derives, so a decode against it is schema-identical
    * by construction. */
  def avroSchemaFor(dt: DataType): String =
    SchemaConverters.toAvroType(dt, nullable = false, "topLevelRecord", "")
      .toString
}
