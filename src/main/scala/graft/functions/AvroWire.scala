package graft.functions

import org.apache.spark.sql.Column

/** graft-side facade for the Avro wire codec expressions, which live in
  * `org.apache.spark.sql.avro` because the bundled
  * AvroSerializer/AvroDeserializer are `private[sql]` in the Scala
  * signature (the GraftColumnBridge split-package precedent). */
object AvroWire {
  /** Struct column → Avro binary. */
  def to_avro_wire(c: Column): Column =
    org.apache.spark.sql.avro.AvroWireFunctions.to_avro_wire(c)

  /** Avro binary → struct per the JSON reader schema; corrupt payloads
    * decode to NULL (PERMISSIVE). */
  def from_avro_wire(c: Column, jsonSchema: String): Column =
    org.apache.spark.sql.avro.AvroWireFunctions.from_avro_wire(c, jsonSchema)

  /** Parse-mode form: "PERMISSIVE" (corrupt → NULL) or "FAILFAST"
    * (corrupt payload fails the task loudly). */
  def from_avro_wire(c: Column, jsonSchema: String, mode: String): Column =
    org.apache.spark.sql.avro.AvroWireFunctions.from_avro_wire(c, jsonSchema, mode)

  /** The exact writer schema `to_avro_wire` derives for a Catalyst
    * type, as JSON — feed it back into `from_avro_wire`. */
  def avroSchemaFor(dt: org.apache.spark.sql.types.DataType): String =
    org.apache.spark.sql.avro.AvroWireFunctions.avroSchemaFor(dt)
}
