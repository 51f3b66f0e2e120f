package graft.tools

import graft.GraftSession

object ProbeAvroFns {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe-avro")
    import spark.implicits._
    import org.apache.spark.sql.avro.functions.{from_avro, to_avro}
    import org.apache.spark.sql.functions.col
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      val avroSchema =
        """{"type":"record","name":"r","fields":[
          |{"name":"id","type":"long"},{"name":"s","type":"string"}]}""".stripMargin
      val bin = df.select(to_avro(org.apache.spark.sql.functions.struct(col("id"), col("s"))).as("payload"))
      val back = bin.select(from_avro(col("payload"), avroSchema).as("r"))
        .select("r.id", "r.s")
      println("[avro] round-trip rows: " + back.collect().mkString(", "))
    } catch {
      case e: Throwable =>
        println("[avro] FAILED: " + e.getClass.getName + ": " + e.getMessage)
    }
    spark.stop()
  }
}
