package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import java.nio.file.Files
import graft.sources.Sources
import graft.sources.Sources.SourceSpec

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))
    .toDF("id", "name", "score")

  test("parquet/csv/json round-trip preserves rows (explicit schema for text)") {
    val work = Files.createTempDirectory("graft_src").toString
    val df = sample
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      val opts = if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String]
      Sources.write(df, fmt, s"$work/$fmt", SaveMode.Overwrite, opts)
      val back = Sources.read(spark, SourceSpec(fmt, s"$work/$fmt",
        schema = if (fmt == "parquet") None else Some(df.schema), options = opts))
      assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq,
        s"round-trip mismatch for $fmt")
    }
  }

  test("jdbc round-trip: batched write then partitioned read (embedded Derby)") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:srcRt;create=true"
    val df = spark.range(1, 5001)
      .selectExpr("CAST(id AS INT) AS id", "concat('row_', id) AS name",
        "CAST(id AS DOUBLE) / 7 AS score")
    Sources.write(df, "jdbc", "", SaveMode.Overwrite,
      Map("url" -> url, "dbtable" -> "rt"))
    val back = Sources.jdbc(spark, url, "rt",
      partitionColumn = Some(("id", 1L, 5000L)), numPartitions = 5)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.count() == 5000)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
