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

  test("jdbc reader builds partitioned-read options (no DB in container — plan only)") {
    // no JDBC driver is shipped in /opt/spark/jars, so constructing the
    // reader must fail at connect/driver time, not at option plumbing
    val e = intercept[Exception] {
      Sources.jdbc(spark, "jdbc:h2:mem:none", "t",
        partitionColumn = Some(("id", 0L, 100L)), numPartitions = 5).count()
    }
    val msg = String.valueOf(e.getMessage)
    assert(msg.contains("driver") || msg.contains("Driver") || msg.contains("connect"),
      s"unexpected failure mode: $msg")
  }
}
