package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned-directory layout behaviors that carry the 100 TB design:
  * partition pruning (a filtered query must read only matching
  * directories) and dynamic partition overwrite (idempotent per-
  * partition backfill without touching sibling partitions). */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("partition pruning: filter on the partition column prunes the scan") {
    val work = Files.createTempDirectory("graft_part").toString
    Tables.load(spark, dir, "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
    val q = spark.read.parquet(s"$work/docs").filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition filter in scan:\n$scan")
    // only the lang=en directory is read
    val n = q.count()
    val direct = spark.read.parquet(s"$work/docs/lang=en").count()
    assert(n == direct && n > 0)
  }

  test("dynamic partition overwrite replaces only the written partition") {
    val work = Files.createTempDirectory("graft_dpo").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val docs = Tables.load(spark, dir, "documents")
      docs.write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
      val before = spark.read.parquet(s"$work/docs")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // "backfill" the en partition with half its rows
      docs.filter(col("lang") === "en").filter(col("doc_id") % 2 === 0)
        .write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
      val after = spark.read.parquet(s"$work/docs")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after("en") < before("en"))
      (before.keySet - "en").foreach(l => assert(after(l) == before(l),
        s"sibling partition $l changed: ${before(l)} -> ${after(l)}"))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }
}
