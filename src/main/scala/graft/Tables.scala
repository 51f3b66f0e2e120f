package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures
  * (/root/repo/TESTDATA.md, schemas in /root/repo/FIXTURES.md).
  *
  * All queries read through here so the scan path is uniform: parquet
  * with filter pushdown + column pruning handled by Catalyst. At 100 TB
  * these would be partitioned-directory datasets; the API is unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as long and truncate to micros —
    // exactly DuckDB's ns→us conversion, so oracles stay comparable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql paths:
    * CTEs, GROUPING SETS, subqueries). Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
