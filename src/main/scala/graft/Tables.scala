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
    // events.ts precision varies by fixture generation: TIMESTAMP(NANOS)
    // (which Spark's vectorized reader rejects — read nanos as long and
    // truncate to micros, exactly DuckDB's ns→us conversion) or already
    // TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ — cast to TIMESTAMP;
    // value-preserving under the session's UTC timezone). Either way the
    // column lands as micro-precision TimestampType, oracle-comparable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Register every fixture table as a temp view (for spark.sql paths:
    * CTEs, GROUPING SETS, subqueries). Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
