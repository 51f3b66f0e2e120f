package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.TaskContext

/** Failure-handling behaviors the 100 TB design leans on: task retry
  * (transient executor failures must not fail the job) and AQE skew-join
  * splitting (one hot key must not pin a straggler task). */
class ResilienceSpec extends AnyFunSuite {

  test("task retry: a transiently-failing partition succeeds on reattempt") {
    // shared session runs local[4, 3] → up to 3 attempts per task
    val s = TestSpark.spark
    import s.implicits._
    val out = s.range(0, 1000, 1, 8).as[Long]
      .mapPartitions { it =>
        // first attempt of every partition dies; retries succeed
        if (TaskContext.get().attemptNumber() == 0)
          throw new RuntimeException("transient failure (simulated)")
        it
      }
      .count()
    assert(out == 1000)
  }

  test("AQE splits a skewed join partition") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 1 hot key (500k rows) + uniform tail; thresholds lowered so local
    // data sizes trigger the same skew handling a 100 TB job relies on
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(500000).select(
        // 90% of rows share key 7 — one shuffle partition dwarfs the rest
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // execute THIS dataframe's own QueryExecution so AQE finalizes it
      // (count() would plan a separate query and leave this one unrun)
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"))
      // SMJ marks split partitions with skew=true in the final plan
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n${plan.take(2000)}")
      assert(n > 0)
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
