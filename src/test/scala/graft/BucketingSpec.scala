package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling both sides of a recurring fact-fact join
  * into the same bucket layout removes the per-query Exchange entirely —
  * at 100 TB this converts every orders⋈lineitem query from a double
  * shuffle into a local zip of co-bucketed files. Verified here by plan
  * inspection (no Exchange above the bucketed scans) + row equality. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans without a shuffle and matches the plain join") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = Tables.load(spark, dir, "orders")
      val l = Tables.load(spark, dir, "lineitem")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders")
      l.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an exchange over the scans
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"unexpected shuffle above bucketed scans:\n$plan")
      val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
             plain.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
