package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter): when
  * one side of a shuffled join is made selective by a filter, Spark can
  * build a bloom filter over its join keys and push a `might_contain`
  * probe into the OTHER side's scan — at 100 TB this prunes fact rows
  * before they ever enter the shuffle, the single biggest lever on a
  * selective fact⋈dim join that exceeds broadcast size. The thresholds
  * here are production defaults scaled to fixture size; the assertion is
  * on the optimized plan, which is what decides the shuffle volume.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective shuffled join injects a bloom-filter probe on the fact side") {
    val dir = "/root/testdata/sf0.01"
    val keep = Seq(
      // fire regardless of fixture size: any scan is big enough to
      // benefit, creation side may be up to 100 MB
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // force a shuffled join — broadcast joins don't need runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = keep.map { case (k, _) => k -> spark.conf.getOption(k) }
    keep.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 500000) // selective creation side
      val lineitem = Tables.load(spark, dir, "lineitem")
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter probe in the optimized plan:\n$optimized")
      // and the probed plan still computes the right thing
      val expected = lineitem.join(orders.hint("broadcast"),
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
