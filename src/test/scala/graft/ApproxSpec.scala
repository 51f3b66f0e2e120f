package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** approx_count_distinct (HLL++) has no value-equal oracle; assert its
  * relative error against the exact count instead. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% (default) / 2% (rsd=0.01) of exact") {
    val li = Tables.load(spark, dir, "lineitem")
    val rows = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eP = r.getAs[Long]("exact_parts").toDouble
      val aP = r.getAs[Long]("approx_parts").toDouble
      val eO = r.getAs[Long]("exact_orders").toDouble
      val aO = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(aP - eP) / eP < 0.05, s"parts: approx $aP vs exact $eP")
      assert(math.abs(aO - eO) / eO < 0.02, s"orders: approx $aO vs exact $eO")
    }
  }
}
