package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup.topKPerGroup

class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals the window idiom on the orders fixture") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val mine = topKPerGroup(o, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(mine.nonEmpty && mine == ref)
  }

  test("plan: bounded-heap partial under final, exactly one exchange") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val df = topKPerGroup(o, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    df.collect()
    // the AQE string renders the plan twice (final + initial) — count
    // structure in the final section only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert(plan.contains("TopKPerGroupFinal"), s"no final exec:\n$plan")
    assert(plan.contains("TopKPerGroupPartial"), s"no partial exec:\n$plan")
    assert(plan.contains("hashpartitioning(o_custkey"),
      s"no clustered exchange on the group key:\n$plan")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nEx == 1, s"expected exactly one exchange, got $nEx:\n$plan")
    // no per-group Sort: the whole point is that the heap replaces it
    assert(!plan.contains("Sort ["), s"unexpected sort in the plan:\n$plan")
  }

  test("ties break on the tie-break column; small groups survive whole") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 7.0), // tie at 10 → id 1
      ("b", 4L, 1.0),                                    // group smaller than k
      (null.asInstanceOf[String], 5L, 3.0),              // null group key is a group
      (null.asInstanceOf[String], 6L, 4.0)
    ).toDF("g", "id", "v")
    val out = topKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k = 1)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 4L, 6L), s"got $out")
    val all = topKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k = 5)
      .count()
    assert(all == 6, "k larger than every group must keep everything")
  }

  test("ambiguous column names fail loudly instead of binding the first match") {
    // post-join frame with two attributes named `v` — silently taking
    // the first would mis-bind the sort and return a plausible-but-
    // wrong top-k
    val a = Seq(("g", 1L, 5.0)).toDF("g", "id", "v")
    val b = Seq((1L, 9.0)).toDF("id2", "v")
    val joined = a.join(b, a("id") === b("id2"))
    val e = intercept[IllegalArgumentException] {
      topKPerGroup(joined, Seq("g"), Seq(("v", true), ("id", false)), k = 1)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("per-group output arrives in sort order before the final orderBy") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 9.0), ("g", 3L, 7.0))
      .toDF("g", "id", "v")
    val rows = topKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k = 3)
      .select("id").as[Long].collect().toSeq
    assert(rows == Seq(2L, 3L, 1L), s"got $rows")
  }
}
