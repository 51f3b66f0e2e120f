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

  test("hll_sketch union estimate within 5% of exact, per shard and merged (q97 tier)") {
    val ev = Tables.load(spark, dir, "events")
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("_sk"),
        countDistinct(col("user_id")).as("exact_users"))
    val per = perType
      .select(col("event_type"), col("exact_users"),
        hll_sketch_estimate(col("_sk")).as("approx_users"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val e = r.getAs[Long]("exact_users").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(a - e) / e < 0.05,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
    // the shard-rollup path: union the per-type sketches (never re-scan
    // the data) and compare against the exact global distinct
    val merged = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"), lit(false)))
        .as("approx_all"))
      .collect()(0).getAs[Long]("approx_all").toDouble
    val exactAll = ev.agg(countDistinct(col("user_id")).as("n"))
      .collect()(0).getAs[Long]("n").toDouble
    assert(math.abs(merged - exactAll) / exactAll < 0.05,
      s"union estimate $merged vs exact $exactAll")
  }

  test("streaming windowed HLL estimate within 5% of exact per window (s16 tier)") {
    val streamed = graft.streaming.Streams.runToCompletion(spark,
        graft.streaming.Streams.windowApproxUsers(
          graft.streaming.Streams.eventStream(spark, dir)), "s16_spec")
      .collect().map(r => r.getAs[java.sql.Timestamp]("window_start") ->
        r.getAs[Long]("approx_users")).toMap
    val exact = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .collect().map(r => r.getAs[java.sql.Timestamp]("ws") ->
        r.getAs[Long]("n")).toMap
    assert(streamed.keySet == exact.keySet,
      s"window sets differ: ${streamed.keySet.size} vs ${exact.keySet.size}")
    streamed.foreach { case (w, est) =>
      val e = exact(w).toDouble
      assert(math.abs(est - e) / e < 0.05, s"window $w: approx $est vs exact $e")
    }
  }

  test("percentile_approx rank error bounded by 1/accuracy (q96 tier)") {
    // the GK-style sketch guarantees each returned element's TRUE rank
    // is within 1/accuracy of the requested quantile; verify that
    // empirically per group: rank(v) = count(x <= v) / n
    val acc = 100
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).cache()
    try {
      val approx = orders.groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"),
          array(qs.map(lit): _*), lit(acc)).as("pa"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[Any](1).map(v => v.asInstanceOf[Number].doubleValue()))
        .toMap
      assert(approx.nonEmpty)
      approx.foreach { case (grp, vals) =>
        val col0 = orders.filter(col("o_orderpriority") === grp)
          .select(col("o_totalprice").cast("double"))
          .collect().map(_.getDouble(0))
        val n = col0.length.toDouble
        qs.zip(vals).foreach { case (q, v) =>
          // with ties, the true rank of v is an interval [loRank, hiRank]
          val loRank = col0.count(_ < v) / n
          val hiRank = col0.count(_ <= v) / n
          val err = if (q < loRank) q - loRank else if (q > hiRank) q - hiRank else 0.0
          assert(math.abs(err) <= 1.0 / acc + 1e-9,
            s"$grp q=$q: value $v has rank [$loRank,$hiRank], error $err > 1/$acc")
        }
      }
    } finally orders.unpersist()
  }

  test("CMS heavy hitters: never underestimates, overshoot within eps·N (c97 tier)") {
    val out = SparkEntry.queries("c97_cms_heavyhitters")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20, s"expected top-20, got ${rows.length}")
    val total = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), "\\s+")))
      .count()
    for ((tok, t, e) <- rows) {
      assert(e >= t, s"CMS underestimated '$tok': $e < $t")
      // deterministic seeded sketch: the eps·N overshoot bound holds
      // with confidence 0.99 per query; 3x slack keeps the pin robust
      assert(e - t <= 3 * 0.001 * total + 1,
        s"'$tok' overshoot ${e - t} exceeds 3·eps·N=${3 * 0.001 * total}")
    }
  }
}
