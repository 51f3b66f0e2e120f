package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 probe: pageRank is the ONE iterative operator with no
  * per-round driver decision (kCore counts for convergence, BFS tests
  * frontier emptiness, dupClusters counts changed labels — all inherent
  * per-round materializations). So its per-round checkpoint is a chosen
  * cadence, not a requirement: cutting every K rounds trades
  * checkpoint write+read+job-scheduling overhead against plan depth
  * (≤ K chained join+agg stages per materialized job — AQE handles
  * chained shuffles; the risk is only optimizer time on deep plans).
  * Classic BSP practice checkpoints every N rounds, not every round.
  *
  * Arms: cadence 1 (status quo), 2, 5 (= never inside c57's 5-iter
  * budget: one deep job). c57's exact graph at sf0.1, 5 iters, warm +
  * min-of-2, value checksum printed per arm to prove identity. */
object ProbePrCadence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-prcadence")
    import graft.operators.Ckpt

    def edges: DataFrame = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))

    // pageRank body with a cut cadence knob (the operator's loop,
    // re-expressed here so the probe can vary what the API pins)
    def pr(cadence: Int): DataFrame = {
      val raw = edges.select(col("src").cast("string").as("a"),
        col("dst").cast("string").as("b"))
      val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b"))).distinct()
      val nodes = Ckpt.local(dir.select(col("a").as("node"))
        .unionAll(dir.select(col("b").as("node"))).distinct())
      val n = nodes.count()
      val contrib = Ckpt.local(dir
        .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
        .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w")))
      var ranks = Ckpt.local(nodes.withColumn("rank", lit(1.0 / n)))
      val iters = 5
      for (i <- 1 to iters) {
        val inflow = contrib.join(ranks, contrib("a") === ranks("node"))
          .groupBy(col("b").as("node")).agg(sum(col("rank") * col("w")).as("_in"))
        val step = nodes.join(inflow, Seq("node"), "left")
          .select(col("node"), (lit((1.0 - 0.85) / n) +
            lit(0.85) * coalesce(col("_in"), lit(0.0))).as("rank"))
        ranks = if (i % cadence == 0 || i == iters) Ckpt.local(step) else step
      }
      ranks.select(col("node"), round(col("rank") * n, 6).as("pr"))
    }

    def sweep(): Unit = {
      Ckpt.releaseIssued(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def run(cadence: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = pr(cadence)
      // checksum proves value identity across arms (sum of rounded
      // ranks xor-hashed with node) while fully materializing
      val chk = out.select(xxhash64(col("node"), col("pr")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      (dt, chk)
    }
    for (cadence <- Seq(1, 2, 5)) {
      val warm = run(cadence)
      val a = run(cadence); val b = run(cadence)
      assert(a._2 == warm._2 && b._2 == warm._2, "checksum drift within arm")
      println(f"[prcadence] cadence=$cadence warm=${warm._1}%6.2f " +
        f"min=${math.min(a._1, b._1)}%6.2f reps=[${a._1}%.2f,${b._1}%.2f] chk=${warm._2}")
    }
    spark.stop()
  }
}
