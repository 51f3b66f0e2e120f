package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** pageRank per-iteration shuffle A/B (round 11): the contribution
  * relation (edge-sized) is checkpointed once, but if the checkpoint
  * carries NO partitioning, every iteration's `contrib ⋈ ranks` join
  * re-shuffles the edge relation — the recurring corpus-sized exchange
  * that dominates at 100 TB. Spark's `localCheckpoint` preserves the
  * executed plan's outputPartitioning in the LogicalRDD it plants, so
  * pre-partitioning contrib on the join key BEFORE the checkpoint
  * should let EnsureRequirements skip the contrib-side exchange in
  * every iteration (ranks, node-sized, still shuffles — that side is
  * cheap). Variant B also pre-partitions the nodes/ranks relations on
  * `node` so the per-iteration left join reuses their layout.
  *
  * Prints the measured A/B plus the per-iteration exchange counts from
  * the executed plans. Usage:
  * `sbt "runMain graft.tools.ProbePageRank [sfDir]"`.
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-pagerank")
    val edges = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))

    def time(label: String)(f: => DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1) best = math.min(best, dt)
        println(f"[probe-pr] $label rep$i: $dt%.2f s")
      }
      println(f"[probe-pr] $label best: $best%.2f s")
    }

    statusQuoInstrumented(edges, iters = 5)
    time("A pageRank (status quo)")(
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5))
    time("B pageRank (pre-partitioned checkpoints)")(
      prePartitioned(edges, iters = 5))

    val a = graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5)
      .select(col("node"), round(col("rank"), 6).as("pr"))
    val b = prePartitioned(edges, iters = 5)
      .select(col("node"), round(col("pr_rank"), 6).as("pr"))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[probe-pr] A vs B diff rows: $diff (must be 0)")
    spark.stop()
  }

  /** Exchange count of one iteration's PRE-checkpoint plan — what the
    * checkpoint execution actually runs per iteration. */
  private def reportExchanges(tag: String, step: DataFrame): Unit = {
    step.write.format("noop").mode("overwrite").save() // settle AQE
    val p = step.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val ex = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
    println(s"[probe-pr] $tag iteration-1 FINAL plan: exchanges=$ex " +
      s"broadcastJoins=$bhj sortMergeJoins=$smj")
  }

  /** Status-quo shape with the same instrumentation. */
  def statusQuoInstrumented(edges: DataFrame, iters: Int,
                            damping: Double = 0.85): Unit = {
    val raw = edges.select(col("src").cast("string").as("a"),
      col("dst").cast("string").as("b"))
    val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val nodes = dir.select(col("a").as("node"))
      .unionAll(dir.select(col("b").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val contrib = dir
      .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
      .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w"))
      .localCheckpoint()
    val ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    val inflow = contrib
      .join(ranks, contrib("a") === ranks("node"))
      .groupBy(col("b").as("node"))
      .agg(sum(col("rank") * col("w")).as("_in"))
    val step = nodes.join(inflow, Seq("node"), "left")
      .select(col("node"),
        (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_in"), lit(0.0)))
          .as("rank"))
    reportExchanges("A", step)
  }

  /** pageRank copy with contrib/nodes/ranks hash-partitioned on their
    * join keys BEFORE each localCheckpoint. */
  def prePartitioned(edges: DataFrame, iters: Int,
                     damping: Double = 0.85): DataFrame = {
    val raw = edges.select(col("src").cast("string").as("a"),
      col("dst").cast("string").as("b"))
    val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val nodes = dir.select(col("a").as("node"))
      .unionAll(dir.select(col("b").as("node")))
      .distinct().repartition(col("node")).localCheckpoint()
    val n = nodes.count()
    val contrib = dir
      .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
      .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w"))
      .repartition(col("a")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (i <- 1 to iters) {
      val inflow = contrib
        .join(ranks, contrib("a") === ranks("node"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("rank") * col("w")).as("_in"))
      val step = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_in"), lit(0.0)))
            .as("rank"))
      if (i == 1) reportExchanges("B", step)
      ranks = step.localCheckpoint()
    }
    ranks.select(col("node"), (col("rank") * n).as("pr_rank"))
  }
}
