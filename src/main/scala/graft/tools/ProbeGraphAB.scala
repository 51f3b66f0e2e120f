package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Ckpt, CkptChain, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 A/B: OLD graph round shapes (inline copies of the r15
  * implementations) vs the NEW ones (Graph.scala), alternating in ONE
  * process so host windows hit both arms; decision metric is min over
  * reps (the bench's own estimator). */
object ProbeGraphAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-ab")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      Ckpt.releaseIssued(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- OLD implementations (r15 HEAD copies) ----
    def oldKCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
      val ch = new CkptChain(edges.sparkSession, None)
      var e = edges
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .unionAll(edges.select(col("v").cast("long").as("u"),
          col("u").cast("long").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .transform(ch.cut("e"))
      var prev = e.count()
      var r = 0
      while (r < rounds && prev > 0) {
        val keep = e.groupBy("u").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select("u")
        e = e.join(keep, Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
          .select("u", "v")
          .transform(ch.cut("e"))
        val cur = e.count()
        r = if (cur == prev) rounds else r + 1
        prev = cur
      }
      ch.close("e")
      e.groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
    }
    def oldPageRank(edges: DataFrame, iters: Int): DataFrame = {
      val damping = 0.85
      val ch = new CkptChain(edges.sparkSession, None)
      val raw = edges.select(col("src").as("a"), col("dst").as("b"))
      val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b")))
        .distinct()
      val nodes = dir.select(col("a").as("node"))
        .unionAll(dir.select(col("b").as("node")))
        .distinct().transform(ch.cut("nodes"))
      val n = nodes.count()
      val contrib = dir
        .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
        .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w"))
        .transform(ch.cut("contrib"))
      var ranks = nodes.withColumn("rank", lit(1.0 / n)).transform(ch.cut("ranks"))
      for (_ <- 1 to iters) {
        val inflow = contrib
          .join(ranks, contrib("a") === ranks("node"))
          .groupBy(col("b").as("node"))
          .agg(sum(col("rank") * col("w")).as("_in"))
        ranks = nodes.join(inflow, Seq("node"), "left")
          .select(col("node"),
            (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_in"), lit(0.0)))
              .as("rank"))
          .transform(ch.cut("ranks"))
      }
      ch.close("ranks")
      ranks.select(col("node"), (col("rank") * n).as("rank"))
    }
    def oldPairs(rel: DataFrame, minShared: Long, maxItemDeg: Long): DataFrame = {
      val b = rel.select(col("c").as("e"), col("p").as("i")).distinct()
      val paired = if (maxItemDeg > 0) {
        val keep = b.groupBy("i").agg(count(lit(1)).as("_id"))
          .filter(col("_id") <= maxItemDeg).select("i")
        b.join(keep, "i")
      } else b
      paired.as("x").join(paired.as("y"),
          col("x.i") === col("y.i") && col("x.e") < col("y.e"))
        .groupBy(col("x.e").as("id_a"), col("y.e").as("id_b"))
        .agg(count(lit(1)).as("common"))
        .filter(col("common") >= minShared)
    }

    // ---- shared inputs ----
    def e57() = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct()
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    def e57old() = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    def rel104() = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    def e104new() = Graph.coOccurrencePairs(rel104(), "c", "p",
        minShared = 3L, maxItemDeg = 45L)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    def e104old() = oldPairs(rel104(), 3L, 45L)
      .select(col("id_a").as("u"), col("id_b").as("v"))

    // round 17: c100's edge build is UNCAPPED (maxItemDeg=0) — its own
    // arms, plus the full triangle pipeline, to adjudicate the driver's
    // c100 both-SF regression reading separately from the capped tier
    def e100new() = Graph.coOccurrencePairs(rel104(), "c", "p", minShared = 3L)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    def e100old() = oldPairs(rel104(), 3L, 0L)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    // the r16 shape: plain single-exchange exec, no skew decomposition
    def e100exec() = {
      val b = rel104().select(col("c").as("e"), col("p").as("i")).distinct()
      graft.plans.SelfPairsByKey
        .selfPairsByKey(b.filter(col("i").isNotNull), Seq("i"), "e")
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"))
        .filter(col("common") >= 3L)
        .select(col("id_a").as("u"), col("id_b").as("v"))
    }

    val allArms: Seq[(String, () => Unit)] = Seq(
      "pairs OLD " -> (() => noop(e104old())),
      "pairs NEW " -> (() => noop(e104new())),
      "kcore OLD " -> (() => noop(oldKCore(e104old(), 3, 8))),
      "kcore NEW " -> (() => noop(Graph.kCoreBounded(e104new(), "u", "v", 3, 8))),
      "pr    OLD " -> (() => noop(oldPageRank(e57old(), 5))),
      "pr    NEW " -> (() => noop(Graph.pageRank(e57(), "src", "dst", 5,
        edgesDistinctDisjoint = true))),
      "pairs0 OLD" -> (() => noop(e100old())),
      "pairs0 NEW" -> (() => noop(e100new())),
      "pairs0 EXE" -> (() => noop(e100exec())),
      "tri OLD   " -> (() => noop(Graph.triangleCounts(e100old(), "u", "v"))),
      "tri NEW   " -> (() => noop(Graph.triangleCounts(e100new(), "u", "v"))),
      "tri EXE   " -> (() => noop(Graph.triangleCounts(e100exec(), "u", "v"))),
      // peel-ISOLATED kcore arms (round 17): both consume the SAME edge
      // build, so the delta is purely window-shape vs degree-agg+semi-join
      "peel OLD  " -> (() => noop(oldKCore(e104new(), 3, 8))),
      "peel NEW  " -> (() => noop(Graph.kCoreBounded(e104new(), "u", "v", 3, 8)))
    )
    // AB_ARMS: comma-separated substring filter over arm names
    val armFilter = sys.env.get("AB_ARMS").map(_.split(",").toSeq)
    val arms = armFilter.fold(allArms) { fs =>
      allArms.filter { case (n, _) => fs.exists(n.trim.startsWith) }
    }
    val reps = sys.env.getOrElse("AB_REPS", "4").toInt
    val results = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    // warmup both arms once (JIT + fault tax), then alternate
    arms.foreach { case (n, f) => f(); sweep() }
    for (r <- 1 to reps; (n, f) <- arms) {
      val dt = time(f()); sweep()
      results(n) = results(n) :+ dt
      println(f"[ab] $n rep$r ${dt}%6.2f s")
    }
    arms.foreach { case (n, _) =>
      val rs = results(n)
      println(f"[ab] $n min ${rs.min}%6.2f  reps ${rs.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
