package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-13 probe (code-review finding): eager `Dataset.checkpoint()`
  * on an UNPERSISTED plan runs two jobs — the eager count, then the
  * checkpoint-file write re-executes the result stage (shuffle map
  * stages are reused, so the recompute is the final stage only, not
  * the whole lineage). Candidate fix: stage each reliable cut through
  * a local checkpoint (1 compute → executor blocks; the file-write job
  * then READS blocks instead of recomputing; release the intermediate
  * after). Is the staged form actually faster, or does the extra
  * block write/read wash out the saved final-stage recompute?
  *
  * Arms on c57's exact pageRank loop (5 iters, sf0.1), reliable dir:
  *   plain  — df.checkpoint() per cut (current Ckpt.reliable)
  *   staged — localCheckpoint → checkpoint → release intermediate
  *   local  — local checkpoints only (control: the non-durable floor)
  */
object ProbeReliable {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-reliable")
    import graft.operators.Ckpt

    def edges: DataFrame = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))

    def plainCut(df: DataFrame): DataFrame = df.checkpoint()
    def stagedCut(df: DataFrame): DataFrame = {
      val l = df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      val r = l.checkpoint()
      Ckpt.release(l)
      r
    }
    def localCut(df: DataFrame): DataFrame =
      df.localCheckpoint(true, StorageLevel.DISK_ONLY)

    def pr(cut: DataFrame => DataFrame): Long = {
      val raw = edges.select(col("src").cast("string").as("a"),
        col("dst").cast("string").as("b"))
      val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b"))).distinct()
      val nodes = cut(dir.select(col("a").as("node"))
        .unionAll(dir.select(col("b").as("node"))).distinct())
      val n = nodes.count()
      val contrib = cut(dir
        .join(dir.groupBy("a").agg(count(lit(1)).as("_deg")), "a")
        .select(col("a"), col("b"), (lit(1.0) / col("_deg")).as("w")))
      var ranks = cut(nodes.withColumn("rank", lit(1.0 / n)))
      for (_ <- 1 to 5) {
        val inflow = contrib.join(ranks, contrib("a") === ranks("node"))
          .groupBy(col("b").as("node")).agg(sum(col("rank") * col("w")).as("_in"))
        ranks = cut(nodes.join(inflow, Seq("node"), "left")
          .select(col("node"), (lit(0.15 / n) +
            lit(0.85) * coalesce(col("_in"), lit(0.0))).as("rank")))
      }
      ranks.select(col("node"), round(col("rank") * n, 6).as("pr"))
        .select(xxhash64(col("node"), col("pr")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    }

    def sweep(root: String): Unit = {
      Ckpt.releaseIssued(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.Tables.deleteRecursively(root)
    }
    val arms = Seq[(String, DataFrame => DataFrame)](
      ("plain", plainCut), ("staged", stagedCut), ("local", localCut))
    for ((arm, cut) <- arms) {
      def once(): (Double, Long) = {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-rel-$arm-").toString
        spark.sparkContext.setCheckpointDir(root)
        val t0 = System.nanoTime()
        val chk = pr(cut)
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(root)
        (dt, chk)
      }
      val warm = once(); val a = once(); val b = once()
      assert(a._2 == warm._2 && b._2 == warm._2, "checksum drift")
      println(f"[reliable] $arm%-7s warm=${warm._1}%6.2f " +
        f"min=${math.min(a._1, b._1)}%6.2f reps=[${a._1}%.2f,${b._1}%.2f] chk=${warm._2}")
    }
    spark.stop()
  }
}
