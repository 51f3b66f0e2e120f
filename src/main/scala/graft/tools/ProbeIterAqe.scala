package graft.tools

import graft.{GraftSession, SparkEntry}

/** Round-13 probe (VERDICT r12 #7): the iterative loops (c57 pagerank,
  * c104 k-core, c23 dup-clusters) shuffle on relations that SHRINK
  * monotonically round over round (c104: 28 686 → 5 534 directed
  * edges) while `spark.sql.shuffle.partitions` stays at the static 32.
  * Does runtime re-planning already absorb that — or would a smaller
  * static partition count (the per-loop knob) measurably win?
  *
  * Arms, each a fresh conf state over the SAME query set at sf0.1:
  *   base      — status quo: partitions=32, AQE coalesce ON (GraftSession)
  *   nocoalesce— partitions=32, AQE coalescePartitions OFF: how much the
  *               current plan owes to AQE's post-shuffle coalescing
  *   parts8    — partitions=8, coalesce ON: a static small count — what a
  *               hand-tuned per-loop setting could add beyond AQE
  *   parts128  — partitions=128, coalesce ON: the over-provisioned cluster
  *               default direction; AQE should claw most of it back
  *
  * Timing discipline: one unmeasured warmup + min of 2 per arm (the
  * bench's multi-second-tier estimator). Adoption rule: measured-win-only
  * (the ProbeSlow convention); findings → PLANS.md round 13. */
object ProbeIterAqe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-iteraqe")
    val queries = sys.env.getOrElse("PROBE_QUERIES",
      "c57_pagerank,c104_kcore,c23_dup_clusters").split(",").toSeq

    def sweep(): Unit = {
      graft.operators.Ckpt.releaseIssued(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      dt
    }
    val arms = Seq(
      ("base", () => ()),
      ("nocoalesce", () =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")),
      ("parts8", () => spark.conf.set("spark.sql.shuffle.partitions", "8")),
      ("parts128", () => spark.conf.set("spark.sql.shuffle.partitions", "128")),
      // parallelismFirst=false makes AQE coalesce shrunken rounds all
      // the way to the advisory size (→ ~1 partition for a 5k-row
      // relation) instead of stopping at the local parallelism — the
      // scale-ADAPTIVE version of what the static parts8 arm hand-codes
      ("sizeFirst", () => spark.conf
        .set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"))
    )
    for ((arm, set) <- arms) {
      // reset to GraftSession posture, then apply the arm
      spark.conf.set("spark.sql.shuffle.partitions", GraftSession.cpus)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      set()
      for (q <- queries) {
        val warm = run(q)
        val a = run(q); val b = run(q)
        println(f"[iteraqe] $arm%-11s $q%-18s warm=$warm%6.2f min=${math.min(a, b)}%6.2f reps=[$a%.2f,$b%.2f]")
      }
    }
    spark.stop()
  }
}
