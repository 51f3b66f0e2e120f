package graft.tools

import org.apache.spark.sql.functions._

/** Shuffle-partition sensitivity probe: the measured claim behind
  * GraftSession's "size shuffle partitions to cores, let AQE coalesce"
  * configuration. Runs two shuffle-heavy queries (c2's MinHash+LSH
  * dedup chain and the q3 star join) at sf0.1 under
  * `spark.sql.shuffle.partitions` ∈ {8, 32, 128}, AQE ON vs OFF,
  * 2 warmed reps each. The expected shape — and the 100 TB relevance —
  * is that AQE flattens the knob (runtime coalescing absorbs
  * over-partitioning; under-partitioning stays visible because AQE can
  * split skewed partitions but not invent parallelism below the
  * configured count), so the only tuning that matters at cluster scale
  * is the initial-partition CEILING, exactly what
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` is for.
  *
  * Run: `sbt "runMain graft.tools.ProbeShuffleParts"`; numbers land in
  * PLANS.md.
  */
object ProbeShuffleParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("graft-probe-shuffle")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for (aqe <- Seq(true, false); parts <- Seq(8, 32, 128)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      for (q <- Seq("c2_dedup_minhash", "q3_star_join")) {
        timeOnce(q) // warmup under this config
        val reps = (1 to 2).map(_ => timeOnce(q))
        println(f"PROBE aqe=$aqe parts=$parts%3d $q%-18s " +
          f"${reps.min}%.2f/${reps.max}%.2f s")
      }
    }
    spark.stop()
  }
}
