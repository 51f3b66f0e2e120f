package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** c99_cluster_medoid stage attribution + CC checkpoint-backend A/B
  * (round 12 follow-on): with c111 fixed, c99 (4.8 s at sf0.1) is the
  * slowest batch query that has never had a profile. Its stages:
  *   1. `ngramJaccardPairs` — the shared index+prune+verify near-dup
  *      join;
  *   2. `dupClusters` — iterative min-label CC over the pairs (its own
  *      checkpoint loop, now on the shared [[graft.operators.Ckpt]]
  *      hook);
  *   3. the medoid weight join — pairs ⋈ shingle-array relation twice
  *      + array_intersect + per-cluster argmax window.
  * This probe times each stage (cumulative shapes: pairs, pairs+CC,
  * pairs+weights, full query) and A/Bs the CC loop's checkpoint
  * backend through the conf hook, mirroring ProbeCheckpointStorage.
  *
  * `sbt "runMain graft.tools.ProbeMedoid [sfDir]"`; numbers go to
  * PLANS.md round 12.
  */
object ProbeMedoid {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-medoid")
    val key = "spark.graft.graph.checkpointStorage"
    def docs = Tables.load(spark, sfDir, "documents")

    def pairs(): DataFrame =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5).select("id_a", "id_b")
    def labels(): DataFrame = Dedup.dupClusters(pairs(), docs, "doc_id")
    def full(): DataFrame =
      Dedup.clusterMedoids(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)

    def time(label: String, reps: Int = 3)(f: => DataFrame): Double = {
      var best = Double.MaxValue
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1) best = math.min(best, dt)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        println(f"[probe-c99] $label rep$i: $dt%.2f s")
      }
      println(f"[probe-c99] $label best: $best%.2f s")
      best
    }

    val nPairs = pairs().count()
    println(s"[probe-c99] near-dup pairs at threshold 0.5: $nPairs")

    time("stage pairs (ngramJaccardPairs)")(pairs())
    time("stage pairs+CC (dupClusters, disk ckpt default)")(labels())
    spark.conf.set(key, "memdisk")
    time("stage pairs+CC (dupClusters, memdisk ckpt)")(labels())
    spark.conf.unset(key)
    time("full c99 (disk ckpt default)")(full())
    spark.conf.set(key, "memdisk")
    time("full c99 (memdisk ckpt)")(full())
    spark.conf.unset(key)

    // backend value-identity on the full medoid output
    val a = full()
    spark.conf.set(key, "memdisk")
    val b = full()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    spark.conf.unset(key)
    println(s"[probe-c99] disk vs memdisk diff rows: $diff (must be 0)")
    spark.stop()
  }
}
