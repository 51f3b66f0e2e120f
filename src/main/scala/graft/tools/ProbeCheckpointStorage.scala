package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Checkpoint-storage A/B for the iterative family (round 12, verdict
  * Next #2): the driver's r8/r9/r11 runs inflated the
  * localCheckpoint-heavy queries 2-7× at HEADs where fresh replications
  * read steady state, and the r11 artifact's own telemetry disproved
  * the code-cache and leaked-block mechanisms for that run. The open
  * hypothesis is the box's ms-scale anon-page fault tax landing on the
  * fresh memory that MEMORY_AND_DISK-backed `localCheckpoint()` blocks
  * commit every iteration. If that is the mechanism, DISK_ONLY-backed
  * checkpoints (written through the OS page cache, no large fresh anon
  * commit on the hot path) should be robust where memory-backed ones
  * are not.
  *
  * Arms: A = `spark.graft.graph.checkpointStorage=memdisk` (status
  * quo), B = `disk` — the [[graft.operators.Graph]] ckpt hook switches
  * every checkpoint in pageRank/kCore. Interleaved reps with per-rep
  * GC/major-fault/RSS deltas printed, plus a value-identity check.
  *
  * Run BOTH regimes:
  *  - steady state: `sbt "runMain graft.tools.ProbeCheckpointStorage"`
  *  - memory-constrained fork (emulates the degraded driver runs by
  *    shrinking the heap so storage/execution memory genuinely
  *    contend): `SPARK_DRIVER_MEM=3g sbt "runMain ..."`.
  */
object ProbeCheckpointStorage {
  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }
  private def majRss(): (Long, Long) = try {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")))
    val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
    (rest(9).toLong, rest(21).toLong * 4 / 1024)
  } catch { case _: Throwable => (-1L, -1L) }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-ckpt-storage")
    val key = "spark.graft.graph.checkpointStorage"
    println(s"[probe-ckpt] heap=${Runtime.getRuntime.maxMemory() / (1024 * 1024)} MB")

    def pagerank(): DataFrame = {
      val e = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.pageRank(e, "src", "dst", iters = 5)
        .select(col("node"), round(col("rank"), 6).as("pr"))
    }
    def kcore(): DataFrame = {
      val rel = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
        .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      val e = graft.operators.Graph.coOccurrencePairs(rel, "c", "p",
          minShared = 3L, maxItemDeg = 45L)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      graft.operators.Graph.kCoreBounded(e, "u", "v", k = 3, rounds = 8)
    }

    def rep(tag: String, arm: String, fn: () => DataFrame): Double = {
      spark.conf.set(key, arm)
      val g0 = gcMs(); val (mj0, _) = majRss()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val g1 = gcMs(); val (mj1, rss) = majRss()
      // per-rep hygiene: the bench unpersists between queries; do the
      // same between reps so arms don't inherit each other's blocks
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      println(f"[probe-ckpt] $tag $arm: $dt%6.2f s  gc=${g1 - g0}%5d ms " +
        f"majflt=${mj1 - mj0}%4d rss=$rss%5d MB")
      dt
    }

    for ((tag, fn) <- Seq("pagerank" -> (pagerank _), "kcore" -> (kcore _))) {
      // one unmeasured warmup per query (bench discipline), then
      // interleaved measured reps so neither arm owns the warm cache
      rep(s"$tag warmup", "memdisk", fn)
      val a = Seq.fill(3)(rep(tag, "memdisk", fn))
      val b = Seq.fill(3)(rep(tag, "disk", fn))
      val a2 = rep(tag, "memdisk", fn) // tail rep guards drift over time
      println(f"[probe-ckpt] $tag SUMMARY memdisk=${a.min}%.2f/${a.max}%.2f " +
        f"(tail ${a2}%.2f) disk=${b.min}%.2f/${b.max}%.2f s")
      spark.conf.set(key, "memdisk"); val outA = fn()
      spark.conf.set(key, "disk"); val outB = fn()
      val diff = outA.exceptAll(outB).count() + outB.exceptAll(outA).count()
      println(s"[probe-ckpt] $tag A vs B diff rows: $diff (must be 0)")
      spark.conf.unset(key)
    }
    spark.stop()
  }
}
