package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-12 probe: per-round edge counts of the c104 peel at sf0.1 —
  * does the 8-round budget converge early (making kCoreBounded's
  * early-exit worth its per-round count job) or run hot to the end?
  * Findings recorded in PLANS.md (round 12). */
object ProbeKCore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-kcore")
    val rel = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    val e0 = Graph.coOccurrencePairs(rel, "c", "p",
        minShared = 3L, maxItemDeg = 45L)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val k = 3
    var e = e0
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .unionAll(e0.select(col("v").cast("long").as("u"), col("u").cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    println(s"[kcore] round 0: ${e.count()} directed edges")
    for (r <- 1 to 8) {
      val keep = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      println(s"[kcore] round $r: ${e.count()} directed edges")
    }
    spark.stop()
  }
}
