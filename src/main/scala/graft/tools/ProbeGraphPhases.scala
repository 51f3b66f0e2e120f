package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-16 attribution probe: split c57/c104 wall into edge-build vs
  * iterative phase, and measure the per-job floor, so the optimization
  * targets the phase that actually costs (guide §1.1). Results in
  * OPTIMIZATION_r16.md. */
object ProbeGraphPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-phases")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      graft.operators.Ckpt.releaseIssued(spark)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    // per-job floor: a trivial one-stage noop
    for (i <- 1 to 3)
      t(s"trivial noop rep$i") { noop(Tables.load(spark, sfDir, "nation")) }

    for (rep <- 1 to 3) {
      // ---- c57 decomposition ----
      val e57 = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      t(s"c57 edge build+distinct r$rep") {
        val raw = e57.select(col("src").as("a"), col("dst").as("b"))
        val dir = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b"))).distinct()
        noop(dir)
      }
      t(s"c57 full pageRank r$rep") {
        noop(Graph.pageRank(e57, "src", "dst", iters = 5))
      }
      sweep()

      // ---- c104 decomposition ----
      val rel = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
        .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      val e104 = Graph.coOccurrencePairs(rel, "c", "p",
          minShared = 3L, maxItemDeg = 45L)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      t(s"c104 edge build (pairs) r$rep") { noop(e104) }
      t(s"c104 full kcore r$rep") {
        noop(Graph.kCoreBounded(e104, "u", "v", k = 3, rounds = 8))
      }
      sweep()
    }
    spark.stop()
  }
}
