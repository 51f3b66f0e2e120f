package graft.tools

import graft.{GraftSession, SparkEntry}

/** Write `.explain("formatted")` output for a set of declared queries to
  * files — the round-16 optimization evidence trail (plans/r16/).
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> <q1,q2,...>
  *   outDir: directory for the plan files (created if absent)
  *   suffix: appended to the file name, e.g. "before" / "after"
  *   queries: comma-separated declared query names
  *
  * Plans are captured WITHOUT executing the query (initial plan,
  * `AdaptiveSparkPlan isFinalPlan=false` for AQE queries) — the shape
  * evidence (Exchange count, join strategy, PushedFilters/ReadSchema)
  * the optimization round compares. Eager operators (graph BSP loops,
  * dedup pipelines) DO run their internal jobs during plan
  * construction; the dumped plan is then the final result-backing plan.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpPlans <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qcsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-dump-plans")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    qcsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plans] wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
      graft.operators.Ckpt.releaseResult(df)
      graft.operators.Ckpt.releaseIssued(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
