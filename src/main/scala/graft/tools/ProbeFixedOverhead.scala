package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-16 probe: decompose the ~0.3 s per-query floor that 122
  * sub-0.5 s queries pay (~34 s of the sf0.1 bench). Candidates:
  * parquet schema inference per `spark.read.parquet` call (driver-side
  * footer read, paid per rep per table), action/job overhead, plan
  * optimization. */
object ProbeFixedOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-overhead")
    def t(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[ovh] $label%-40s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    val lineitemSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema

    t("read.parquet infer schema (lineitem)", 20) {
      spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    }
    t("read.parquet with schema (lineitem)", 20) {
      spark.read.schema(lineitemSchema).parquet(s"$sfDir/lineitem.parquet").schema
    }
    t("Tables.load lineitem (current)", 20) {
      Tables.load(spark, sfDir, "lineitem").schema
    }
    t("count job on 1-row range", 20) {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    t("noop action: load+filter lineitem", 10) {
      Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_quantity") > 49).select("l_orderkey")
        .write.format("noop").mode("overwrite").save()
    }
    t("noop action: q1_agg full", 10) {
      graft.SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
