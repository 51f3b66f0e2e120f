package graft.tools

import org.apache.spark.sql.functions._

/** Skew probe for the custom TopKPerGroup operator vs the row_number
  * window idiom — the measured claim behind graft.plans.TopKPerGroup's
  * scaladoc. Synthetic skew: one pathological group with 2 M rows next
  * to 10 000 groups of 100 rows. The window idiom must ship and fully
  * sort the hot group in one task; the heap operator ships k rows per
  * (group, map partition). Prints per-approach wall times (3 reps) and
  * cross-checks both row sets by count + order-free hash.
  *
  * Run: `sbt "runMain graft.tools.ProbeTopK"`; numbers land in
  * PLANS.md.
  */
object ProbeTopK {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("graft-probe-topk")
    val hot = spark.range(2000000L)
      .select(lit(0L).as("g"), col("id"),
        (col("id") % 999983L).cast("double").as("v"))
    val cold = spark.range(1000000L)
      .select((col("id") % 10000L + 1L).as("g"), col("id"),
        (col("id") % 997L).cast("double").as("v"))
    val skew = hot.unionAll(cold)
    val k = 5

    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // bit_xor, not sum: ANSI mode overflows a long sum of 3M hashes
      val r = df.agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("g"), col("id"))).as("h")).collect().head
      (r.getLong(0), r.getLong(1))
    }

    def windowIdiom() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("v").desc, col("id"))
      fingerprint(skew.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).drop("rk"))
    }
    def heapOperator() = fingerprint(
      graft.plans.TopKPerGroup.topKPerGroup(
        skew, Seq("g"), Seq(("v", true), ("id", false)), k))

    def time[A](label: String, f: () => A): A = {
      var last: A = f() // warm
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        last = f()
        println(f"$label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      last
    }
    val wfp = time("window_idiom ", () => windowIdiom())
    val hfp = time("heap_operator", () => heapOperator())
    println(s"window fingerprint: $wfp")
    println(s"heap   fingerprint: $hfp")
    require(wfp == hfp, "row sets diverge — operator bug")
    println("row sets identical")
    spark.stop()
  }
}
