package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 SQL-surface additions.
  *
  * Starts with the approximate-percentile tier: `q40_percentiles` is the
  * exact family (full-sort per group), which is the right answer at
  * report scale but not at 100 TB — there the GK/KLL-style mergeable
  * sketch behind `percentile_approx` is the production path (one pass,
  * map-side partial sketches merged at reduce, rank error bounded by
  * 1/accuracy). Same exact-vs-approx pairing the engine already ships
  * for count-distinct (`q53_approx_distinct` + ApproxSpec).
  */
object Relational6 {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(

    // approximate percentiles at production accuracy — rows-only: the
    // sketch's picked elements have no DuckDB-equal value; the rank
    // error bound (≤ 1/accuracy) is asserted in ApproxSpec vs the
    // exact tier on the same data
    "q96_approx_percentiles" -> { (s, dir) =>
      val acc = 100 // rank error ≤ 1/acc = 1% — the 100 TB setting
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          percentile_approx(col("o_totalprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.9), lit(0.99)),
            lit(acc)).as("pct_approx"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Apache DataSketches HLL: per-shard sketches + a sketch-level
    // union for the global estimate — the mergeable-sketch discipline
    // at 100 TB (per-shard/per-day sketches persist; any rollup is a
    // cheap union of fixed-size sketches, never a re-scan of the data).
    // Rows-only: estimates have no DuckDB-equal value; ApproxSpec pins
    // the relative error vs exact count-distinct on the same data.
    "q97_hll_union" -> { (s, dir) =>
      val lgK = 12 // 2^12 buckets — ~1.6% standard error, 4 KB sketches
      val perType = t(s, dir, "events")
        .groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("_sk"))
      val per = perType.select(col("event_type"),
        hll_sketch_estimate(col("_sk")).as("approx_users"))
      // the global tier NEVER re-reads events — it merges the per-type
      // sketches (5 rows × 4 KB), exactly the shard-rollup path
      val all = perType
        .agg(hll_sketch_estimate(hll_union_agg(col("_sk"), lit(false)))
          .as("approx_users"))
        .select(lit("ALL").as("event_type"), col("approx_users"))
      per.unionByName(all).orderBy("event_type")
    },

    // calendar gap-fill ("date spine"): generate every month between
    // the global min/max order date, left-join monthly revenue, fill
    // empty months with zeros — the reporting shape that a bare
    // GROUP BY month silently gets wrong (missing months vanish).
    // The spine derives from a 1-row broadcast aggregate + sequence()
    // — never a driver-side loop
    "q98_date_spine" -> { (s, dir) =>
      // big-ticket orders only — sparse enough that some months are
      // genuinely empty, so the fill is exercised, not vacuous
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 490000)
      val bounds = o.agg(
        date_trunc("month", min(col("o_orderdate"))).as("lo"),
        date_trunc("month", max(col("o_orderdate"))).as("hi"))
      val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 month"))).as("m"))
        .select(col("m").cast("date").as("month"))
      val monthly = o
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
      spine.join(monthly, Seq("month"), "left")
        .select(col("month"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("month")
    }
  )

  val oracle: Map[String, String] = Map(
    "q98_date_spine" ->
      """WITH o AS (SELECT * FROM orders WHERE o_totalprice > 490000),
        |b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |         date_trunc('month', max(o_orderdate)) AS hi
        |  FROM o),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
        |  FROM b),
        |m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    round(sum(o_totalprice), 2) AS revenue, count(1) AS n_orders
        |  FROM o GROUP BY 1)
        |SELECT spine.month,
        |  coalesce(m.revenue, 0.0) AS revenue,
        |  coalesce(m.n_orders, 0) AS n_orders
        |FROM spine LEFT JOIN m USING (month) ORDER BY month""".stripMargin
  )
}
