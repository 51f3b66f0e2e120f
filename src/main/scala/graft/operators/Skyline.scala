package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto frontier (skyline): the rows not dominated under
  * (maximize `xCol`, minimize `yCol`) — dominance means another row is
  * >= in x AND <= in y with at least one strict. The multi-objective
  * "best trade-off set" selector (price-vs-recency, quality-vs-length)
  * that a curation pass uses where a single score would force an
  * arbitrary weighting.
  *
  * Scale shape — the textbook sort-scan without the global sort:
  *  1. collapse to one candidate per distinct x (`min(y)` — a shuffle
  *     keyed on x, map-side combined);
  *  2. range-repartition the candidates DESC by x, compute each row's
  *     running strict-min of y WITHIN its partition (local sort only —
  *     the plan has no global Sort node);
  *  3. fold in the cross-partition prefix: per-partition y-minima
  *     (one row per partition, model-sized) get a running min over a
  *     single-partition window — partitions-count rows, trivially
  *     cheap — broadcast-joined back by partition id;
  *  4. a candidate survives iff no strictly-greater-x candidate has
  *     y <= its y; surviving (x, y) pairs — frontier-sized, broadcast —
  *     join back to recover full rows (ties on both dims all survive:
  *     equal points do not dominate each other).
  * Every shuffle is keyed (x, then pid); the only total order ever
  * materialized is over the partitions-count boundary relation.
  */
object Skyline {

  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val perX = df.groupBy(col(xCol).as("_x"))
      .agg(min(col(yCol)).as("_minY"))
    val ranged = perX.repartitionByRange(nPart, col("_x").desc)
      .withColumn("_pid", spark_partition_id())
    // strict-min of y over rows with strictly greater x inside the
    // partition: _x is distinct, so "preceding in x-desc order" == strict
    val wLocal = Window.partitionBy("_pid").orderBy(col("_x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-partition minima: one row per partition; the running min over
    // the pid order is the cross-partition prefix (pid 0 holds the
    // largest x range under the desc range partitioner)
    val wPrefix = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = ranged.groupBy("_pid").agg(min("_minY").as("_pmin"))
      .withColumn("_prefMin", min(col("_pmin")).over(wPrefix))
      .select("_pid", "_prefMin")
    val survivors = ranged
      .withColumn("_localStrict", min(col("_minY")).over(wLocal))
      .join(broadcast(boundary), Seq("_pid"), "left")
      // least() skips nulls; null overall = no strictly-greater-x row
      .withColumn("_strict", least(col("_localStrict"), col("_prefMin")))
      .filter(col("_strict").isNull || col("_minY") < col("_strict"))
      .select(col("_x"), col("_minY"))
    df.join(broadcast(survivors),
      col(xCol) === col("_x") && col(yCol) === col("_minY"))
      .drop("_x", "_minY")
  }
}
