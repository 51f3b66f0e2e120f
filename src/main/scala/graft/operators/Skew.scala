package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation for joins.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime;
  * explicit salting remains necessary when (a) AQE is unavailable on the
  * path (e.g. streaming joins), or (b) one hot key dominates so heavily
  * that even split partitions overwhelm a task. The classic recipe:
  * replicate the small side `saltFactor` times, scatter the large side
  * uniformly across the replicas, join on (key, salt).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, with the large side scattered
    * over `saltFactor` salts. `scatterCol` must be a column of the large
    * side whose hash distributes rows (a unique id works); determinism
    * comes from hashing it rather than rand(). Result equals the plain
    * inner equi-join, row for row. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 scatterCol: String, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(scatterCol)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-key skew profile — MEASURE before salting: the heaviest
    * `topN` keys with their row count, share of all rows, and skew
    * factor (count ÷ mean per-key load). A `skew` of 1.0 is a
    * perfectly uniform key; the keys this surfaces are the ones
    * [[saltedJoin]] (or AQE's skew split) exists for, and the `share`
    * column says whether splitting them is worth it.
    *
    * Scale shape: ONE map-side-combined aggregation on the key (the
    * same shuffle the join itself would do), a 1-row totals aggregate
    * broadcast back over the counts (the c26 scalar-gate pattern — the
    * counts relation never re-shuffles), and a TakeOrderedAndProject
    * for the top-N — no global sort, no second pass over the data. */
  def profile(df: DataFrame, key: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum("n").cast("double").as("_total"),
      count(lit(1)).cast("double").as("_nkeys"))
    counts.crossJoin(broadcast(stats))
      .select(col(key), col("n"),
        round(col("n") / col("_total"), 6).as("share"),
        round(col("n") * col("_nkeys") / col("_total"), 6).as("skew"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
