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
}
