package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic address generator — the reference's `import` entry point
  * (`DataImporter.kt:21-28,69-82`) as a distributed, deterministic
  * DataFrame source.
  *
  * Value domains mirror the reference generator exactly (5-street pool,
  * 5 cities, 5 states, 5-digit zip, 5 countries). Randomness is replaced
  * by per-id hashing (`xxhash64(id, salt) mod pool`): fully deterministic
  * for any partitioning, any cluster size, any run — unlike `rand()`,
  * which is seed-per-partition. This also fixes reference quirks Q1 (log
  * claims 1M rows but inserts 10k) and Q2 (positional-bind off-by-one):
  * the row count is the argument, and there are no bind indices.
  */
object Generator {

  private val streets = Seq("Main St", "Oak Ave", "Park Rd", "Cedar Ln", "Elm St")
  private val cities = Seq("Springfield", "Rivertown", "Lakeside", "Hillview", "Maplewood")
  private val states = Seq("CA", "NY", "TX", "FL", "IL")
  private val countries = Seq("USA", "Canada", "UK", "Australia", "Germany")

  private def pick(pool: Seq[String], id: Column, salt: Int): Column = {
    val idx = pmod(xxhash64(id, lit(salt)), lit(pool.size)).cast("int")
    // element_at is 1-based
    element_at(typedLit(pool), idx + 1)
  }

  /** `n` deterministic address rows with the reference's schema
    * (id, street_address, city, state, postal_code, country —
    * `DataImporter.kt:30-46`). Scales linearly: `spark.range` splits the
    * id space across the cluster; no driver-side loop. */
  def addresses(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    spark.range(1, n + 1)
      .select(
        id.cast("int").as("id"),
        concat(
          (pmod(xxhash64(id, lit(0)), lit(9998)) + 1).cast("string"),
          lit(" "), pick(streets, id, 1)).as("street_address"),
        pick(cities, id, 2).as("city"),
        pick(states, id, 3).as("state"),
        (pmod(xxhash64(id, lit(4)), lit(90000)) + 10000).cast("string").as("postal_code"),
        pick(countries, id, 5).as("country"))
  }
}
