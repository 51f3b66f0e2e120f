package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix preparation operators: domain mixture weighting and
  * sequence packing — the steps between a curated corpus and an actual
  * training run.
  */
object Curation {

  /** Temperature-scaled domain sampling weights: per `groupCol` (source/
    * domain/language), total whitespace tokens, the natural token share,
    * the alpha-scaled sampling weight `tokens^alpha / sum(tokens^alpha)`,
    * and the implied epochs-per-domain (weight / natural share — how many
    * times a domain is up- or down-sampled relative to proportional
    * mixing). alpha < 1 flattens the mix toward small domains, the
    * standard multilingual/multi-source rebalancing rule.
    *
    * Scale shape: one map-side-combined aggregation to domain
    * granularity, then a 1-row totals aggregate broadcast-crossed back —
    * the corpus is scanned once and nothing wider than (domain, count)
    * shuffles. */
  def mixtureWeights(df: DataFrame, groupCol: String, textCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val tok = df
      .select(col(groupCol), size(split(col(textCol), "\\s+")).cast("long").as("_t"))
      .groupBy(col(groupCol))
      .agg(sum(col("_t")).as("tokens"))
    val totals = tok.agg(
      sum(col("tokens")).as("_total"),
      sum(pow(col("tokens").cast("double"), alpha)).as("_ptot"))
    val w = pow(col("tokens").cast("double"), alpha) / col("_ptot")
    val share = col("tokens").cast("double") / col("_total").cast("double")
    tok.crossJoin(broadcast(totals))
      .select(col(groupCol), col("tokens"),
        round(share, 6).as("token_share"),
        round(w, 6).as("sample_weight"),
        round(w / share, 6).as("epochs"))
  }

  /** Sequence packing: assign documents to fixed token-budget bins by
    * running token count, packing within `groupCol` partitions in
    * `idCol` order (the streaming-concatenation shape used to fill
    * training context windows — a document starts at `offset_in_bin`
    * of `bin_id` and bins are filled left to right). Documents longer
    * than the budget simply span bins, exactly like token-level packing
    * with document boundaries recorded.
    *
    * Scale shape: ONE shuffle (the window partition on `groupCol`); the
    * running sum is computed in sort order within each partition. The
    * partition key is what makes this scale — a global packing order
    * would single-partition; per-source/per-shard packing is embarrassingly
    * parallel and is what a real pipeline does (bins never span shards). */
  def sequencePack(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val t = df.select(col(groupCol), col(idCol),
      size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumExcl = sum(col("n_tokens")).over(w) - col("n_tokens")
    t.withColumn("_ce", cumExcl)
      .select(col(groupCol), col(idCol), col("n_tokens"),
        expr(s"_ce div $budgetTokens").as("bin_id"),
        (col("_ce") % budgetTokens).as("offset_in_bin"))
  }
}
