package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * `randomSplit` is seed-stable only for a fixed partitioning — a
  * repartitioned rerun assigns rows differently, which silently leaks
  * val/test rows into train across pipeline versions. Hash-based
  * assignment depends only on the row's id: stable across runs,
  * partitionings, and cluster sizes, and needs no shuffle at all (the
  * split column is a narrow per-row projection).
  */
object Sampling {

  /** Assign each row to a named split by `xxhash64(id, seed) mod 10000`
    * against cumulative weight cutoffs. Weights must sum to 1; the last
    * split absorbs rounding remainder. Adds `_split`. */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)],
                seed: Int = 42, splitCol: String = "_split"): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w * 10000))
    val pairs = weights.map(_._1).zip(cuts)
    val assignment = pairs.init.foldRight(lit(pairs.last._1): Column) {
      case ((name, cut), acc) => when(bucket < lit(cut), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assignment)
  }

  /** Per-stratum Bernoulli sampling (e.g. rebalance languages or
    * sources): `fractions` maps stratum value → keep probability.
    * Thin wrapper over `DataFrameStatFunctions.sampleBy` — seeded,
    * one pass, no shuffle. Strata absent from `fractions` are dropped
    * (fraction 0), matching sampleBy semantics. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Keep rows whose `scoreCol` is at or above the exact interpolated
    * `p`-quantile of the whole column — quantile-based quality gating
    * (drop the bottom X% by perplexity/length/score).
    *
    * Scale shape: the threshold is ONE scalar aggregate (Spark's exact
    * `percentile` — a single-pass partial aggregate, no sort of the full
    * data), broadcast-crossed into a plain filter; the data itself never
    * shuffles. For quantiles of 100 TB where exactness doesn't matter,
    * swap `percentile` for `percentile_approx` at the call site. */
  def quantileFilter(df: DataFrame, scoreCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p < 1.0, s"quantile must be in (0,1), got $p")
    val thr = df.agg(percentile(col(scoreCol), lit(p)).as("_thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis A-Res): each row gets key `ln(u)/w` where `u` is a
    * reproducible uniform in [0, 1) derived from
    * `mix64(fingerprint64("<seed>:" || id))` and `w` its positive
    * weight; the k largest keys are exactly a weight-proportional
    * sample without replacement. The selection step of importance
    * resampling ([[graft.operators.Curation.dsirWeights]] produces the
    * weights; this draws the sample) — deterministic across runs AND
    * engines, unlike `rand()`-based sampling.
    *
    * The uniform is `signed_hash / 2⁶⁴ + 0.5`: int64→double conversion
    * then exact power-of-two scaling, so any engine that reproduces the
    * hash reproduces `u` bit-for-bit (the DuckDB oracle does). Rows
    * with non-positive weight are excluded (zero weight = never
    * sampled; A-Res keys are undefined there).
    *
    * Scale shape: key assignment is a narrow projection; top-k compiles
    * to TakeOrderedAndProject — per-partition partial top-k, never a
    * global sort of the corpus. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = graft.functions.TextFunctions.seededKey(col(idCol), seed)
      .cast("double") / 1.8446744073709552E19 + 0.5
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        (log(u) / col(weightCol).cast("double")).as("skey"))
      .orderBy(col("skey").desc, col(idCol))
      .limit(k)
  }

  /** Leakage-free train/val/test split: hash the CLUSTER representative
    * (from [[Dedup.dupClusters]]), not the document id, against
    * cumulative fraction cutoffs — so a near-duplicate cluster lands
    * entirely on one side of every boundary and eval examples never
    * have train-set twins. The uniform is [[weightedSample]]'s
    * `seededKey/2⁶⁴ + 0.5` (DuckDB-replicable, unlike xxhash64's
    * [[hashSplit]] — that one trades replicability for speed where
    * leakage isn't the concern).
    *
    * `clusters` is (idCol, repCol); fractions must sum to 1, cutoffs
    * compared on the exact double. Adds `split`.
    *
    * Scale shape: one narrow projection over the cluster relation —
    * the hash, the cutoff CASE, nothing else; no join back to the
    * corpus is required here (callers join on the 8-byte id when they
    * need the text). */
  def leakFreeSplit(clusters: DataFrame, idCol: String, repCol: String,
                    fractions: Seq[(String, Double)], seed: Long): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val u = graft.functions.TextFunctions.seededKey(col(repCol), seed)
      .cast("double") / 1.8446744073709552E19 + 0.5
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val pairs = fractions.map(_._1).zip(cuts)
    val assignment = pairs.init.foldRight(lit(pairs.last._1): Column) {
      case ((name, cut), acc) => when(u < lit(cut), lit(name)).otherwise(acc)
    }
    clusters.select(col(idCol), col(repCol), assignment.as("split"))
  }
}
