package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Materialize a training mixture: the DRAW step that turns
    * [[mixtureWeights]]'s sampling weights into an actual document
    * set — a deterministic per-group uniform sample of `quota_g`
    * documents (quota relation: (groupCol, quotaCol), typically
    * `round(totalK × sample_weight)`). Selection within a group is by
    * the c39 seeded 64-bit shuffle key, DESCENDING — reproducible
    * across runs, partitionings, and engines (the verification oracle
    * replays the key bit-for-bit), unlike `rand()`/`sampleBy` draws.
    * Output: (groupCol, idCol, rk) with rk in [1, quota_g].
    *
    * Scale shape: exact per-group top-k in TWO phases (the pqKnn
    * shortlist rule): a (group, input-partition)-local row_number
    * prunes each group to ≤ nPartitions×quota candidates — each window
    * chunk sorts only one partition's slice of one group, so a huge
    * group never single-partition-sorts — then a group-global
    * row_number over the pruned survivors picks the final quota.
    * Selection commutes with partition-local pruning, so this is
    * exact. Quotas broadcast (model-sized). */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    quotas: DataFrame, quotaCol: String,
                    seed: Long): DataFrame = {
    val keyed = df.select(col(groupCol), col(idCol))
      .withColumn("_sk", graft.functions.TextFunctions.seededKey(col(idCol), seed))
      .withColumn("_p", spark_partition_id())
    val q = broadcast(quotas.select(col(groupCol),
      col(quotaCol).cast("long").as("_q")))
    val wLocal = Window.partitionBy(col(groupCol), col("_p"))
      .orderBy(col("_sk").desc, col(idCol))
    val wGlobal = Window.partitionBy(col(groupCol))
      .orderBy(col("_sk").desc, col(idCol))
    keyed.join(q, Seq(groupCol))
      .withColumn("_lrk", row_number().over(wLocal))
      .filter(col("_lrk") <= col("_q"))
      .withColumn("rk", row_number().over(wGlobal))
      .filter(col("rk") <= col("_q"))
      .select(col(groupCol), col(idCol), col("rk"))
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

  /** Deterministic global shuffle — the epoch-reshuffle a training run
    * performs before sequence packing. The order key is
    * `mix64(fingerprint64("<seed>:" || id))`: content-independent,
    * reproducible across runs and engines (both primitives have exact
    * DuckDB replicas — see LayerC's oracle), and fully avalanched so the
    * induced order is uniform regardless of id distribution.
    *
    * Scale shape: attaching the key is a narrow projection; consuming
    * the order is `repartitionByRange(shuffle_key)` + sort-within-
    * partitions — a single range-exchange, no global single-task sort,
    * no row_number. Different `seed` → a fresh independent permutation
    * per epoch. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
                           numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("shuffle_key",
      graft.functions.TextFunctions.seededKey(col(idCol), seed))
    val parted =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("shuffle_key"))
      else keyed.repartitionByRange(col("shuffle_key"))
    parted.sortWithinPartitions(col("shuffle_key"), col(idCol))
  }

  /** Rendezvous (highest-random-weight) shard assignment: shard =
    * argmax over s ∈ [0, nShards) of mix64(fingerprint64("seed:s:id"))
    * — consistent hashing without a ring. The property `id % n` lacks:
    * growing to n+1 shards either keeps a row's shard or moves it to
    * the NEW shard (every per-shard hash is unchanged; only the added
    * candidate can win), so a reshard relocates ~1/(n+1) of the data
    * instead of nearly all of it.
    *
    * Scale shape: a pure projection — the nShards hashes and their
    * argmax (array_max over (hash, shard) structs, signed-long compare,
    * shard id as deterministic tie-break) all run inside whole-stage
    * codegen; no shuffle, no explode, no state. */
  def rendezvousShard(id: Column, nShards: Int, seed: Long): Column = {
    require(nShards >= 1 && nShards <= 4096, s"unreasonable nShards $nShards")
    val entries = (0 until nShards).map { sh =>
      struct(
        graft.functions.TextFunctions.mix64(graft.functions.TextFunctions
          .fingerprint64(concat(lit(s"$seed:$sh:"), id.cast("string"))))
          .as("h"),
        lit(sh).as("shard"))
    }
    array_max(array(entries: _*)).getField("shard")
  }

  /** Curriculum interleave: order training examples so quality deciles
    * are consumed round-robin (position r of decile 1, then r of decile
    * 2, …) — every context-window-sized slice of the stream sees the
    * full quality spectrum instead of a quality-sorted corpus's drift.
    *
    * Windows are per-shard (`shardCol`), never global: deciles and
    * round-robin positions are assigned within each shard, and shards
    * are independent parallel streams a data-loader consumes — the same
    * bins-never-span-shards contract as [[sequencePack]]. A global
    * ntile would single-partition the corpus; at 100 TB the shard count
    * is the parallelism knob.
    *
    * Output: shardCol, idCol, `decile` (1..nBuckets, best quality
    * first), `slot` (round-robin position within the shard; consuming
    * order is `ORDER BY shard, slot, decile`). */
  def curriculumInterleave(df: DataFrame, idCol: String, scoreCol: String,
                           shardCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val byQuality = Window.partitionBy(col(shardCol))
      .orderBy(desc(scoreCol), col(idCol))
    val wholeShard = Window.partitionBy(col(shardCol))
    // slot is derived arithmetically from (row_number, shard count)
    // rather than a second window over (shard, decile): all three
    // window functions share the one exchange+sort on shardCol. ntile's
    // uneven-bucket rule (first n%k buckets get the extra row) is the
    // SQL-standard one, so rows-before-decile-d is
    // (d-1)*(n div k) + min(d-1, n mod k) on both engines.
    val base = expr(s"_n div $nBuckets")  // integer division (`/` on Columns is double)
    val rem = col("_n") % nBuckets
    val before = (col("decile") - 1) * base +
      least(col("decile") - 1, rem)
    df.select(col(shardCol), col(idCol), col(scoreCol))
      .withColumn("decile", ntile(nBuckets).over(byQuality).cast("long"))
      .withColumn("_rn", row_number().over(byQuality).cast("long"))
      .withColumn("_n", count(lit(1)).over(wholeShard))
      .withColumn("slot", col("_rn") - before)
      .drop("_rn", "_n")
  }

  /** DSIR-style importance weighting for targeted data selection (Xie
    * et al., "Data Selection for Language Models via Importance
    * Resampling", 2023): documents are featurized as hashed n-grams
    * (unigrams + word bigrams folded into `buckets` hash buckets), the
    * target slice and the raw corpus each induce a smoothed categorical
    * distribution over buckets, and a document's importance weight is
    * its features' summed log-likelihood ratio
    * `Σ ln(p_target(b(f)) / p_raw(b(f)))` — high weight = looks like
    * the target domain. Downstream selection keeps the top mass (or
    * Gumbel-samples proportionally; the weights are the operator).
    *
    * `buckets` must be a power of two: Spark buckets by `pmod` of the
    * SIGNED 64-bit hash while an engine working in unsigned mod-2⁶⁴
    * arithmetic (the DuckDB oracle) reduces the unsigned value, and the
    * two agree exactly when `buckets` divides 2⁶⁴. `featureHash`
    * defaults to xxhash64 (production); the oracle passes
    * `mix64 ∘ fingerprint64`, the engine-replicable hash (c3 pattern).
    *
    * Scale shape: feature explosion is a narrow projection; both
    * distributions are map-side-combined aggregations bounded by
    * `buckets` rows; totals come off the model aggregates (never a
    * second corpus scan); the log-ratio table (≤ `buckets` rows)
    * broadcast-joins back to the per-document feature stream; the only
    * corpus-keyed shuffle is the final per-document sum. */
  def dsirWeights(corpus: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024, alpha: Double = 0.5,
                  featureHash: Column => Column = xxhash64(_)): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    require(alpha > 0.0, s"smoothing alpha must be positive, got $alpha")
    def feats(df: DataFrame, cols: Column*): DataFrame = {
      val uni = df
        .select(cols :+ explode(split(lower(col(textCol)), "\\s+")).as("_f"): _*)
        .filter(col("_f") =!= "")
      val bi = df.select(cols :+ explode(graft.functions.ChunkFunctions
        .word_chunks(col(textCol), 2, 1, lowercase = true, fullOnly = true))
        .as("_f"): _*)
      uni.unionAll(bi)
    }
    def bucketed(df: DataFrame) = df.withColumn("_b",
      pmod(featureHash(col("_f")), lit(buckets.toLong))).drop("_f")
    val raw = bucketed(feats(corpus)).groupBy("_b").agg(count(lit(1)).as("_rc"))
    val tgt = bucketed(feats(target)).groupBy("_b").agg(count(lit(1)).as("_tc"))
    val totals = raw.agg(sum("_rc").as("_traw"))
      .crossJoin(tgt.agg(sum("_tc").as("_ttgt")))
    // every bucket a corpus document can hit appears in `raw` by
    // construction, so the ratio table left-joins target counts onto it
    val ratio = raw.join(tgt, Seq("_b"), "left").crossJoin(broadcast(totals))
      .select(col("_b"),
        (log((coalesce(col("_tc"), lit(0L)).cast("double") + alpha) /
            (col("_ttgt").cast("double") + alpha * buckets)) -
          log((col("_rc").cast("double") + alpha) /
            (col("_traw").cast("double") + alpha * buckets))).as("_lr"))
    bucketed(feats(corpus, col(idCol)))
      .join(broadcast(ratio), Seq("_b"))
      .groupBy(col(idCol))
      .agg(round(sum("_lr"), 6).as("weight"), count(lit(1)).as("n_feats"))
  }

  /** Greedy token-budget selection: keep the highest-`qualityCol`
    * documents, in (quality desc, id asc) order, until `budget` tokens
    * are taken — a document is kept iff the tokens of all
    * strictly-better documents total < budget (so the budget-crossing
    * document is included, then selection stops). The final
    * corpus-assembly step after scoring: "best N tokens", not
    * "best N documents".
    *
    * Scale shape: the naive form is one GLOBAL running-sum window —
    * a single-task sort at 100 TB. Instead: bucket quality into
    * `nBins` ranges over its exact min/max (bucketing is monotone, so
    * (bin desc, quality desc, id) IS the global order), aggregate
    * per-bin token totals (nBins rows), prefix-sum those on a
    * broadcast-sized relation, and run the running sum as a window
    * partitioned BY BIN — every partition is corpus/nBins sized,
    * nothing global. Raise nBins until the largest bin fits a task. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, tokenCol: String,
                        qualityCol: String, budget: Long,
                        nBins: Int = 16): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val bounds = df.agg(min(col(qualityCol)).cast("double").as("_qlo"),
      max(col(qualityCol)).cast("double").as("_qhi"))
    val binned = df.crossJoin(broadcast(bounds))
      .withColumn("_bin",
        when(col("_qhi") <= col("_qlo"), lit(0)).otherwise(
          least(greatest(floor((col(qualityCol) - col("_qlo")) * nBins /
            (col("_qhi") - col("_qlo"))).cast("int"), lit(0)),
            lit(nBins - 1))))
      .drop("_qlo", "_qhi")
    val wBins = Window.orderBy(col("_bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // nBins rows — the only "global" window is over this broadcast-sized
    // relation, never the corpus
    val binPrefix = binned.groupBy("_bin")
      .agg(sum(col(tokenCol)).as("_bt"))
      .withColumn("_above", coalesce(sum(col("_bt")).over(wBins), lit(0L)))
      .select("_bin", "_above")
    val wRow = Window.partitionBy("_bin")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    binned.join(broadcast(binPrefix), "_bin")
      .withColumn("tokens_before",
        col("_above") + coalesce(sum(col(tokenCol)).over(wRow), lit(0L)))
      .filter(col("tokens_before") < budget)
      .drop("_bin", "_above")
  }

  /** Per-domain document cap: keep at most `cap` documents per
    * `groupCol` value, preferring the highest `orderCol` (ties broken
    * by ascending `idCol` — fully deterministic across engines). The
    * CommonCrawl-style guard against any single domain/source flooding
    * the training mix regardless of what the mixture weights say —
    * a hard per-group ceiling, where [[mixtureSample]] is a
    * proportional draw.
    *
    * Scale shape: one shuffle on the group key, then a per-group
    * row_number window — partitions are domain-sized, never global, and
    * no partition carries more than its own domain's rows. At 100 TB a
    * pathological mega-domain is exactly the skew case
    * [[graft.operators.Skew]] profiles; cap semantics still only need
    * that domain's top-`cap` rows, which AQE skew-split + the window's
    * rank short-circuit keep bounded. */
  def domainCap(df: DataFrame, idCol: String, groupCol: String,
                orderCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
  }

  /** Epoch upsampling: materialize [[mixtureWeights]]'s implied epochs
    * as actual row multiplicities — the WITH-REPLACEMENT complement of
    * [[mixtureSample]]'s without-replacement draw, and how mixtures
    * with epochs > 1 (rare high-value sources seen several times per
    * training pass) actually reach the trainer. Each document gets
    * `floor(e)` copies plus one more iff its deterministic uniform
    * (the c49 `seededKey/2⁶⁴ + 0.5` recipe — engine-replicable, unlike
    * `rand()`) falls below `frac(e)`, so E[copies] = e exactly and the
    * draw repeats bit-for-bit across runs, partitionings, and engines.
    * Sources with e < 1 downsample by the same rule. Epochs are the
    * UNROUNDED `sample_weight / token_share` — presentation rounding
    * must not decide a Bernoulli boundary.
    *
    * Output: (groupCol, idCol, copy_idx) with copy_idx in [1, copies].
    *
    * Scale shape: the epochs relation is group-sized and broadcast;
    * the multiplicity decision is one codegen projection per row; the
    * explode emits only actual copies (no corpus-sized intermediate
    * beyond the output itself). No shuffle at all until the caller
    * aggregates. */
  /** Quality-filter funnel: the per-rule attrition report a curation
    * pipeline publishes before committing to a rule set. Docs enter the
    * funnel and each ORDERED rule kills some survivors of the rules
    * before it, so `n_killed` attributes every dropped doc to exactly
    * one rule — the FIRST that fires — where independent per-rule
    * counts double-bill docs failing several rules and can't tell a
    * redundant rule from a load-bearing one. A NULL predicate counts
    * as a failure (a doc whose signal is unknowable shouldn't pass a
    * gate on that signal).
    *
    * Output: one row per stage, in rule order —
    * (stage, rule, n_in, n_killed, n_surviving, kill_rate).
    *
    * Scale shape: ONE corpus pass — the survival prefixes are a pure
    * codegen projection, the stage counts are a single
    * map-side-combined global aggregate (one 1-row reduce), and the
    * stage unpivot explodes that 1-row relation. Nothing corpus-sized
    * shuffles, and adding a rule adds a column to the aggregate, not a
    * pass over the data. */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterFunnel needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1).mkString(", ")}")
    // survival prefix i = passed rules 0..i — each doc is billed to the
    // first rule it fails and never re-enters
    val prefixes = rules.scanLeft(lit(true)) {
      case (acc, (_, p)) => acc && coalesce(p, lit(false))
    }.tail
    // coalesce: sum over ZERO rows is NULL — the funnel must degrade to
    // all-zero rows (conservation intact) on an empty corpus
    val surv = prefixes.zipWithIndex.map { case (pre, i) =>
      coalesce(sum(when(pre, 1L).otherwise(0L)), lit(0L)).as(s"_s$i")
    }
    val one = df.agg(count(lit(1)).as("_in"), surv: _*)
    val stages = rules.zipWithIndex.map { case ((name, _), i) =>
      val in = if (i == 0) col("_in") else col(s"_s${i - 1}")
      struct(lit(i + 1).as("stage"), lit(name).as("rule"),
        in.as("n_in"), (in - col(s"_s$i")).as("n_killed"),
        col(s"_s$i").as("n_surviving"),
        round((in - col(s"_s$i")).cast("double") /
          greatest(in, lit(1L)).cast("double"), 6).as("kill_rate"))
    }
    one.select(explode(array(stages: _*)).as("_st")).select("_st.*")
  }

  def epochUpsample(df: DataFrame, idCol: String, groupCol: String,
                    textCol: String, alpha: Double = 0.5,
                    seed: Long = 7L): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val tok = df
      .select(col(groupCol), size(split(col(textCol), "\\s+")).cast("long").as("_t"))
      .groupBy(col(groupCol))
      .agg(sum(col("_t")).as("_tokens"))
    val totals = tok.agg(
      sum(col("_tokens")).as("_total"),
      sum(pow(col("_tokens").cast("double"), alpha)).as("_ptot"))
    val e = (pow(col("_tokens").cast("double"), alpha) / col("_ptot")) /
      (col("_tokens").cast("double") / col("_total").cast("double"))
    val grpEpochs = tok.crossJoin(broadcast(totals))
      .select(col(groupCol), e.as("_e"))
    val u = graft.functions.TextFunctions.seededKey(col(idCol), seed)
      .cast("double") / 1.8446744073709552E19 + 0.5
    df.select(col(idCol), col(groupCol))
      .join(broadcast(grpEpochs), Seq(groupCol))
      .withColumn("_n",
        (floor(col("_e")) +
          when(u < col("_e") - floor(col("_e")), 1L).otherwise(0L)).cast("int"))
      .filter(col("_n") > 0)
      .select(col(groupCol), col(idCol),
        explode(sequence(lit(1), col("_n"))).as("copy_idx"))
  }
}
