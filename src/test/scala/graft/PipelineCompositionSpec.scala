package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sampling, TextAnalysis}

/** End-to-end curation-pipeline composition (round 11): every operator
  * here is individually oracle- or spec-checked; this suite asserts the
  * CROSS-STAGE invariants a real training-data pipeline relies on when
  * they compose — the funnel report reconciling with the survivor
  * relation it describes, dedup removing exactly the planted copies,
  * split totality, token-budget adherence on the composed relation, and
  * whole-pipeline determinism (every stage is seeded arithmetic, so two
  * full runs must agree bit-for-bit — the property that makes a 100 TB
  * pipeline re-runnable and auditable).
  *
  * Pipeline under test: documents (+ planted exact duplicates)
  *   → qualityFeatures → filterFunnel survivors
  *   → exactDedup → hashSplit(train/val/test)
  *   → tokenCounts ⋈ quality → tokenBudgetSelect
  *   → epochUpsample over the train split.
  */
class PipelineCompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private case class RunResult(
      corpusN: Long, funnelIn: Long, funnelOut: Long, survivorsN: Long,
      dedupedN: Long, plantedSurvivingDedup: Long, dupTextGroups: Long,
      splitCounts: Map[String, Long], trainIds: Set[Long], selectedIds: Seq[Long],
      selectedTokens: Long, budget: Long,
      trainTokens: Seq[(Long, Long, Double)], // (doc_id, bpe_tokens, quality)
      epochRows: Seq[(String, Long, Long)])

  private def runPipeline(): RunResult = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "source", "lang")
    // plant exact duplicates under fresh ids: originals keep the lower
    // id, so first-occurrence dedup must eliminate every planted copy
    val planted = docs.filter(col("doc_id") % 31 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"), col("source"), col("lang"))
    val corpus = docs.unionAll(planted)

    val feats = TextAnalysis.qualityFeatures(corpus, "doc_id", "text")
    val rules = Seq(
      "min_words" -> (col("n_words") >= 20),
      "stopwords" -> (col("stopword_ratio") >= 0.03))
    val funnel = Curation.filterFunnel(feats, rules).orderBy("stage").collect()
    val survivorIds = feats
      .filter(rules.map(r => coalesce(r._2, lit(false))).reduce(_ && _))
      .select("doc_id")
    val survivors = corpus.join(survivorIds, "doc_id")

    val deduped = Dedup.exactDedup(survivors, "doc_id", "text")
    val split = Sampling.hashSplit(deduped, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val train = split.filter(col("_split") === "train")

    val withTokens = TextAnalysis.tokenCounts(train, "doc_id", "text")
      .join(feats.select("doc_id", "stopword_ratio"), Seq("doc_id"))
    val totalTokens = withTokens.agg(sum("bpe_tokens")).head().getLong(0)
    val budget = totalTokens / 2
    val selected = Curation.tokenBudgetSelect(withTokens, "doc_id",
      "bpe_tokens", "stopword_ratio", budget)

    val epochs = Curation.epochUpsample(train, "doc_id", "source", "text",
      alpha = 0.5, seed = 7L)

    RunResult(
      corpusN = corpus.count(),
      funnelIn = funnel.head.getAs[Long]("n_in"),
      funnelOut = funnel.last.getAs[Long]("n_surviving"),
      survivorsN = survivors.count(),
      dedupedN = deduped.count(),
      plantedSurvivingDedup = deduped.filter(col("doc_id") >= 1000000L).count(),
      dupTextGroups = deduped.groupBy("text").count()
        .filter(col("count") > 1).count(),
      splitCounts = split.groupBy("_split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet,
      selectedIds = selected.select("doc_id").collect()
        .map(_.getLong(0)).toSeq.sorted,
      selectedTokens = selected.agg(coalesce(sum("bpe_tokens"), lit(0L)))
        .head().getLong(0),
      budget = budget,
      trainTokens = withTokens.select("doc_id", "bpe_tokens", "stopword_ratio")
        .collect().map(r => (r.getLong(0),
          r.getAs[Number](1).longValue(), r.getDouble(2))).toSeq,
      epochRows = epochs.collect()
        .map(r => (r.getAs[String]("source"),
          r.getAs[Number]("doc_id").longValue(),
          r.getAs[Number]("copy_idx").longValue())).toSeq.sorted)
  }

  private lazy val run1 = runPipeline()

  test("funnel report reconciles with the survivor relation it describes") {
    assert(run1.funnelIn == run1.corpusN)
    assert(run1.funnelOut == run1.survivorsN)
    assert(run1.survivorsN > 0, "fixture/rules degenerate: nothing survived")
    assert(run1.survivorsN < run1.corpusN, "fixture/rules degenerate: nothing killed")
  }

  test("dedup removes every planted copy (first occurrence wins) and leaves no dup text") {
    // a planted copy's text is identical to its original's, so the two
    // rows survive or die TOGETHER at the funnel; whenever both survive,
    // the original's lower id must win the dedup
    assert(run1.plantedSurvivingDedup == 0,
      s"${run1.plantedSurvivingDedup} planted copies outlived exactDedup")
    assert(run1.dupTextGroups == 0, "duplicate text groups after dedup")
    assert(run1.dedupedN < run1.survivorsN, "dedup removed nothing — fixture broken")
  }

  test("hash split is a partition: every doc in exactly one named split") {
    assert(run1.splitCounts.keySet.subsetOf(Set("train", "val", "test")))
    assert(run1.splitCounts.values.sum == run1.dedupedN)
    assert(run1.splitCounts.getOrElse("train", 0L) > 0)
  }

  test("token-budget selection matches its greedy contract on the composed relation") {
    // documented semantics: keep a doc iff the tokens of all
    // strictly-better docs (quality desc, id asc) total < budget — the
    // budget-CROSSING doc is included, then selection stops. Replicate
    // that order driver-side and demand the exact same id set.
    val ordered = run1.trainTokens.sortBy { case (id, _, q) => (-q, id) }
    val expected = ordered.scanLeft(0L) { case (acc, (_, t, _)) => acc + t }
      .zip(ordered).collect { case (before, (id, _, _)) if before < run1.budget => id }
      .sorted
    assert(run1.selectedIds == expected)
    assert(run1.selectedIds.nonEmpty, "budget selection degenerate: empty")
    // bounded overshoot: at most the crossing document
    val maxTok = run1.trainTokens.map(_._2).max
    assert(run1.selectedTokens <= run1.budget + maxTok)
    // selected docs come from the train split only
    assert(run1.selectedIds.toSet.subsetOf(run1.trainIds))
  }

  test("epoch upsampling emits only train docs, copy indices from 1") {
    assert(run1.epochRows.nonEmpty)
    assert(run1.epochRows.forall(_._3 >= 1L))
    assert(run1.epochRows.map(_._2).toSet.subsetOf(run1.trainIds))
  }

  test("the whole pipeline is deterministic: a second full run is identical") {
    val run2 = runPipeline()
    assert(run2 == run1)
  }
}
