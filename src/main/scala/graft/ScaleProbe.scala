package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Sampling, Similarity, TextAnalysis}

/** Scale probe: deterministic 10× blow-up of the embeddings fixture,
  * timing the retrieval/dedup operators' scale tiers against the
  * brute-force baseline. Results are recorded in PLANS.md per round.
  *
  * Usage: `sbt "runMain graft.ScaleProbe [sfDir]"`. Each variant copy
  * perturbs the base vector slightly (copy-and-dimension-dependent,
  * seed-free arithmetic), so near-duplicate structure is planted by
  * construction.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional 2nd arg selects a tier: "vec" | "vec-new" (round-6 ops
    // only) | "text" | "r6b" (late-round-6 graph/text/retrieval ops) |
    // "r8" (round-8 persisted-index/projection/skew ops) | "all" (default)
    val tier = args.lift(1).getOrElse("all")
    require(Set("vec", "vec-new", "text", "r6b", "r8", "r8b", "r9", "r9b", "all")(tier),
      s"unknown tier '$tier' — expected vec | vec-new | text | r6b | r8 | r8b | r9 | r9b | all")
    val spark = GraftSession.build("graft-scale-probe")
    val base = Tables.load(spark, sfDir, "embeddings")

    if (tier == "r8" || tier == "all") {
      import graft.operators.{AnnIndex, DedupIndex, Skew}
      val work = java.nio.file.Files.createTempDirectory("graft_probe_r8").toString
      // 10× docs with per-copy tails: near-dup structure planted
      val docs10 = Tables.load(spark, sfDir, "documents")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("copy")).as("text"),
          col("source"), col("lang"))
        .cache()
      println(s"[probe] r8 docs corpus: ${docs10.count()} documents")
      val corpus10 = docs10.filter(col("doc_id") % 7 =!= 0)
      val crawl10 = docs10.filter(col("doc_id") % 7 === 0)
      // the split the persisted index buys: save is the one-off
      // corpus-sized pass; probe is the recurring per-ingest cost —
      // compare probe against the inline join that re-shingles the
      // corpus every time
      time("DedupIndex.save (corpus-side inverted index, one-off)")({
        DedupIndex.save(spark, s"$work/dedup", corpus10, "doc_id", "text", 3)
        spark.emptyDataFrame
      })
      time("DedupIndex.probe crawl vs persisted index (recurring)")(
        DedupIndex.probe(spark, s"$work/dedup", crawl10, corpus10,
          "doc_id", "text", 3, 0.5))
      time("inline ngramJaccardPairsAcross (re-shingles corpus)")(
        Dedup.ngramJaccardPairsAcross(crawl10, corpus10, "doc_id", "text", 3, 0.5))
      docs10.unpersist()

      // 10× vectors: JL projection is a pure scan-speed projection;
      // AnnIndex splits serve cost from the one-off encode
      val emb10 = base.crossJoin(spark.range(10).toDF("copy"))
        .select((col("vec_id") * 10 + col("copy")).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            x + ((pmod(col("copy") * 5 + j, lit(11)) - 5).cast("float") * lit(0.01f)))
            .as("embedding"))
        .cache()
      println(s"[probe] r8 vectors: ${emb10.count()}")
      time("randomProject 64->16 (JL, literal matrix)")(
        Similarity.randomProject(emb10, "vec_id", "embedding", 16))
      val books = Similarity.pqTrain(emb10, "embedding", 64, 8, 16, 7L, 0.1)
      time("AnnIndex.save (train excluded; encode+persist, one-off)")({
        AnnIndex.save(spark, s"$work/ann", books,
          Similarity.pqEncode(emb10, "vec_id", "embedding", books, 64))
        spark.emptyDataFrame
      })
      time("AnnIndex serve: pqSearch 2000 queries, rerank 50 (recurring)")(
        Similarity.pqSearch(AnnIndex.loadCodes(spark, s"$work/ann"),
          AnnIndex.loadCodebooks(spark, s"$work/ann"), emb10,
          emb10.filter(col("vec_id") < 2000), "vec_id", "embedding",
          10, 64, 16, rerank = 50))
      emb10.unpersist()

      // 10× events: the skew profile is one key aggregation + top-N
      val ev10 = Tables.load(spark, sfDir, "events")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("user_id") + col("copy") * 10000000L).as("user_id"))
        .cache()
      println(s"[probe] r8 events: ${ev10.count()} rows")
      time("Skew.profile top-20 on user_id")(
        Skew.profile(ev10, "user_id", 20))
      ev10.unpersist()
      Tables.deleteRecursively(work)
    }

    if (tier == "r8b" || tier == "all") {
      // 10× docs with per-copy tails (the r8 blow-up): every base doc's
      // 10 copies share all interior windows, so the substring family
      // sees dense planted duplication — the worst case for its
      // candidate volume, not the best
      val docs10 = Tables.load(spark, sfDir, "documents")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("copy")).as("text"))
        .cache()
      println(s"[probe] r8b docs corpus: ${docs10.count()} documents")
      time("duplicatedSubstringStats 30-char windows, 10x docs")(
        Dedup.duplicatedSubstringStats(docs10, "doc_id", "text", 30))
      time("substringDecontam train vs %29 benchmark, 10x docs")(
        Dedup.substringDecontam(
          docs10.filter(col("doc_id") % 29 =!= 0),
          docs10.filter(col("doc_id") % 29 === 0),
          "doc_id", "text", 30))
      // dense-candidate regime: each base doc's 10 copies are mutual
      // edit-near-dups, so the Levenshtein verify pays ~45 DPs per base
      // doc — measures how the verify tier's cost tracks CANDIDATES
      time("editDistancePairs cand 0.3 / sim 0.8, 10x docs (dense candidates)")(
        Dedup.editDistancePairs(docs10, "doc_id", "text", 3, 0.3, 0.8))
      docs10.unpersist()
      // audio: real WAV decode + fingerprint at the full fixture size
      // (unblown — decode cost dominates and scales per-clip linearly)
      time("audioFingerprints (real WAV decode, fixture-size)")(
        graft.multimodal.Multimodal.audioFingerprints(
          graft.multimodal.Multimodal.attachBinary(
            Tables.load(spark, sfDir, "documents"))))
    }

    if (tier == "r6b" || tier == "all") {
      // 10 disjoint copies of the customer–supplier trade graph: per-copy
      // structure identical, total edges ×10 — probes the per-iteration
      // join+agg scaling of the BSP loops (frontiers/ranks never cross
      // copies, so results stay interpretable)
      val e10 = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
        .join(Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .crossJoin(spark.range(10).toDF("copy"))
        .select(concat(lit("c"), col("copy"), lit("_"), col("o_custkey")).as("src"),
          concat(lit("s"), col("copy"), lit("_"), col("l_suppkey")).as("dst"))
        .cache()
      println(s"[probe] graph: ${e10.count()} edges (10x $sfDir)")
      time("pageRank 5 iters, 10x trade graph")(
        graft.operators.Graph.pageRank(e10, "src", "dst", iters = 5))
      time("bfsHops maxHops=3, 10x trade graph")(
        graft.operators.Graph.bfsHops(e10, "src", "dst", "c0_1", maxHops = 3))
      e10.unpersist()

      val docs10 = Tables.load(spark, sfDir, "documents")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("copy")).as("text"),
          col("source"), col("lang"))
        .cache()
      println(s"[probe] docs corpus: ${docs10.count()} documents")
      time("ngramNovelty trigrams")(
        TextAnalysis.ngramNovelty(docs10, "doc_id", "text"))
      time("sourceOverlap trigram Jaccard matrix")(
        TextAnalysis.sourceOverlap(docs10, "source", "text"))
      time("tokenBudgetSelect 10x budget, 16 bins")({
        val b = docs10.select(col("doc_id"),
          size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"),
          (length(col("text")) % 97).cast("double").as("q"))
        Curation.tokenBudgetSelect(b, "doc_id", "n_tokens", "q", 2500000L)
      })
      time("rendezvousShard n=64 (projection)")(
        docs10.select(col("doc_id"),
          Curation.rendezvousShard(col("doc_id"), 64, seed = 7).as("shard")))
      docs10.unpersist()

      val emb10 = base.crossJoin(spark.range(10).toDF("copy"))
        .select((col("vec_id") * 10 + col("copy")).as("vec_id"), col("label"),
          transform(col("embedding"), (x, j) =>
            x + ((pmod(col("copy") * 5 + j, lit(11)) - 5).cast("float") * lit(0.01f)))
            .as("embedding"))
        .cache()
      println(s"[probe] vectors: ${emb10.count()} (10x $sfDir)")
      time("centroidSimilarity over 10 labels")(
        Similarity.centroidSimilarity(emb10, "label", "embedding"))
      time("hardNegatives k=5 band [0.1,0.35), 200 anchors")(
        Similarity.hardNegatives(emb10, emb10.filter(col("vec_id") < 200),
          "vec_id", "embedding", 5, 0.1, 0.35))
      emb10.unpersist()

      // banded hamming pair join on 200k synthetic signatures — the
      // m3 shape without paying 200k image decodes in a probe
      val hashes = spark.range(200000).toDF("doc_id")
        .select(col("doc_id"),
          graft.functions.TextFunctions.seededKey(col("doc_id") % 50000, 3).as("ahash"))
      time("hashNearDupPairs maxHamming=7, 200k signatures")(
        graft.multimodal.Multimodal.hashNearDupPairs(hashes, "doc_id", "ahash", 7))
    }

    if (tier == "r9" || tier == "all") {
      // stage split of the MinHash-LSH dedup pipeline: is the band-
      // bucket candidate join worth a whole-operator Catalyst exec, or
      // does signature computation dominate end-to-end cost? (round-9
      // decision probe — see PLANS.md)
      val docs10 = Tables.load(spark, sfDir, "documents")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("copy")).as("text"))
        .cache()
      println(s"[probe] r9 docs corpus: ${docs10.count()} documents")
      time("minHashDupPairs end-to-end (64 hashes, 32 bands, t=0.6)")(
        Dedup.minHashDupPairs(docs10, "doc_id", "text"))
      val sig = Dedup.minHashSignatures(docs10, "doc_id", "text", 64, 3)
        .cache()
      time("stage: minHashSignatures only")(sig)
      val banded = Dedup.lshBands(sig, "doc_id", 32, 2).cache()
      time("stage: lshBands from cached signatures")(banded)
      val aSide = banded.select(col("doc_id").as("id_a"),
        col("band_idx"), col("band_hash"))
      val bSide = banded.select(col("doc_id").as("id_b"),
        col("band_idx"), col("band_hash"))
      time("stage: candidate self-join + distinct (composition, cached bands)")(
        aSide.join(bSide, Seq("band_idx", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct())
      time("stage: SelfPairsByKey exec + distinct (adopted, cached bands)")(
        graft.plans.SelfPairsByKey
          .selfPairsByKey(banded, Seq("band_idx", "band_hash"), "doc_id")
          .distinct())
      banded.unpersist(); sig.unpersist(); docs10.unpersist()
    }

    if (tier == "r9b" || tier == "all") {
      // round-9 additions at 10×: the stupid-backoff LM (two count-
      // relation joins — does the model-relation equi-join stay flat as
      // the corpus grows?), the filter funnel (must be scan-bound), and
      // the CDC snapshot diff (one full-outer join on the key)
      val docs10 = Tables.load(spark, sfDir, "documents")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("copy")).as("text"),
          col("lang"))
        .cache()
      println(s"[probe] r9b docs corpus: ${docs10.count()} documents")
      time("stupidBackoff (en-slice LM, all docs scored)")(
        TextAnalysis.stupidBackoff(docs10.filter(col("lang") === "en"),
          docs10, "doc_id", "text"))
      time("filterFunnel (5 rules over qualityFeatures)")(
        Curation.filterFunnel(
          TextAnalysis.qualityFeatures(docs10, "doc_id", "text"),
          Seq("min_words" -> (col("n_words") >= 20),
            "min_stopwords" -> (col("stopword_ratio") >= 0.05),
            "word_len_band" -> col("mean_word_len").between(5.0, 5.9),
            "max_words" -> (col("n_words") <= 90),
            "max_stopwords" -> (col("stopword_ratio") <= 0.15))))
      docs10.unpersist()
      val orders10 = Tables.load(spark, sfDir, "orders")
        .crossJoin(spark.range(10).toDF("copy"))
        .select((col("o_orderkey") * 10 + col("copy")).as("o_orderkey"),
          col("o_totalprice"))
        .cache()
      println(s"[probe] r9b orders: ${orders10.count()}")
      val prev = orders10.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice").as("old_price"))
      val curr = orders10.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.5)
            .otherwise(col("o_totalprice")).as("new_price"))
      time("snapshotDiff full-outer (10x orders)")(
        prev.join(curr, Seq("o_orderkey"), "full_outer")
          .withColumn("change_type",
            when(col("old_price").isNull, "insert")
              .when(col("new_price").isNull, "delete")
              .when(col("old_price") =!= col("new_price"), "update"))
          .filter(col("change_type").isNotNull))
      orders10.unpersist()
    }

    if (Set("vec", "vec-new", "all")(tier)) {
    val newOnly = tier == "vec-new"
    val blown = base.crossJoin(spark.range(10).toDF("copy"))
      .select(
        (col("vec_id") * 10 + col("copy")).as("vec_id"),
        // mod 11 with coefficient 5 (coprime): all 10 copies get distinct
        // perturbation patterns — mod 7 with coefficient 31 ≡ 3 collapsed
        // copies {0,7}, {1,8}, {2,9} into byte-identical vectors
        transform(col("embedding"), (x, j) =>
          x + ((pmod(col("copy") * 5 + j, lit(11)) - 5).cast("float") * lit(0.01f)))
          .as("embedding"))
      .cache()
    val n = blown.count()
    println(s"[probe] corpus: $n vectors (10x ${sfDir})")
    // batch-retrieval workload: 2000 queries against the 20k corpus.
    // (With a handful of queries, signature/quantizer construction
    // dominates and brute force wins — the approximate tiers are for
    // query volumes where per-query cost matters.)
    val queries = blown.filter(col("vec_id") < 2000)
    if (!newOnly) {
    time("bruteForceKnn k=10, 2000 queries")(
      Similarity.bruteForceKnn(blown, queries, "vec_id", "embedding", 10))
    time("annKnn k=10, 2000 queries (16 tables, auto bits)")(
      Similarity.annKnn(blown, queries, "vec_id", "embedding", 10,
        nBits = 0, nTables = 16))
    time("ivfKnn k=10, 2000 queries (64 cells, probe 8, fit on 25%)")(
      Similarity.ivfKnn(blown, queries, "vec_id", "embedding", 10,
        nCells = 64, nProbe = 8, trainFraction = 0.25))
    time("embeddingDedupAnn t=0.9 (16 tables)")(
      Dedup.embeddingDedupAnn(blown, "vec_id", "embedding", 0.9, nTables = 16))
    time("annPairsTopK k=100 (8 tables, auto bits)")(
      Similarity.annPairsTopK(blown, "vec_id", "embedding", 100))
    }
    time("pqKnn k=10, 2000 queries (m=8 ksub=16, rerank 50, fit on 25%)")(
      Similarity.pqKnn(blown, queries, "vec_id", "embedding", 10,
        m = 8, ksub = 16, rerank = 50, trainFraction = 0.25))
    time("ivfPqKnn k=10, 2000 queries (64 cells/probe 8, m=8 ksub=16, rerank 50, residual)")(
      Similarity.ivfPqKnn(blown, queries, "vec_id", "embedding", 10,
        nCells = 64, nProbe = 8, m = 8, ksub = 16, rerank = 50,
        trainFraction = 0.25))
    time("semanticDedup t=0.9 (64 cells)")(
      Dedup.semanticDedup(blown, "vec_id", "embedding", 0.9, nCells = 64,
        trainFraction = 0.25))
    }

    if (Set("text", "all")(tier)) {
    // text-curation tier (round 3): 10× blow-up of the documents fixture
    // with a copy marker appended so near-dup (not identical) structure
    // is planted by construction
    val docsBase = Tables.load(spark, sfDir, "documents")
    val docsBlown = docsBase.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
        concat(col("text"), lit(" tail"), col("copy")).as("text"),
        col("source"), col("lang"))
      .cache()
    println(s"[probe] docs corpus: ${docsBlown.count()} documents")
    time("repetitionSignals")(
      TextAnalysis.repetitionSignals(docsBlown, "doc_id", "text"))
    time("decontaminate vs 1/29th benchmark (trigrams)")(
      TextAnalysis.decontaminate(
        docsBlown.filter(col("doc_id") % 29 =!= 0),
        docsBlown.filter(col("doc_id") % 29 === 0),
        "doc_id", "text", shingleN = 3))
    time("quantileFilter P25 on length")(
      Sampling.quantileFilter(
        docsBlown.select(col("doc_id"), length(col("text")).as("len")),
        "len", 0.25))
    // round-4 additions
    time("spanDedup 10-word spans")(
      Dedup.spanDedup(docsBlown, "doc_id", "text", spanWords = 10))
    time("bigramLogProb k=0.5")(
      TextAnalysis.bigramLogProb(docsBlown, "doc_id", "text"))
    time("tfidfKeywords k=3")(
      TextAnalysis.tfidfKeywords(docsBlown, "doc_id", "text", 3))
    time("sequencePack 512/source")(
      Curation.sequencePack(docsBlown, "doc_id", "text", "source", 512))
    // round-5 additions: the iterated tokenizer loop is vocabulary-
    // bounded — the 50k-doc corpus should cost barely more than the
    // 5k one per round; keepBest exercises the max_by aggregation on
    // the planted 10-copy near-dup clusters
    var mt: Seq[(String, String)] = Seq.empty
    time("bpeMergeTable 10 rounds")({
      val t = TextAnalysis.bpeMergeTable(docsBlown, "text", 10)
      mt = t.orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      t
    })
    // application timed with the PRECOMPUTED table (the production
    // shape) — training is measured once above, not re-paid here
    time("bpeSegmentWith (apply learned 10-merge table)")(
      TextAnalysis.bpeSegmentWith(docsBlown, "doc_id", "text", mt))
    time("keepBestPerCluster over synthetic 10-copy clusters")(
      Dedup.keepBestPerCluster(
        docsBlown.select(col("doc_id"),
          (col("doc_id") - pmod(col("doc_id"), lit(10))).as("cluster_rep")),
        docsBlown.select(col("doc_id"), length(col("text")).as("q")),
        "doc_id", "q"))
    // round-6 additions: all four are projection/agg shapes whose only
    // corpus-keyed shuffle is a per-doc (or per-doc-class) sum — 10×
    // the corpus should cost ~10× the scan, nothing super-linear
    time("perplexityBuckets vs en slice")(
      TextAnalysis.perplexityBuckets(docsBlown,
        docsBlown.filter(col("lang") === "en"), "doc_id", "text"))
    time("dsirWeights vs en slice (1024 buckets)")(
      Curation.dsirWeights(docsBlown,
        docsBlown.filter(col("lang") === "en"), "doc_id", "text"))
    time("chunkPassages 16/8")(
      TextAnalysis.chunkPassages(docsBlown, "doc_id", "text", 16, 8))
    time("naiveBayesClassify on lang labels")(
      TextAnalysis.naiveBayesClassify(docsBlown, "doc_id", "text", "lang"))
    }
    spark.stop()
  }

  // by-name: operators with EAGER construction work (the BPE driver
  // loop's per-round collects) must be timed from construction, not
  // just the final noop write of their (tiny) result
  private def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
