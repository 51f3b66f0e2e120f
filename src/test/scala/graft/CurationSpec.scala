package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Round-4 training-mix and sub-document operators: span-level dedup,
  * incremental ingestion dedup, mixture weights, sequence packing,
  * TF-IDF keywords.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- spanDedup -----------------------------------------------------

  test("spanDedup drops a span repeated across documents, keeps first occurrence") {
    val docs = Seq(
      (1L, "a b c d e f"),          // spans: "a b c", "d e f"
      (2L, "a b c x y z"),          // "a b c" is a dup of doc 1's span 0
      (3L, "q r s")
    ).toDF("id", "text")
    val out = Dedup.spanDedup(docs, "id", "text", spanWords = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 2, 2L, "a b c d e f")))
    assert(out(1) == ((2L, 2, 1L, "x y z")))
    assert(out(2) == ((3L, 1, 1L, "q r s")))
  }

  test("spanDedup: doc whose every span occurs earlier reassembles to empty") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c"),
      (3L, "d e f")
    ).toDF("id", "text")
    val out = Dedup.spanDedup(docs, "id", "text", spanWords = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out(1) == ((2L, 0L, "")))
    assert(out(2) == ((3L, 0L, "")))
  }

  test("spanDedup: a span repeated within one document keeps only the first position") {
    val docs = Seq((1L, "p q r p q r")).toDF("id", "text")
    val out = Dedup.spanDedup(docs, "id", "text", spanWords = 3).collect().head
    assert(out.getInt(1) == 2 && out.getLong(2) == 1L && out.getString(3) == "p q r")
  }

  test("spanDedup: trailing partial span is its own unit and survives clamped") {
    val docs = Seq((1L, "a b c d")).toDF("id", "text") // spans "a b c", "d"
    val out = Dedup.spanDedup(docs, "id", "text", spanWords = 3).collect().head
    assert(out.getInt(1) == 2 && out.getString(3) == "a b c d")
  }

  test("spanDedup shuffles the first-occurrence agg on the 8-byte span hash") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup.spanDedup(docs, "doc_id", "text", spanWords = 10)
      .queryExecution.executedPlan.toString
    // the span-dedup aggregation must partition on (xxhash64(span), span)
    // — exactDedup's two-level shape — never on the raw span string alone
    assert("hashpartitioning\\(_h#".r.findFirstIn(plan).isDefined,
      s"expected the span exchange keyed by the hash column, plan:\n$plan")
  }

  // ---- incrementalDedup ----------------------------------------------

  test("incrementalDedup dedups within batch then drops corpus-known texts") {
    val corpus = Seq((10L, "known text"), (11L, "other old")).toDF("id", "text")
    val batch = Seq(
      (20L, "known text"),    // already in corpus → dropped
      (21L, "fresh content"), // new → kept
      (22L, "fresh content"), // within-batch dup of 21 → dropped
      (23L, "also new")
    ).toDF("id", "text")
    val kept = Dedup.incrementalDedup(batch, corpus, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(21L, 23L)))
  }

  // ---- mixtureWeights ------------------------------------------------

  test("mixtureWeights: alpha=0.5 flattens a 9:1 token mix to 3:1") {
    val docs = Seq(
      ("big", "w w w w w w w w w"),   // 9 tokens
      ("small", "w")                  // 1 token
    ).toDF("source", "text")
    val out = Curation.mixtureWeights(docs, "source", "text", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (bt, bShare, bW, bEp) = out("big")
    assert(bt == 9L && bShare == 0.9 && bW == 0.75)
    assert(math.abs(bEp - 0.833333) < 1e-6)
    val (st, sShare, sW, sEp) = out("small")
    assert(st == 1L && sShare == 0.1 && sW == 0.25 && sEp == 2.5)
  }

  // ---- sequencePack --------------------------------------------------

  test("sequencePack assigns running-sum bins and offsets per group") {
    val docs = Seq(
      ("s", 1L, "a b c"),     // 3 tokens, ce=0 → bin 0 off 0
      ("s", 2L, "a b c"),     // ce=3 → bin 0 off 3
      ("s", 3L, "a b c"),     // ce=6 → bin 1 off 1
      ("t", 4L, "a b c d e f g"), // 7 tokens (> budget), ce=0 → bin 0 off 0
      ("t", 5L, "a")          // ce=7 → bin 1 off 2
    ).toDF("source", "id", "text")
    val out = Curation.sequencePack(docs, "id", "text", "source", budgetTokens = 5)
      .orderBy("source", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == (("s", 1L, 3L, 0L, 0L)))
    assert(out(1) == (("s", 2L, 3L, 0L, 3L)))
    assert(out(2) == (("s", 3L, 3L, 1L, 1L)))
    assert(out(3) == (("t", 4L, 7L, 0L, 0L)))
    assert(out(4) == (("t", 5L, 1L, 1L, 2L)))
  }

  test("sequencePack plans exactly one exchange (window partitions on the group key)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Curation.sequencePack(docs, "doc_id", "text", "source", 512)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  // ---- tfidfKeywords -------------------------------------------------

  test("tfidfKeywords hand-computed scores and deterministic rank") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry")
    ).toDF("id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "id", "text", k = 3)
      .orderBy("id", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    // doc1: apple tf=2 df=1 → 2·ln2 ≈ 1.386294; banana tf=1 df=2 → 0
    assert(out(0) == ((1L, "apple", 2L, 1.386294, 1)))
    assert(out(1) == ((1L, "banana", 1L, 0.0, 2)))
    // doc2: cherry ln2 ≈ 0.693147 beats banana 0
    assert(out(2) == ((2L, "cherry", 1L, 0.693147, 1)))
    assert(out(3) == ((2L, "banana", 1L, 0.0, 2)))
  }

  // ---- bigramLogProb -------------------------------------------------

  test("bigramLogProb hand-computed add-k scores") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "text")
    // uni: a→3, b→3; V=2; bigrams: (a,b)→3, (b,a)→1
    val pAB = math.log((3 + 0.5) / (3 + 0.5 * 2))
    val pBA = math.log((1 + 0.5) / (3 + 0.5 * 2))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextAnalysis.bigramLogProb(docs, "id", "text", k = 0.5)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out(0) == ((1L, r6((2 * pAB + pBA) / 3), 3L)))
    assert(out(1) == ((2L, r6(pAB), 1L)))
  }

  test("bigramLogProb omits single-word documents") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("id", "text")
    val ids = TextAnalysis.bigramLogProb(docs, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  // ---- keepBestPerCluster --------------------------------------------

  test("keepBestPerCluster keeps highest quality, ties break on ascending id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("id", "cluster_rep")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 7L), (5L, 2L))
      .toDF("id", "q")
    val out = Dedup.keepBestPerCluster(clusters, quality, "id", "q")
      .orderBy("cluster_rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 2L, 9L, 2L)))  // quality 9 beats 5
    assert(out(1) == ((3L, 3L, 7L, 2L)))  // tie at 7 → smaller id
    assert(out(2) == ((5L, 5L, 2L, 1L)))  // singleton passes through
  }

  test("keepBestPerCluster: string ids work (type-agnostic tie-break) and NULL quality loses") {
    // regression: a numeric-only tie-break (negated id) would throw
    // under ANSI on string ids or silently break tie totality
    val clusters = Seq(("a", "x"), ("b", "x"), ("c", "c"), ("d", "n"), ("e", "n"))
      .toDF("id", "cluster_rep")
    val quality = Seq(("a", Some(5L)), ("b", Some(5L)), ("c", Some(1L)),
      ("d", Option.empty[Long]), ("e", Option.empty[Long])).toDF("id", "q")
    val out = Dedup.keepBestPerCluster(clusters, quality, "id", "q")
      .orderBy("cluster_rep")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.get(2)), r.getLong(3)))
    assert(out(0) == (("c", "c", Some(1L), 1L)))         // singleton
    // all-NULL-quality cluster: falls back to min id, quality NULL
    assert(out(1) == (("n", "d", None, 2L)))
    assert(out(2) == (("x", "a", Some(5L), 2L)))         // tie at 5 → "a"
  }

  test("keepBestPerCluster: a million-row single cluster aggregates without a window sort") {
    // the real-world skew case — one boilerplate string shared by a
    // million documents lands ALL membership rows in one cluster_rep;
    // the aggregation form map-side-combines it, where a
    // window-partitioned-by-cluster formulation would sort the whole
    // cluster in a single task (twice)
    val n = 1000000L
    val clusters = spark.range(n).select(col("id"), lit(0L).as("cluster_rep"))
    val quality = spark.range(n).select(col("id"), (col("id") % 1000).as("q"))
    val df = Dedup.keepBestPerCluster(clusters, quality, "id", "q")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keep-best must be an aggregation, not a window, plan:\n$plan")
    val out = df.collect()
    assert(out.length == 1)
    val r = out.head
    // max quality 999, ties (ids 999, 1999, …) break on SMALLEST id
    assert(r.getLong(0) == 0L && r.getLong(1) == 999L &&
      r.getLong(2) == 999L && r.getLong(3) == n)
  }

  test("incrementalDedup: a corpus NULL text blocks a batch NULL text (null-safe hash key)") {
    val corpus = Seq((Some(10L), Some("known")), (Some(11L), Option.empty[String]))
      .toDF("id", "text")
    val batch = Seq((Some(20L), Option.empty[String]), (Some(21L), Some("fresh")))
      .toDF("id", "text")
    // xxhash64(NULL) is NULL: a non-null-safe hash equi-key would null
    // the whole join condition and let batch row 20 slip past corpus
    // row 11 — inconsistent with exactDedup's NULL-as-one-text semantics
    val kept = Dedup.incrementalDedup(batch, corpus, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(21L)))
  }

  // ---- CharNgrams ----------------------------------------------------

  test("char_ngrams equals the composed transform/substring form, incl. multi-byte") {
    val texts = Seq("Hello World", "的是了在我有", "ab", "a", "", "mixé 中文 ok")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val composed = texts
      .select(col("id"), lower(col("text")).as("t"))
      .select(col("id"), expr(
        "transform(sequence(1, greatest(length(t) - 2, 1)), i -> substring(t, i, 3))").as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val fast = texts
      .select(col("id"), graft.functions.ChunkFunctions.char_ngrams(
        col("text"), 3, lowercase = true).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    composed.zip(fast).foreach { case (c, f) => assert(c == f) }
  }

  // ---- ngramJaccardPairsAcross ---------------------------------------

  test("ngramJaccardPairsAcross finds cross-relation near-dups only") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely different corpus content here today")
    ).toDF("id", "text")
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy cat"), // near-dup of 10
      (21L, "the quick brown fox jumps over the lazy rat"), // near-dup of 10 AND 20
      (22L, "brand new unrelated words entirely fresh")
    ).toDF("id", "text")
    val pairs = Dedup.ngramJaccardPairsAcross(batch, corpus, "id", "text",
        shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((20L, 10L), (21L, 10L)),
      s"within-batch pair (20,21) must NOT appear; got $pairs")
  }

  test("ngramJaccardPairsAcross matches the one-relation join restricted across sides") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = d.filter(col("doc_id") % 7 === 0)
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val across = Dedup.ngramJaccardPairsAcross(batch, corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the one-relation join emits id_a < id_b — normalize to (batch, corpus)
    val full = Dedup.ngramJaccardPairs(d, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .filter { case (x, y) => x % 7 == 0 && y % 7 != 0 }.toSet
    assert(across == full)
  }

  // ---- pmiCollocations -----------------------------------------------

  test("pmiCollocations hand-computed PMI with min-count filter") {
    val docs = Seq((1L, "new york new york"), (2L, "in new york")).toDF("id", "text")
    // uni: new 3, york 3, in 1; T=7; bigrams: "new york"×3, "york new", "in new"; Tb=5
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = TextAnalysis.pmiCollocations(docs, "text", k = 10, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ny = all.find(_._1 == "new york").get
    assert(ny._2 == 3L)
    assert(ny._3 == r6(math.log((3.0 / 5.0) / ((3.0 / 7.0) * (3.0 / 7.0)))))
    // min-count 2 keeps only the repeated pair
    val filtered = TextAnalysis.pmiCollocations(docs, "text", k = 10, minCount = 2L)
      .collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("new york"))
  }

  test("tfidfKeywords ties broken by ascending token") {
    val docs = Seq((1L, "zeta alpha"), (2L, "unrelated words")).toDF("id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "id", "text", k = 2)
      .filter(col("id") === 1L).orderBy("rk")
      .collect().map(r => (r.getString(1), r.getInt(4)))
    // both tokens score 1·ln2 — alpha must rank first
    assert(out.toSeq == Seq(("alpha", 1), ("zeta", 2)))
  }

  test("dsirWeights: target-like documents outweigh off-target ones") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta"),   // pure target vocabulary
      (2L, "gamma delta epsilon zeta"), // disjoint from target
      (3L, "alpha beta gamma delta")    // mixed
    ).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    val w = Curation.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("weight"), r.getAs[Long]("n_feats"))).toMap
    assert(w(1L)._1 > w(3L)._1 && w(3L)._1 > w(2L)._1)
    // n_feats = unigrams + full bigrams: 4 + 3
    assert(w.values.forall(_._2 == 7L))
  }

  test("dsirWeights: identical text gets the identical weight") {
    val corpus = Seq(
      (1L, "same exact words"), (2L, "same exact words"),
      (3L, "other content here")).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    val w = Curation.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight"))
      .toMap
    assert(w(1L) == w(2L))
    assert(w(1L) > w(3L))
  }

  test("dsirWeights rejects a non-power-of-two bucket count") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Curation.dsirWeights(d, d, "doc_id", "text", buckets = 1000)
    }
  }

  test("tokenBudgetSelect: greedy by quality, crossing doc kept, then stop") {
    import spark.implicits._
    // quality order: d1 (0.9, 100 tok), d2 (0.8, 100), d3 (0.7, 100), ...
    val df = Seq(
      (1L, 100L, 0.9), (2L, 100L, 0.8), (3L, 100L, 0.7), (4L, 100L, 0.6)
    ).toDF("doc_id", "n_tokens", "q")
    // budget 250: d1 (before=0), d2 (before=100), d3 (before=200 < 250,
    // crosses) kept; d4 (before=300) dropped
    val out = Curation.tokenBudgetSelect(df, "doc_id", "n_tokens", "q", 250L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("tokens_before")).toMap
    assert(out == Map(1L -> 0L, 2L -> 100L, 3L -> 200L))
  }

  test("tokenBudgetSelect: binned selection equals the global running sum") {
    import spark.implicits._
    // 200 docs, adversarial ties in quality, varying token counts
    val df = (1L to 200L)
      .map(i => (i, 10L + i % 7, (i % 13).toDouble / 13.0))
      .toDF("doc_id", "n_tokens", "q")
    for (bins <- Seq(2, 4, 16)) {
      val got = Curation
        .tokenBudgetSelect(df, "doc_id", "n_tokens", "q", 1000L, nBins = bins)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("tokens_before")).toMap
      // reference: plain in-memory greedy scan in (q desc, id asc) order
      var acc = 0L
      val want = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy { case (id, _, q) => (-q, id) }
        .flatMap { case (id, tok, _) =>
          val before = acc; acc += tok
          if (before < 1000L) Some(id -> before) else None
        }.toMap
      assert(got == want, s"nBins=$bins diverged from the global rule")
    }
  }

  test("rendezvousShard: adding a shard only moves rows TO the new shard") {
    import spark.implicits._
    val ids = (1L to 1000L).toDF("id")
    val both = ids.select(col("id"),
      Curation.rendezvousShard(col("id"), 4, seed = 7).as("s4"),
      Curation.rendezvousShard(col("id"), 5, seed = 7).as("s5"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // the defining rendezvous property: a row keeps its shard unless
    // the NEW shard's hash wins — no lateral moves between old shards
    assert(both.forall { case (a, b) => b == a || b == 4 })
    val moved = both.count { case (a, b) => b != a }.toDouble / both.length
    assert(moved > 0.1 && moved < 0.35, s"moved fraction $moved not ~1/5")
    // balance: each of the 4 shards holds a reasonable share
    val byShard = both.groupBy(_._1).view.mapValues(_.length)
    assert(byShard.size == 4 && byShard.values.forall(n => n > 150 && n < 350))
    // seed changes the assignment
    val other = ids.select(Curation.rendezvousShard(col("id"), 4, seed = 8).as("s"))
      .collect().map(_.getInt(0))
    assert(other.toSeq != both.map(_._1).toSeq)
  }

  test("tokenBudgetSelect: constant quality degenerates to id order") {
    import spark.implicits._
    val df = Seq((3L, 5L, 1.0), (1L, 5L, 1.0), (2L, 5L, 1.0))
      .toDF("doc_id", "n_tokens", "q")
    val out = Curation.tokenBudgetSelect(df, "doc_id", "n_tokens", "q", 10L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(1L, 2L))
  }

  test("domainCap: per-group ceiling, best-first order, ties broken by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 200L),
      (5L, "b", 50L),
      (6L, "c", 10L), (7L, "c", 20L), (8L, "c", 30L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, "doc_id", "source", "n_chars", cap = 2)
      .orderBy("source", "rk")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rk"))).toSeq
    // a: 300-tie between 2 and 3 → id ascending wins; 4 (200) capped out
    // b: under cap, fully kept; c: top-2 by length
    assert(out == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1),
      ("c", 8L, 1), ("c", 7L, 2)))
    // determinism under a different physical partitioning
    val re = Curation.domainCap(docs.repartition(5), "doc_id", "source",
        "n_chars", cap = 2)
      .orderBy("source", "rk")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rk"))).toSeq
    assert(re == out)
  }

  test("mixtureSample: exact quotas, key-ordered draw, partition-invariant, two-phase exact") {
    import org.apache.spark.sql.expressions.Window
    val docs = ((1L to 9L).map(i => (i, "a")) ++ Seq((20L, "b"), (21L, "b"), (22L, "b")))
      .toDF("doc_id", "source")
    val quotas = Seq(("a", 4L), ("b", 1L)).toDF("source", "quota")
    def draw(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Int)] =
      Curation.mixtureSample(df, "doc_id", "source", quotas, "quota", seed = 7L)
        .orderBy("source", "rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val got = draw(docs)
    // exact per-group counts
    assert(got.count(_._1 == "a") == 4 && got.count(_._1 == "b") == 1)
    // the draw equals the top-quota by the descending seeded key — the
    // NAIVE single-window reference (two-phase selection must commute)
    val wg = Window.partitionBy("source").orderBy(
      graft.functions.TextFunctions.seededKey(col("doc_id"), 7L).desc,
      col("doc_id"))
    val naive = docs.join(broadcast(quotas), "source")
      .withColumn("rk", row_number().over(wg))
      .filter(col("rk") <= col("quota"))
      .select("source", "doc_id", "rk")
      .orderBy("source", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == naive, s"two-phase diverges from single-window: $got vs $naive")
    // determinism under a different physical partitioning (the property
    // rand()-based sampling does NOT have)
    assert(draw(docs.repartition(7)) == got)
  }

  test("epochUpsample: alpha=1 is an exact identity, fractional epochs bound copies") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "big", "a b c d e f g h"), (2L, "big", "a b c d e f g h"),
      (3L, "big", "a b c d e f g h"), (4L, "big", "a b c d e f g h"),
      (5L, "rare", "x y"), (6L, "rare", "x y")
    ).toDF("doc_id", "source", "text")
    // alpha = 1: sample_weight == token_share exactly (integer token
    // counts are exact in double), epochs == 1.0, every doc exactly once
    val flat = Curation.epochUpsample(docs, "doc_id", "source", "text",
        alpha = 1.0, seed = 7L)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(flat.sorted.toSeq == (1L to 6L).map(d => (d, 1)), s"got ${flat.toSeq}")
    // alpha = 0.5: rare upsamples (e > 1), big downsamples (e < 1);
    // copies per doc must be floor(e) or floor(e)+1
    val e = { // replay the epochs formula
      val tokens = Map("big" -> 32.0, "rare" -> 4.0)
      val ptot = tokens.values.map(math.sqrt).sum
      val total = tokens.values.sum
      tokens.map { case (s, t) => s -> (math.sqrt(t) / ptot) / (t / total) }
    }
    assert(e("rare") > 1.0 && e("big") < 1.0, s"fixture must split epochs: $e")
    val up = Curation.epochUpsample(docs, "doc_id", "source", "text",
        alpha = 0.5, seed = 7L)
      .groupBy("source", "doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    up.foreach { case ((src, id), n) =>
      val lo = math.floor(e(src)).toLong
      assert(n == lo || n == lo + 1, s"doc $id of $src drew $n copies, e=${e(src)}")
    }
    // every rare doc appears (floor(e) >= 1); big docs may drop to 0
    assert(Seq(5L, 6L).forall(d => up.contains(("rare", d))))
    // the draw repeats bit-for-bit across runs and partitionings
    val again = Curation.epochUpsample(docs.repartition(5), "doc_id", "source",
        "text", alpha = 0.5, seed = 7L)
      .groupBy("source", "doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == up)
  }

  // ---- filterFunnel --------------------------------------------------

  test("filterFunnel bills each doc to the FIRST failing rule; NULL fails") {
    // (5,5) fails both rules → billed to r1 only; (15,5) fails r2;
    // (15,15) survives; (null,15) fails r1 by the NULL-fails contract
    val df = Seq(
      (Option(5), Option(5)), (Option(15), Option(5)),
      (Option(15), Option(15)), (Option.empty[Int], Option(15))
    ).toDF("a", "b")
    val out = Curation.filterFunnel(df, Seq(
        "r1" -> (col("a") >= 10), "r2" -> (col("b") >= 10)))
      .orderBy("stage").collect()
    assert(out.map(_.getAs[String]("rule")).toSeq == Seq("r1", "r2"))
    assert(out(0).getAs[Long]("n_in") == 4L)
    assert(out(0).getAs[Long]("n_killed") == 2L)   // (5,5) and (null,15)
    assert(out(0).getAs[Long]("n_surviving") == 2L)
    assert(out(1).getAs[Long]("n_in") == 2L)
    assert(out(1).getAs[Long]("n_killed") == 1L)   // (15,5) — NOT (5,5) again
    assert(out(1).getAs[Long]("n_surviving") == 1L)
    assert(out(1).getAs[Double]("kill_rate") == 0.5)
  }

  test("filterFunnel on an EMPTY corpus: all-zero stages, conservation intact") {
    // sum over zero rows is NULL in SQL — the funnel must coalesce it
    // to 0 so an empty input degrades to an all-zero report instead of
    // NULL-poisoned arithmetic (n_killed = NULL - NULL)
    val empty = Seq.empty[(Option[Int], Option[Int])].toDF("a", "b")
    val out = Curation.filterFunnel(empty, Seq(
        "r1" -> (col("a") >= 10), "r2" -> (col("b") >= 10)))
      .orderBy("stage").collect()
    assert(out.map(_.getAs[String]("rule")).toSeq == Seq("r1", "r2"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_in") == 0L)
      assert(r.getAs[Long]("n_killed") == 0L)
      assert(r.getAs[Long]("n_surviving") == 0L)
      assert(r.getAs[Double]("kill_rate") == 0.0)
      // the conservation law the non-empty specs assert, at zero
      assert(r.getAs[Long]("n_in") ==
        r.getAs[Long]("n_killed") + r.getAs[Long]("n_surviving"))
    }
  }

  test("filterFunnel conserves counts and telescopes across stages") {
    val q = graft.operators.TextAnalysis.qualityFeatures(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    val out = Curation.filterFunnel(q, Seq(
        "min_words" -> (col("n_words") >= 20),
        "stopword_ratio" -> (col("stopword_ratio") >= 0.05),
        "mean_word_len" -> col("mean_word_len").between(3.0, 12.0)))
      .orderBy("stage").collect()
    assert(out(0).getAs[Long]("n_in") == q.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_in") ==
        r.getAs[Long]("n_killed") + r.getAs[Long]("n_surviving"))
    }
    out.sliding(2).foreach { case Array(prev, next) =>
      assert(next.getAs[Long]("n_in") == prev.getAs[Long]("n_surviving"))
    }
  }

  test("filterFunnel rejects duplicate rule names and empty rule lists") {
    val df = Seq(1).toDF("a")
    intercept[IllegalArgumentException] {
      Curation.filterFunnel(df, Seq("r" -> (col("a") > 0), "r" -> (col("a") > 1)))
    }
    intercept[IllegalArgumentException] {
      Curation.filterFunnel(df, Seq.empty)
    }
  }
}
