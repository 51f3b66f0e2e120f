package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{avg, col}
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qualityFeatures computes exact counts on a known string") {
    val df = Seq((1L, "The cat, the dog!")).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(df, "id", "text").collect().head
    assert(r.getAs[Int]("n_chars") == 17)
    assert(r.getAs[Int]("n_words") == 4)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-12)
    // "The" and "the" are stopwords (case-insensitive) → 2 of 4
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("upper_ratio") - 1.0 / 17) < 1e-12)
  }

  test("tokenCounts: BPE-ish segmentation splits words, digits, symbols") {
    val df = Seq((1L, "hello world42 x-y")).toDF("id", "text")
    val r = TextAnalysis.tokenCounts(df, "id", "text").collect().head
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | x | - | y
    assert(r.getAs[Int]("bpe_tokens") == 6)
  }

  test("bpeMergeTable: hand-computed merges with greedy re-segmentation") {
    // words: aaab×2, ab×1
    // r1: (a,a)=4 beats (a,b)=3 → aaab segments [aa,a,b] (greedy L-to-R)
    // r2: (a,b)=3 beats (aa,a)=2 → [aa,ab] / [ab]
    // r3: (aa,ab)=2
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("id", "text")
    val out = TextAnalysis.bpeMergeTable(docs, "text", numMerges = 3)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
    // a 4th round has no pairs left → loud failure, not a short table
    assertThrows[IllegalArgumentException] {
      TextAnalysis.bpeMergeTable(docs, "text", numMerges = 4).collect()
    }
  }

  test("bpeMergeTable: adjacent merges land exactly; ties break on (lhs, rhs)") {
    // "abab": (a,b)=2 > (b,a)=1; greedy merge must produce [ab, ab] so
    // round 2 finds (ab, ab) — a delimiter-sharing representation would
    // miss the second merge and emit (ab, a) instead
    val abab = Seq((1L, "abab")).toDF("id", "text")
    val out = TextAnalysis.bpeMergeTable(abab, "text", numMerges = 2)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)))
    // tie at freq 1 between (a,b) and (c,d) → lexicographically first
    val tie = Seq((1L, "cd ab")).toDF("id", "text")
    val first = TextAnalysis.bpeMergeTable(tie, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(first == (("a", "b")))
  }

  test("bpeSegment applies the learned table: hand-computed symbol counts") {
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("id", "text")
    // 3 merges → (a,a), (a,b), (aa,ab): aaab segments to [aaab], ab to [ab]
    val k3 = TextAnalysis.bpeSegment(docs, "id", "text", numMerges = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k3.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
    // 2 merges → aaab = [aa, ab] (2 symbols), ab = [ab] (1)
    val k2 = TextAnalysis.bpeSegment(docs, "id", "text", numMerges = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k2.toSeq == Seq((1L, 2L, 3L), (2L, 1L, 2L)))
  }

  test("langId prefers the language whose trigrams dominate") {
    val df = Seq(
      (1L, "the thing and the other thing of the kind"),
      (2L, "der dichter und die schrift sind schlicht und schoen")
    ).toDF("id", "text")
    val preds = TextAnalysis.langId(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
  }

  test("normalize: lowercase, email redaction, control strip, whitespace collapse") {
    import spark.implicits._
    val df = Seq(
      (1L, "Contact JOHN.doe+spam@Example.COM  now\t\nplease"),
      (2L, "no piihere   at all"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> now please")
    assert(out(2L) == "no pii here at all")
    assert(out(3L) == "")
  }

  test("vocabulary and bpePairCounts on a known corpus") {
    import spark.implicits._
    val df = Seq((1L, "ab AB abc"), (2L, "x yz")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(df, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(vocab.head == ("ab" -> 2L))
    assert(vocab.toMap == Map("ab" -> 2L, "abc" -> 1L, "x" -> 1L, "yz" -> 1L))
    val pairs = TextAnalysis.bpePairCounts(df, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "ab"×2 and "abc" contribute "ab"; "abc" adds "bc"; "yz" adds "yz";
    // single-char word "x" contributes nothing
    assert(pairs == Map("ab" -> 3L, "bc" -> 1L, "yz" -> 1L))
  }

  test("fingerprint: equal content equal hash, different content different hash") {
    val df = Seq((1L, "abc def"), (2L, "abc def"), (3L, "abc def ")).toDF("id", "text")
    val fps = TextAnalysis.fingerprint(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("repetitionSignals: duplicate fraction and top-bigram share by hand") {
    val df = Seq(
      (1L, "a a a a"),      // 1 distinct of 4 → dup .75; "a a"×3 of 3 → 1.0
      (2L, "x y z"),        // all distinct → dup 0; top bigram 1 of 2 → 0.5
      (3L, "solo")          // one word: no bigrams → 0.0
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((4, 0.75, 1.0)))
    assert(rows(2L) == ((3, 0.0, 0.5)))
    assert(rows(3L) == ((1, 0.0, 0.0)))
  }

  test("decontaminate flags only trigram overlap with the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a tale of the quick brown fox going home"), // shares 2 trigrams
      (2L, "completely different words entirely here")   // shares none
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shared trigrams: "the quick brown", "quick brown fox"
    assert(out == Map(1L -> 2L))
  }

  test("decontaminateBloom equals the exact join, at tight AND loose fpp") {
    // a corpus big enough that the bloom prefilter has real work to do:
    // 60 clean docs with disjoint vocabularies plus 2 planted overlaps
    val bench = Seq((100L, "the quick brown fox jumps over it")).toDF("doc_id", "text")
    val train = ((1 to 60).map(i =>
        (i.toLong, s"clean doc $i talks about topic$i only topic$i and t$i")) ++
      Seq((61L, "a tale of the quick brown fox going home"),
          (62L, "she saw the fox jumps over it yesterday")))
      .toDF("doc_id", "text")
    val exact = TextAnalysis.decontaminate(train, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet == Set(61L, 62L), s"fixture precondition: $exact")
    // tight fpp (the real configuration) and absurdly loose fpp (every
    // probe may pass → verify join does ALL the work) must both equal
    // the exact operator — FPs are verified away, FNs cannot exist
    for (fpp <- Seq(0.01, 0.9)) {
      val bloom = TextAnalysis.decontaminateBloom(
          train, bench, "doc_id", "text", 3, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bloom == exact, s"fpp=$fpp: $bloom != $exact")
    }
  }

  test("perplexityBuckets: hand-computed smoothed score incl. OOV mass") {
    val target = Seq((10L, "a a b")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.perplexityBuckets(corpus, target, "doc_id", "text")
      .collect().head
    // model: c(a)=2 c(b)=1, N=3, V=2, alpha=.5 → denom = 3 + .5*(2+1) = 4.5
    // p(a) = 2.5/4.5, p(c OOV) = 0.5/4.5
    val expected = (math.log(2.5 / 4.5) + math.log(0.5 / 4.5)) / 2
    assert(math.abs(r.getAs[Double]("avg_logprob") - expected) < 1e-6)
    assert(r.getAs[Long]("n_tokens") == 2L)
    // a single doc is its own head third
    assert(r.getAs[String]("bucket") == "head")
  }

  test("perplexityBuckets: 9 distinct scores split 3/3/3 by frequency rank") {
    // target word w_i appears i times → p(w_i) strictly increases with i;
    // doc i = the single token w_i → 9 strictly ordered scores
    val target = Seq.tabulate(9)(i => (100L + i,
      Seq.fill(i + 1)(s"w$i").mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq.tabulate(9)(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val buckets = TextAnalysis.perplexityBuckets(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    // highest-frequency words score best → docs 8,7,6 head; 5,4,3 middle
    assert((6L to 8L).forall(buckets(_) == "head"))
    assert((3L to 5L).forall(buckets(_) == "middle"))
    assert((0L to 2L).forall(buckets(_) == "tail"))
  }

  test("perplexityBuckets: a tie group straddling a boundary falls late") {
    val target = Seq((10L, "hi hi hi hi hi lo")).toDF("doc_id", "text")
    // d1 scores high; d2-d4 tie on the identical low score. n=4 →
    // head cutoff ceil(4/3)=2, middle cutoff ceil(8/3)=3; the tie
    // group's cumulative count is 4 > 3 → all three land in tail,
    // and middle is empty (score-homogeneous buckets, CCNet-style)
    val corpus = Seq((1L, "hi"), (2L, "lo"), (3L, "lo"), (4L, "lo"))
      .toDF("doc_id", "text")
    val buckets = TextAnalysis.perplexityBuckets(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    assert(buckets == Map(1L -> "head", 2L -> "tail", 3L -> "tail", 4L -> "tail"))
  }

  test("naiveBayesClassify: hand-computed smoothed scores and argmax") {
    val df = Seq(
      (1L, "A", "x x"), (2L, "B", "y y"), (3L, "A", "x y")
    ).toDF("id", "cls", "text")
    val out = TextAnalysis.naiveBayesClassify(df, "id", "text", "cls")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // model: A {x:3, y:1} tc=4, B {y:2} tc=2, V=2, priors 2/3 and 1/3
    // → p(x|A)=3.5/5, p(y|A)=1.5/5, p(x|B)=0.5/3, p(y|B)=2.5/3
    assert(out(1L)._1 == "A" && out(2L)._1 == "B" && out(3L)._1 == "A")
    val d3 = math.log(2.0 / 3) + math.log(3.5 / 5) + math.log(1.5 / 5)
    assert(math.abs(out(3L)._2 - d3) < 1e-6)
  }

  test("naiveBayesClassify: exact score ties break to the smaller class") {
    // fully symmetric corpus: both classes score every doc identically
    val df = Seq((1L, "b", "x"), (2L, "a", "x")).toDF("id", "cls", "text")
    val out = TextAnalysis.naiveBayesClassify(df, "id", "text", "cls")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "a"))
  }

  test("chunkPassages: overlap, truncated tail, full word coverage") {
    // 7 words, window 4, stride 2 → starts 0,2,4: the last window
    // truncates to 3 words and word 7 is still covered
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkPassages(df, "doc_id", "text", 4, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (0, 0, "w1 w2 w3 w4", 4),
      (1, 2, "w3 w4 w5 w6", 4),
      (2, 4, "w5 w6 w7", 3)))
  }

  test("chunkPassages: stride == window gives disjoint spans; short doc one chunk") {
    val df = Seq((1L, "a b c d e"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkPassages(df, "doc_id", "text", 2, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(out(1L) == Seq("a b", "c d", "e"))
    assert(out(2L) == Seq("solo"))
    assertThrows[IllegalArgumentException] {
      TextAnalysis.chunkPassages(df, "doc_id", "text", 2, 3)
    }
  }

  test("bm25Rank: hand-computed Okapi scores, absent-term docs dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a c"),      // dl=4, tf(a)=2
      (2L, "a a a a b b"),  // dl=6, tf(a)=4
      (3L, "c c d"),        // dl=3, tf(d)=1
      (4L, "e e e")         // no query term → absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(df, "doc_id", "text", Seq("a", "d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = 16.0 / 4
    def w(tf: Long, dl: Long, n: Long, dfq: Long): Double =
      math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out(1L) - w(2, 4, 4, 2)) < 1e-6)
    assert(math.abs(out(2L) - w(4, 6, 4, 2)) < 1e-6)
    assert(math.abs(out(3L) - w(1, 3, 4, 1)) < 1e-6)
    // k truncates by raw score desc, id asc
    val top1 = TextAnalysis.bm25Rank(df, "doc_id", "text", Seq("a", "d"), k = 1)
      .collect()
    assert(top1.length == 1 &&
      top1.head.getLong(0) == out.maxBy { case (id, s) => (s, -id) }._1)
  }

  test("charEntropy: hand-computed entropy, uniform and degenerate cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa"),   // degenerate: one symbol → H = 0
      (2L, "abab"),   // uniform over 2 symbols → H = ln 2
      (3L, "aab")     // 2/3, 1/3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L)._1 == 4L && out(2L)._2 == 2L)
    assert(math.abs(out(2L)._3 - math.log(2)) < 1e-6)
    val h3 = 2.0 / 3 * math.log(3.0 / 2) + 1.0 / 3 * math.log(3.0)
    assert(out(3L)._1 == 3L && out(3L)._2 == 2L)
    assert(math.abs(out(3L)._3 - h3) < 1e-6)
  }

  test("shardKlDrift: hand-computed KL against the pooled corpus") {
    import spark.implicits._
    // shard A: a a b  (P_A = a:2/3, b:1/3)   shard B: b c  (P_B = 1/2, 1/2)
    // corpus: a:2 b:2 c:1, total 5 (P_g = a:2/5, b:2/5, c:1/5)
    val df = Seq(("A", "a a b"), ("B", "b c")).toDF("source", "text")
    val out = TextAnalysis.shardKlDrift(df, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (2.0 / 5)) +
      1.0 / 3 * math.log((1.0 / 3) / (2.0 / 5))
    val klB = 1.0 / 2 * math.log((1.0 / 2) / (2.0 / 5)) +
      1.0 / 2 * math.log((1.0 / 2) / (1.0 / 5))
    assert(out("A")._1 == 3L && out("B")._1 == 2L)
    assert(math.abs(out("A")._2 - klA) < 1e-6)
    assert(math.abs(out("B")._2 - klB) < 1e-6)
    // KL is non-negative, and a single-shard corpus has zero drift
    out.values.foreach { case (_, kl) => assert(kl >= 0.0) }
    val solo = TextAnalysis.shardKlDrift(
      Seq(("A", "x y z x")).toDF("source", "text"), "source", "text")
      .collect()
    assert(solo.length == 1 && solo.head.getDouble(2) == 0.0)
  }

  test("sourceOverlap: per-source union of shingles, hand-computed Jaccard") {
    import spark.implicits._
    val d = Seq(
      ("A", "w1 w2 w3 w4"),  // A: {w1 w2 w3, w2 w3 w4}
      ("A", "w1 w2 w3"),     // dup shingle within A — counted once
      ("B", "w2 w3 w4 w5"),  // B: {w2 w3 w4, w3 w4 w5}
      ("C", "x y z")         // C: disjoint from both
    ).toDF("source", "text")
    val out = TextAnalysis.sourceOverlap(d, "source", "text", shingleN = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))))
      .toMap
    // only the overlapping pair appears; |A|=2, |B|=2, common=1 → 1/3
    assert(out.keySet == Set(("A", "B")))
    assert(out(("A", "B"))._1 == 1L)
    assert(math.abs(out(("A", "B"))._2 - 1.0 / 3.0) < 1e-12)
  }

  test("spanDecontaminate: excises only the contaminated span, keeps the rest") {
    import spark.implicits._
    // 30 words = 3 spans; the benchmark trigram sits wholly in span 1
    val words = (0 until 30).map {
      case 14 => "x"; case 15 => "y"; case 16 => "z"; case i => s"w$i"
    }
    val train = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((900L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.spanDecontaminate(train, bench, "doc_id", "text")
      .collect().head
    assert(out.getAs[Int]("n_spans") == 3 && out.getAs[Long]("n_kept") == 2)
    val expect = (words.take(10) ++ words.drop(20)).mkString(" ")
    assert(out.getAs[String]("clean_text") == expect)
    // pinned behavior: a trigram STRADDLING a span boundary flags
    // neither span (each span is shingled independently) — callers
    // needing cross-boundary hits overlap their spans
    val straddle = (0 until 20).map {
      case 9 => "x"; case 10 => "y"; case 11 => "z"; case i => s"w$i"
    }
    val out2 = TextAnalysis.spanDecontaminate(
      Seq((1L, straddle.mkString(" "))).toDF("doc_id", "text"),
      bench, "doc_id", "text").collect().head
    assert(out2.getAs[Long]("n_kept") == 2)
    // fully-contaminated doc → 0 spans kept, empty text
    val out3 = TextAnalysis.spanDecontaminate(
      Seq((1L, "x y z")).toDF("doc_id", "text"),
      bench, "doc_id", "text").collect().head
    assert(out3.getAs[Long]("n_kept") == 0L &&
      out3.getAs[String]("clean_text") == "")
  }

  test("ngramNovelty: dup scores 0, fresh 1, partial overlap its fraction") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d"),       // {a b c, b c d} — both first here: 1.0
      (2L, "a b c d"),       // verbatim dup of 1: 0.0
      (3L, "a b c x y z"),   // {a b c}(seen) + 3 fresh of 4: 0.75
      (4L, "hi there")       // < 3 words ⇒ one truncated shingle, fresh
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(d, "doc_id", "text", shingleN = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((4L, 3L, 0.75)))
    assert(out(4L) == ((1L, 1L, 1.0)))
  }

  test("tfidfSimilarPairs: identical docs hit cosine 1, maxPostings prunes hubs") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "hub zebra quark"),
      (2L, "hub zebra quark"),   // identical to 1: truncated cosine = 1
      (3L, "hub misc1 misc2"),
      (4L, "other stuff here")   // no top-term overlap with anyone
    ).toDF("doc_id", "text")
    val exact = TextAnalysis.tfidfSimilarPairs(docs, "doc_id", "text",
        topTerms = 5, minShared = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(exact.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $exact")
    assert(exact((1L, 2L))._1 == 3L)
    assert(math.abs(exact((1L, 2L))._2 - 1.0) < 1e-12,
      s"identical docs must score 1: ${exact((1L, 2L))}")
    // (1,3)/(2,3) share only the hub term
    assert(exact((1L, 3L))._1 == 1L && exact((2L, 3L))._1 == 1L)
    // the hub posting list (3 docs) exceeds a cap of 2: those
    // contributions vanish — (1,3)/(2,3) disappear entirely and (1,2)
    // drops to its 2 non-hub shared terms
    val capped = TextAnalysis.tfidfSimilarPairs(docs, "doc_id", "text",
        topTerms = 5, minShared = 1, maxPostings = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 2L), s"got $capped")
  }

  // ---- stupidBackoff -------------------------------------------------

  test("stupidBackoff: seen ratio and the 0.4·add-one floor on hand counts") {
    // train: uni a:2 b:2 c:1 → N=5 V=3; bigrams "a b":2, "b c":1
    val train = Seq((1L, "a b"), (2L, "a b c")).toDF("id", "text")
    val probe = Seq((10L, "a b x"), (11L, "solo")).toDF("id", "text")
    val out = TextAnalysis.stupidBackoff(train, probe, "id", "text").collect()
    // "solo" has no bigrams and is omitted
    assert(out.length == 1 && out.head.getAs[Long]("id") == 10L)
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") == 2L)
    // "a b" seen → ln(2/2)=0; "b x" unseen, x OOV → ln(0.4·(0+1)/(5+3))
    assert(r.getAs[Double]("backoff_rate") == 0.5)
    val expected = BigDecimal((0.0 + math.log(0.4 / 8.0)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("avg_logscore") - expected) < 1e-9,
      s"got ${r.getAs[Double]("avg_logscore")}, want $expected")
  }

  test("stupidBackoff: in-vocab unseen bigram uses the FOLLOWING word's count") {
    // train: uni a:1 b:1 → N=2 V=2; only bigram "a b"
    val train = Seq((1L, "a b")).toDF("id", "text")
    // probe bigram "b a": unseen, but both words in vocab → floor uses
    // f(a)=1: ln(0.4·(1+1)/(2+2)) = ln(0.2)
    val probe = Seq((10L, "b a")).toDF("id", "text")
    val r = TextAnalysis.stupidBackoff(train, probe, "id", "text").collect().head
    val expected = BigDecimal(math.log(0.4 * 2.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("backoff_rate") == 1.0)
    assert(math.abs(r.getAs[Double]("avg_logscore") - expected) < 1e-9)
  }

  test("stupidBackoff: only out-of-train-corpus docs ever back off") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val br = TextAnalysis.stupidBackoff(
        d.filter(col("lang") === "en"), d, "doc_id", "text")
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(avg("backoff_rate").as("br"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the en slice IS the train corpus, so every en bigram is seen and
    // its backoff rate is EXACTLY zero; the synthetic languages share a
    // word pool, so the non-en direction is small but strictly positive
    assert(br(true) == 0.0, s"en backoff ${br(true)}")
    assert(br(false) > 0.0,
      s"non-en docs must back off somewhere: ${br(false)}")
  }
}
