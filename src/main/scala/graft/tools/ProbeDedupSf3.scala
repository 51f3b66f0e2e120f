package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 probe (VERDICT r14 #5): push the dedup family past its
  * fixed-overhead regime. c2 measured FLAT from sf0.1→sf1.0
  * (2.65→2.79 s) because 50 k docs still amortizes mostly constants;
  * this probe adds an sf3 slice (~150 k docs, same disjoint-copy
  * construction as the scale-decade fixture — within-copy similarity
  * preserved, cross-copy shingle sets disjoint, so TRUE dup pairs
  * scale ×k) and times the banded dedup members at sf1 and sf3:
  *
  *   - c2 (MinHash+LSH banded pipeline) and c3 (SimHash band-blocked)
  *     run as registered;
  *   - c4 runs via the PREFIX-FILTERED exact-Jaccard variant — the
  *     registered plain inverted index is the deliberate ≤5 k-doc
  *     choice (2.6 s vs 6.0 s there) and was already measured 3×
  *     SLOWER than prefix at 50 k docs (218 s vs 76 s, PLANS.md r8);
  *     at 150 k docs it is the known-losing path, so the scale probe
  *     measures the variant a large corpus would deploy.
  *
  * For each (query, scale): wall time min-of-2 after one warmup, the
  * OUTPUT pair count (expected ≈×3 from sf1→sf3 — the fixture
  * construction check: a skew/hub term would also show as superlinear
  * pairs), and the candidate-stage row count for c2 (bucket-join
  * candidates before verification) so candidate growth and verify
  * growth separate. Results → stdout table; recorded in PLANS.md.
  *
  * Usage: sbt "runMain graft.tools.ProbeDedupSf3 [baseSfDir] [workRoot]"
  */
object ProbeDedupSf3 {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse("/root/repo/scale_fixtures")
    val spark = graft.GraftSession.build("graft-dedup-sf3")
    import graft.operators.Dedup

    val scales = Seq(("sf1", s"$root/sf10docs", 10), ("sf3", s"$root/sf30docs", 30))
    scales.foreach { case (tag, dir, k) =>
      if (ProbeScaleDecade.ensureFixture(spark, base, dir, k, docsOnly = true))
        println(s"[sf3] generated $tag at $dir")
      else println(s"[sf3] reusing $tag at $dir")
    }

    def docs(dir: String) = graft.Tables.load(spark, dir, "documents")

    val members: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "c2_minhash" -> { dir =>
        Dedup.minHashDupPairs(docs(dir), "doc_id", "text",
          numHashes = 64, bands = 32, shingleN = 3, threshold = 0.5)
      },
      "c3_simhash" -> { dir =>
        import graft.functions.TextFunctions.{fingerprint64, mix64}
        Dedup.simHashDupPairs(docs(dir), "doc_id", "text", maxHamming = 3,
          wordHash = w => mix64(fingerprint64(w)))
      },
      "c4_prefix" -> { dir =>
        Dedup.ngramJaccardPairsPrefix(docs(dir), "doc_id", "text",
          shingleN = 3, threshold = 0.5)
      })

    // c2's CANDIDATE stage alone (banded signatures → single-exchange
    // self-pairs, before verification): timing+rows here split
    // candidate growth from verify growth across the scales
    scales.foreach { case (tag, dir, _) =>
      def cand() = {
        val t0 = System.nanoTime()
        val sig = Dedup.minHashSignatures(docs(dir), "doc_id", "text", 64, 3)
        val banded = Dedup.lshBands(sig, "doc_id", 32, 2)
        val n = graft.plans.SelfPairsByKey
          .selfPairsByKey(banded, Seq("band_idx", "band_hash"), "doc_id")
          .distinct().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      cand()
      val (ta, na) = cand(); val (tb, nb) = cand()
      require(na == nb)
      spark.catalog.clearCache()
      println(f"[sf3] c2_candidates $tag%-4s ${math.min(ta, tb)}%8.2f s  rows=$na%d")
    }

    val out = collection.mutable.ArrayBuffer[(String, String, Double, Long)]()
    members.foreach { case (name, f) =>
      scales.foreach { case (tag, dir, _) =>
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val df = f(dir)
          val n = df.count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.operators.Ckpt.releaseResult(df)
          (dt, n)
        }
        once() // warmup (JIT + first-touch faults)
        val (t1, n1) = once(); val (t2, n2) = once()
        require(n1 == n2, s"$name nondeterministic rows: $n1 vs $n2")
        graft.operators.Ckpt.releaseIssued(spark)
        spark.catalog.clearCache()
        out += ((name, tag, math.min(t1, t2), n1))
        println(f"[sf3] $name%-12s $tag%-4s ${math.min(t1, t2)}%8.2f s  rows=$n1%d")
      }
    }
    println(f"${"member"}%-12s ${"sf1 s"}%8s ${"sf3 s"}%8s ${"t-ratio"}%8s ${"sf1 rows"}%9s ${"sf3 rows"}%9s ${"row-ratio"}%9s")
    members.foreach { case (name, _) =>
      val Seq((_, _, t1, n1), (_, _, t3, n3)) = out.filter(_._1 == name).toSeq
      println(f"$name%-12s $t1%8.2f $t3%8.2f ${t3 / t1}%8.2f $n1%9d $n3%9d ${n3.toDouble / n1}%9.2f")
    }
    spark.stop()
  }
}
