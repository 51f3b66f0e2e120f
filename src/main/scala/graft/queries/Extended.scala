package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Generator, SchemaTools}
import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Streaming, ETL-parity, and multimodal queries.
  *
  * The two `s*` entries execute REAL Structured Streaming queries
  * (file-source replay → windowed agg → memory sink, run to completion)
  * and are checked against DuckDB batch oracles — streaming results must
  * equal their batch equivalents on bounded input.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  /** Per-process work dir for replay inputs/checkpoints, WIPED on entry:
    * bench reps reuse one path instead of leaking a replay corpus per
    * invocation, and the `Tables.processWorkDir` shutdown hook removes
    * the root at JVM exit. Wiping also guarantees a fresh streaming
    * checkpoint — a stale one would silently resume, not replay. */
  private def freshWork(name: String): String = {
    val d = s"${Tables.processWorkDir}/$name"
    Tables.deleteRecursively(d)
    d
  }

  val queries: Map[String, Q] = Map(

    // tumbling 1 h windows × event_type via Structured Streaming
    "s1_stream_tumble" -> { (s, dir) =>
      Streams.runToCompletion(s,
          Streams.tumblingCounts(Streams.eventStream(s, dir)), "s1_tumble")
        .orderBy("window_start", "event_type")
    },

    // 30-minute-gap session windows per user via Structured Streaming
    "s2_stream_session" -> { (s, dir) =>
      Streams.runToCompletion(s,
          Streams.sessionCounts(Streams.eventStream(s, dir)), "s2_session")
        .orderBy("user_id", "session_start")
    },

    // custom stateful streaming (flatMapGroupsWithState): per-user
    // running totals — a REAL stateful streaming run, oracle-checked
    // against the batch cumulative-window SQL
    "s3_stream_stateful" -> { (s, dir) =>
      // totals rounded: DuckDB windowed SUM uses segment-tree (pairwise)
      // addition whose last bits differ from sequential accumulation
      graft.streaming.Stateful.runToCompletion(s, dir, "s3_stateful")
        .withColumn("total_value", round(col("total_value"), 4))
        .orderBy("user_id", "event_id")
    },

    // streaming deduplication: a doubled replay of the event stream
    // deduped on event_id inside the stream (dropDuplicates + watermark
    // bounds the dedup state by event time) must equal the distinct set
    "s4_stream_dedup" -> { (s, dir) =>
      val ev = Streams.eventStream(s, dir)
      val doubled = ev.union(ev)
      // the event-time column must be part of the dedup key for the
      // watermark to evict dedup state — event_id alone would keep one
      // state entry per id forever on an unbounded stream
      val deduped = doubled
        .withWatermark("ts", "2 hours")
        .dropDuplicates("event_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      Streams.runToCompletion(s, deduped, "s4_dedup").orderBy("event_type")
    },

    // dropDuplicatesWithinWatermark (Spark 3.5+/4): the dedup KEY no
    // longer needs the event-time column — state is evicted when the
    // watermark passes a key's first-seen event time, which is THE api
    // for at-least-once sources whose retries carry near-but-unequal
    // timestamps (s4's key must include ts and so would MISS such
    // retries; the within-watermark variant collapses them —
    // StreamingSpec pins exactly that divergence). On the doubled
    // exact-copy replay both dedup, so s10 shares s4's distinct oracle.
    "s10_dedup_within_wm" -> { (s, dir) =>
      val ev = Streams.eventStream(s, dir)
      val doubled = ev.union(ev)
      val deduped = doubled
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      Streams.runToCompletion(s, deduped, "s10_dedup_wm").orderBy("event_type")
    },

    // stream-stream LEFT SEMI join: clicks that converted within 1 h,
    // each emitted once on first match — no watermark-cutoff term in
    // the oracle (matched rows emit immediately; see clickPurchaseSemiJoin)
    "s11_stream_semi_join" -> { (s, dir) =>
      Streams.runToCompletionAppend(s,
          Streams.clickPurchaseSemiJoin(Streams.eventStream(s, dir)), "s11_semi")
        .orderBy("user_id", "click_id")
    },

    // watermarked stream-stream inner join (clicks ⋈ purchases within
    // 1 h, same user) — real Structured Streaming, equal to the batch
    // self-join oracle on bounded input
    "s5_stream_join" -> { (s, dir) =>
      Streams.runToCompletionAppend(s,
          Streams.clickPurchaseJoin(Streams.eventStream(s, dir)), "s5_join")
        .orderBy("user_id", "click_id", "purchase_id")
    },

    // streaming ingest dedup against the historical corpus: the "new
    // crawl" (doc_id % 7 == 0) replayed as a 4-micro-batch stream,
    // anti-joined against the static corpus fingerprint relation and
    // deduped within the stream across batch boundaries — the streaming
    // composition of c31, sharing its batch oracle (the doc_id-ordered
    // contiguous replay makes the first-seen winner the min-doc_id
    // winner; see Streams.writeOrderedReplay). ingest_ts is synthesized
    // from doc_id (1 s apart — arrival time in production); the default
    // watermark/TTL keep all state resident across this bounded replay,
    // so the result equals the global-dedup batch oracle.
    "s12_corpus_dedup" -> { (s, dir) =>
      val d = graft.Tables.load(s, dir, "documents")
      val work = freshWork("s12")
      val schema = Streams.writeOrderedReplay(
        d.filter(col("doc_id") % 7 === 0)
          .select("doc_id", "source", "n_chars", "text")
          .withColumn("ingest_ts",
            timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000L)),
        "doc_id", 4, s"$work/in")
      // static side DELIBERATELY uncached (the one exception to the
      // s17 discipline): it is a pure scan+project — no shuffle, no
      // aggregation — so the per-micro-batch replan costs one pruned
      // parquet scan (measured r10: s12 batch_sum 2.5 s total across 4
      // batches), and it carries full text for the exact anti-join
      // verify, which is exactly what one must NOT pin in executor
      // memory at corpus scale. The 100 TB shape is the persisted
      // fingerprint-only store (c34's incremental index), not a cache.
      val corpusSeen = d.filter(col("doc_id") % 7 =!= 0)
        .select(xxhash64(col("text")).as("_h"), col("text").as("_seen_text"))
      val out = Streams.runToCompletionAppend(s,
          Streams.corpusIncrementalDedup(s,
            Streams.replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1),
            corpusSeen),
          "s12_corpus_dedup")
        .orderBy("doc_id")
      // the memory sink holds the rows; the replay chunks are dead weight
      graft.Tables.deleteRecursively(work)
      out
    },

    // streaming ANN index ingest: the freshness loop on top of c68 —
    // train PQ once on the base corpus slice, persist base codes, then
    // replay the "new" slice (vec_id % 5 == 0) as a 4-micro-batch
    // stream whose batches are encoded with the FROZEN model and
    // appended to the persisted codes relation via foreachBatch. The
    // existing corpus is never re-encoded; serving reloads model +
    // codes and answers exactly (unbounded rerank), so the result
    // shares the brute-force kNN oracle over the FULL embeddings
    // table — any batch-boundary or append artifact would hash-mismatch
    "s13_stream_ann_ingest" -> { (s, dir) =>
      import graft.operators.{AnnIndex, Similarity}
      val e = graft.Tables.load(s, dir, "embeddings")
      val (dim, m, ksub) = (64, 8, 16)
      val base = e.filter(col("vec_id") % 5 =!= 0)
      val fresh = e.filter(col("vec_id") % 5 === 0).select("vec_id", "embedding")
      val codebooks = Similarity.pqTrain(base, "embedding", dim, m, ksub,
        seed = 7L, trainFraction = 0.25)
      val root = freshWork("s13")
      AnnIndex.save(s, root, codebooks,
        Similarity.pqEncode(base, "vec_id", "embedding", codebooks, dim))
      val schema = Streams.writeOrderedReplay(fresh, "vec_id", 4, s"$root/replay")
      AnnIndex.ingestStream(s,
        Streams.replayStream(s, s"$root/replay", schema, maxFilesPerTrigger = 1),
        root, Similarity.pqEncode(_, "vec_id", "embedding", codebooks, dim))
      val served = Similarity.pqSearch(AnnIndex.loadCodes(s, root),
          AnnIndex.loadCodebooks(s, root), e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5, dim, ksub, rerank = Int.MaxValue)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
        // materialize (lineage truncated) so the temp index can go away;
        // through the tracked conf-aware cut (round 14, was Ckpt.local)
        // so the result-backing storage is released by
        // Ckpt.releaseResult/releaseIssued once the caller consumes the
        // result, and the one-conf-line durable posture covers it too
        .transform(graft.operators.Ckpt.cut)
      graft.Tables.deleteRecursively(root)
      served
    },

    // streaming rate anomaly: per-window volume z-scored in-stream
    // against the batch-fit baseline mean/σ (passed as literals — in
    // production, fit on history), equal to the batch c88 on bounded
    // replay, sharing its oracle verbatim
    "s18_stream_anomaly" -> { (s, dir) =>
      val st = Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .agg(avg(col("n")).as("mu"), stddev_pop(col("n")).as("sd"))
        .collect()(0)
      Streams.runToCompletion(s,
          Streams.windowRateAnomaly(Streams.eventStream(s, dir),
            st.getDouble(0), st.getDouble(1)),
          "s18_anomaly")
        .orderBy("window_start")
    },

    // streaming leaderboard: tumbling counts aggregate IN the stream
    // (s1 machinery, watermark-bounded state); the top-3-per-window rank
    // is a batch post-pass on the completed sink — append-mode streaming
    // aggregates cannot host window functions, so ranking at the serving
    // layer is the real-world shape. Ties break on event_type for a
    // total order
    "s19_stream_topk" -> { (s, dir) =>
      val counts = Streams.runToCompletion(s,
        Streams.tumblingCounts(Streams.eventStream(s, dir)), "s19_topk")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("window_start"))
        .orderBy(desc("n"), asc("event_type"))
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    },

    // streaming drift monitor: the held-out slice (doc_id % 29 == 0)
    // replayed as a stream, each window's tokens scored -ln p under the
    // static train-corpus LM (add-one smoothed) — c82 at ingest, equal
    // to the batch windowed average on bounded input
    "s17_stream_drift" -> { (s, dir) =>
      val d = graft.Tables.load(s, dir, "documents")
      val trainToks = d.filter(col("doc_id") % 29 =!= 0)
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      // STATIC-SIDE DISCIPLINE: a stream-static join re-evaluates the
      // static plan EVERY micro-batch, so the corpus-sized
      // tokenize+aggregate below must be computed once and pinned —
      // uncached, the 4-chunk replay paid the full train-corpus scan
      // 4× (measured round 9: 33.3 s of batch time vs ~4 s cached).
      // The nvRow collect doubles as the cache materializer; per-batch
      // cost is then a scan of the vocab-sized in-memory relation. At
      // 100 TB the same relation is written to parquet once (the s12
      // pattern) — either way, NEVER a per-trigger corpus scan.
      val freqs = trainToks.groupBy("token").agg(count(lit(1)).as("_f"))
        .cache()
      val nvRow = freqs.agg(sum("_f").as("_n"), count(lit(1)).as("_v"))
        .collect()(0)
      val denom = (nvRow.getLong(0) + nvRow.getLong(1)).toDouble
      val probs = freqs.select(col("token"),
        log((col("_f") + lit(1.0)) / lit(denom)).as("_lp"))
      val work = freshWork("s17")
      val schema = Streams.writeOrderedReplay(
        d.filter(col("doc_id") % 29 === 0)
          .select("doc_id", "text")
          // 300 s per doc: the sparse held-out ids still span dozens of
          // 1 h windows, so the windowed aggregation is exercised
          .withColumn("ingest_ts",
            timestamp_millis(lit(1700000000000L) + col("doc_id") * 300000L)),
        "doc_id", 4, s"$work/in")
      val out = try Streams.runToCompletion(s,
          Streams.windowTokenDrift(
            Streams.replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1),
            probs, unkLp = math.log(1.0 / denom)),
          "s17_drift")
        .orderBy("window_start")
      finally freqs.unpersist()
      // the memory sink holds the rows; the replay chunks are dead weight
      graft.Tables.deleteRecursively(work)
      out
    },

    // windowed approx-distinct users via the mergeable HLL sketch in a
    // real streaming aggregation (rows-only — sketch estimates have no
    // DuckDB-equal value; ≤5% error vs the exact per-window distinct is
    // asserted in ApproxSpec)
    "s16_stream_hll" -> { (s, dir) =>
      Streams.runToCompletion(s,
          Streams.windowApproxUsers(Streams.eventStream(s, dir)), "s16_hll")
        .orderBy("window_start")
    },

    // quality-gated streaming ingest: the crawl replayed as a
    // 4-micro-batch stream (ingest_ts synthesized 1 s apart from
    // doc_id, the s12 timeline), gated on word count BEFORE the
    // stateful windowed aggregation — per (1 h window, source) counts
    // of the survivors, equal to the batch filter+group oracle on
    // bounded input
    "s14_stream_quality_gate" -> { (s, dir) =>
      val d = graft.Tables.load(s, dir, "documents")
      val work = freshWork("s14")
      val schema = Streams.writeOrderedReplay(
        d.select("doc_id", "source", "n_chars", "text")
          .withColumn("ingest_ts",
            timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000L)),
        "doc_id", 4, s"$work/in")
      val out = Streams.runToCompletion(s,
          Streams.qualityGateCounts(
            Streams.replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1)),
          "s14_quality_gate")
        .orderBy("window_start", "source")
      // the memory sink holds the rows; the replay chunks are dead weight
      graft.Tables.deleteRecursively(work)
      out
    },

    // ingest-time benchmark decontamination: the c77 detection stage as
    // a stream-static join — training docs replayed as a 4-micro-batch
    // stream, windows matched against the static benchmark window
    // relation, per-doc contaminated-window counts equal to the batch
    // join oracle on bounded input
    "s15_stream_decontam" -> { (s, dir) =>
      val d = graft.Tables.load(s, dir, "documents")
      // static-side discipline (see s17): the benchmark-window relation
      // is an explode+distinct — a real shuffle — and a stream-static
      // join would otherwise recompute it per micro-batch (4× here).
      // Cache and pin it once before the stream starts.
      val benchWins = d.filter(col("doc_id") % 29 === 0)
        .select(explode(graft.functions.ChunkFunctions.char_ngrams(
          col("text"), 30, lowercase = false)).as("_w"))
        .select(xxhash64(col("_w")).as("_h"), col("_w").as("_bwin"))
        .distinct()
        .cache()
      benchWins.count() // materialize before wiring the stream
      val work = freshWork("s15")
      val schema = Streams.writeOrderedReplay(
        d.filter(col("doc_id") % 29 =!= 0)
          .select("doc_id", "text")
          .withColumn("ingest_ts",
            timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000L)),
        "doc_id", 4, s"$work/in")
      val out = try Streams.runToCompletion(s,
          Streams.ingestDecontam(
            Streams.replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1),
            benchWins, windowChars = 30),
          "s15_decontam")
        .orderBy("doc_id")
      finally benchWins.unpersist()
      // the memory sink holds the rows; the replay chunks are dead weight
      graft.Tables.deleteRecursively(work)
      out
    },

    // stream-static join: the event stream enriched against the static
    // customer dimension mid-stream, then aggregated — the standard
    // streaming-enrichment shape (static side re-read per micro-batch)
    "s6_stream_static_join" -> { (s, dir) =>
      val ev = Streams.eventStream(s, dir)
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      Streams.runToCompletion(s, joined, "s6_static").orderBy("c_mktsegment")
    },

    // SCD2 temporal enrichment at ingest: each event joined to the
    // slowly-changing dimension row VALID AT EVENT TIME (q84's validity
    // intervals derived from orders — half-open [from, next-from), so an
    // event matches at most one row), then aggregated. The non-equi
    // stream-static join broadcasts the interval dimension per
    // micro-batch; events before a customer's first interval (or with no
    // dimension rows at all) keep a '(none)' bucket via left_outer —
    // "what priority tier was this customer in when the event happened"
    "s20_scd2_enrich" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("valid_from").asc, col("o_orderkey").asc)
      // static-side discipline (see s17): deriving the validity
      // intervals costs a shuffle+sort over orders (the lead window) —
      // cache the finished dimension so the per-micro-batch broadcast
      // rebuilds from the vocab-sized in-memory relation, not from a
      // fresh orders scan+sort
      val dim = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("valid_from"),
          col("o_orderpriority").as("dim_prio"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .cache()
      dim.count() // materialize before wiring the stream
      val ev = Streams.eventStream(s, dir)
      val joined = Streams.scd2JoinAtEventTime(ev, dim, "o_custkey")
        .groupBy(coalesce(col("dim_prio"), lit("(none)")).as("prio"))
        .agg(count(lit(1)).as("n"))
      try Streams.runToCompletion(s, joined, "s20_scd2").orderBy("prio")
      finally dim.unpersist()
    },

    // per-window value percentiles in the stream — the latency-SLA
    // readout (p50/p95 per hour) every ops pipeline keeps. EXACT
    // percentiles hold each window's values in state until the
    // watermark retires it — fine for bounded windows, and the reason
    // the q96 percentile_approx sketch (mergeable, constant state) is
    // the corpus-scale variant; exact is used here precisely because it
    // is DuckDB-checkable
    "s21_stream_percentile" -> { (s, dir) =>
      val agged = Streams.eventStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.95)).as("p95"),
          count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
          round(col("p50"), 6).as("p50"), round(col("p95"), 6).as("p95"),
          col("n"))
      Streams.runToCompletion(s, agged, "s21_pct").orderBy("window_start")
    },

    // Kafka-shaped ingest minus the broker (no broker exists in this
    // environment; the connector swap is readStream.format only): each
    // event rides as an OPAQUE Avro binary payload — the q115 wire
    // codec — decoded IN-STREAM, then watermarked and windowed exactly
    // like s1, whose oracle it shares verbatim: streaming/batch
    // identity must survive the wire hop
    "s23_avro_stream" -> { (s, dir) =>
      import graft.functions.AvroWire.{avroSchemaFor, from_avro_wire, to_avro_wire}
      val work = freshWork("s23")
      val ev = Tables.load(s, dir, "events")
      val payload = struct(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      val schemaJson = avroSchemaFor(
        ev.select(payload.as("r")).schema("r").dataType)
      val schema = Streams.writeOrderedReplay(
        ev.select(unix_micros(col("ts")).as("us"),
          to_avro_wire(payload).as("wire")),
        "us", 4, s"$work/in")
      val decoded = Streams
        .replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1)
        .select(from_avro_wire(col("wire"), schemaJson).as("r"))
        .select("r.ts", "r.event_type")
      val agged = decoded
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"))
      Streams.runToCompletion(s, agged, "s23_avro")
        .orderBy("window_start", "event_type")
    },

    // streaming CDC APPLY: the event log replayed as an ordered change
    // stream (click = delete tombstone, anything else = upsert of the
    // user's latest value), merged per micro-batch into a keyed mirror
    // via foreachBatch — the ingest half of the CDC loop (q109 extract,
    // q63 batch apply). The mirror after the last batch must equal the
    // batch latest-change-per-key relation
    "s22_cdc_apply" -> { (s, dir) =>
      val work = freshWork("s22")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "click", "delete")
            .otherwise("upsert").as("op"),
          col("value"))
        .withColumn("us", unix_micros(col("ts")))
      val schema = Streams.writeOrderedReplay(ev, "us", 4, s"$work/in")
      Streams.cdcApply(s,
          Streams.replayStream(s, s"$work/in", schema, maxFilesPerTrigger = 1),
          "user_id", "ts", "event_id", "op", "value", s"$work/state")
        .withColumnRenamed("value", "last_value")
        .withColumnRenamed("ts", "last_ts")
        .orderBy("user_id")
    },

    // sliding (overlapping) windows via Structured Streaming — the
    // streaming counterpart of the batch q70, sharing its oracle
    "s7_stream_sliding" -> { (s, dir) =>
      Streams.runToCompletion(s,
          Streams.slidingCounts(Streams.eventStream(s, dir)), "s7_sliding")
        .orderBy("window_start", "event_type")
    },

    // stream-stream LEFT OUTER join: matched rows emit like s5; clicks
    // with no purchase emit null-augmented rows once the watermark
    // passes their 1 h match horizon (clicks still inside the horizon at
    // end-of-stream stay in state — the oracle carries the same cutoff)
    "s8_stream_outer_join" -> { (s, dir) =>
      Streams.runToCompletionAppend(s,
          Streams.clickPurchaseLeftJoin(Streams.eventStream(s, dir)), "s8_outer")
        .orderBy("user_id", "click_id", "purchase_id")
    },

    // the same running totals on Spark 4's transformWithState (typed
    // named state + RocksDB provider) — shares s3's oracle: two
    // different stateful APIs, one pinned semantics
    "s9_stream_tws" -> { (s, dir) =>
      graft.streaming.Stateful.runTwsToCompletion(s, dir, "s9_tws")
        .withColumn("total_value", round(col("total_value"), 4))
        .orderBy("user_id", "event_id")
    },

    // deterministic seeded generator (reference `import` entry point)
    "e1_generator" -> { (s, _) =>
      Generator.addresses(s, 10000L).orderBy("id")
    },

    // the reference demo job (addrx): generate → project → filter →
    // uppercase-normalize (ClassMapMapper semantics)
    "e2_etl_demo" -> { (s, _) =>
      SchemaTools.normalizeUppercase(
        Generator.addresses(s, 20000L)
          .select("id", "street_address", "city", "state", "postal_code", "country")
          .filter(col("id") < 13422))
        .orderBy("ID")
    },

    // multimodal: binary payload + metadata → mapPartitions feature
    // extraction (images REALLY decoded via javax.imageio, audio REALLY
    // decoded via javax.sound.sampled, video REALLY decoded as
    // MJPEG/AVI frames) → per-mime aggregate over decoded dimensions
    "m1_multimodal_features" -> { (s, dir) =>
      val feats = Multimodal.extractFeatures(s,
        Multimodal.attachBinaryCached(s, dir))
      feats.groupBy("mime")
        .agg(count(lit(1)).as("n_docs"),
             round(avg(element_at(col("features"), 1)), 6).as("avg_bin0"),
             min(size(col("features"))).as("feat_dim"),
             min(col("width")).as("min_w"),
             max(col("width")).as("max_w"),
             max(col("height")).as("max_h"))
        .orderBy("mime")
    },

    // scene-cut detection: per video, consecutive-frame luma-histogram
    // L1 deltas thresholded into shot boundaries — the clip splitter a
    // video pipeline runs before per-clip dedup/captioning. Rows-only
    // (no SQL engine decodes AVI); the boundary arithmetic is
    // value-pinned in MultimodalSpec with planted two-scene videos
    // (identical frames score exactly 0, the planted cut scores > 0)
    "m8_scene_cuts" -> { (s, dir) =>
      Multimodal.sceneCutStats(
          Multimodal.attachBinaryCached(s, dir),
          threshold = 0.2)
        .select(col("doc_id"), col("n_frames"), col("n_cuts"),
          round(col("max_delta"), 6).as("max_delta"),
          round(col("mean_delta"), 6).as("mean_delta"))
        .orderBy("doc_id")
    },

    // audio quality gate: per clip peak / RMS-dBFS / clipped ratio /
    // silence ratio — the filter an audio pipeline runs before paying
    // for transcription. Rows-only (no SQL engine decodes WAV); the
    // arithmetic is value-pinned in MultimodalSpec on planted silent,
    // full-scale-square, and known-amplitude-sine clips
    "m9_audio_quality" -> { (s, dir) =>
      Multimodal.audioQualityStats(
          Multimodal.attachBinaryCached(s, dir))
        .select(col("doc_id"), col("n_samples"), col("duration_ms"),
          round(col("peak"), 6).as("peak"),
          round(col("rms_dbfs"), 6).as("rms_dbfs"),
          round(col("clip_ratio"), 6).as("clip_ratio"),
          round(col("silence_ratio"), 6).as("silence_ratio"))
        .orderBy("doc_id")
    },

    // image quality gate: per image dims / aspect / mean luma /
    // contrast (luma std) / histogram entropy — the filter an image
    // pipeline runs before paying for captioning. Rows-only (no SQL
    // engine decodes JPEG/PNG); arithmetic value-pinned in
    // MultimodalSpec on lossless planted PNGs
    // ViT-style patch grid: one row per non-overlapping 8×8 patch of
    // every decoded image (row-major index, grid coords, per-patch mean
    // luma) — the patch-embedding prep relation a vision tokenizer
    // consumes; 8 px because the fixture draws 8-31 px images, so every
    // image yields 1-9 patches and edge remainders drop (the ViT
    // convention; production resizes to a patch multiple first).
    // Rows-only: no SQL engine decodes PNG/JPEG
    "m12_image_patches" -> { (s, dir) =>
      Multimodal.imagePatches(Multimodal.attachBinaryCached(s, dir),
          patchSize = 8)
        .select(col("doc_id"), col("patch_idx"), col("px"), col("py"),
          round(col("mean_luma"), 6).as("mean_luma"))
        .orderBy("doc_id", "patch_idx")
    },

    "m10_image_quality" -> { (s, dir) =>
      Multimodal.imageQualityStats(
          Multimodal.attachBinaryCached(s, dir))
        .select(col("doc_id"), col("width"), col("height"),
          round(col("aspect"), 6).as("aspect"),
          round(col("mean_luma"), 6).as("mean_luma"),
          round(col("std_luma"), 6).as("std_luma"),
          round(col("entropy_bits"), 6).as("entropy_bits"))
        .orderBy("doc_id")
    },

    // within-video frame redundancy: distinct frames by aHash vs total —
    // the static-scene detector billing a slideshow as its unique
    // content, not its frame count. Rows-only (no SQL engine decodes
    // AVI); planted-slideshow arithmetic pinned in MultimodalSpec
    "m11_frame_redundancy" -> { (s, dir) =>
      Multimodal.frameRedundancy(
          Multimodal.attachBinaryCached(s, dir))
        .select(col("doc_id"), col("n_frames"), col("n_distinct"),
          round(col("redundancy"), 6).as("redundancy"))
        .orderBy("doc_id")
    },

    // REAL video frame sampling: MJPEG/AVI payloads decode to frames,
    // 4 evenly-spaced frames re-encode as PNG rows per video
    "m2_frame_sample" -> { (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.attachBinaryCached(s, dir), n = 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
             min(col("width")).as("frame_w"),
             min(col("height")).as("frame_h"),
             sum(length(col("frame_payload"))).as("sampled_bytes"))
        .orderBy("doc_id")
    },

    // perceptual image hashing: per-image 64-bit aHash (rows-only —
    // DuckDB cannot decode JPEG/PNG; the hamming near-dup pair join is
    // value-pinned in MultimodalSpec with planted re-encodes)
    "m3_image_phash" -> { (s, dir) =>
      Multimodal.imageHashes(
          Multimodal.attachBinaryCached(s, dir))
        .orderBy("doc_id")
    },

    // audio fingerprinting: per-clip 64-bit autocorrelation-sign
    // signature + RMS/peak quality scalars from REAL WAV decode
    // (rows-only — DuckDB cannot decode WAV; gain-invariance, noise
    // robustness, and the hamming near-dup join are value-pinned in
    // MultimodalSpec)
    "m4_audio_fingerprint" -> { (s, dir) =>
      Multimodal.audioFingerprints(
          Multimodal.attachBinaryCached(s, dir))
        .orderBy("doc_id")
    },

    // decode-health scan: per mime, how many payloads actually decode
    // with the real decoder — the corrupt-file detector run before
    // paying feature extraction (rows-only — DuckDB cannot decode;
    // corrupt-payload counting is value-pinned in MultimodalSpec)
    "m6_decode_health" -> { (s, dir) =>
      Multimodal.decodeHealth(
          Multimodal.attachBinaryCached(s, dir))
        .orderBy("mime")
    },

    // pHash hamming-threshold sensitivity (the c98 tuning-readout
    // pattern for the image modality): near-dup pairs and images
    // touched as the distance knob sweeps 0..7 — ONE banded pair
    // relation at the recall-total bound (8 bands → every pair within
    // hamming ≤ 7 shares a clean band), eight cumulative counts derived
    // from it. Rows-only: DuckDB cannot decode the images
    "m7_phash_sensitivity" -> { (s, dir) =>
      import s.implicits._
      val hashed = Multimodal.imageHashes(
        Multimodal.attachBinaryCached(s, dir))
      val pairs = Multimodal.hashNearDupPairs(
        hashed, "doc_id", "phash", maxHamming = 7)
      val sweep = pairs.select(
          explode(array((0 to 7).map(lit): _*)).as("max_hamming"),
          col("hamming"), col("id_a"), col("id_b"))
        .filter(col("hamming") <= col("max_hamming"))
      val nP = sweep.groupBy(col("max_hamming"))
        .agg(count(lit(1)).as("n_pairs"))
      val nD = sweep
        .select(col("max_hamming"),
          explode(array(col("id_a"), col("id_b"))).as("_id"))
        .distinct()
        .groupBy(col("max_hamming"))
        .agg(count(lit(1)).as("n_images"))
      (0 to 7).toDF("max_hamming")
        .join(nP, Seq("max_hamming"), "left")
        .join(nD, Seq("max_hamming"), "left")
        .na.fill(0L, Seq("n_pairs", "n_images"))
        .orderBy("max_hamming")
    },

    // video perceptual signatures: per-frame aHash from REAL MJPEG/AVI
    // decode, folded into a temporal majority-bit hash robust to
    // dropped/reordered frames (rows-only — DuckDB cannot decode AVI;
    // frame-drop invariance and the planted-duplicate hamming join are
    // value-pinned in MultimodalSpec)
    "m5_video_phash" -> { (s, dir) =>
      Multimodal.videoSignatures(
          Multimodal.attachBinaryCached(s, dir))
        .orderBy("doc_id")
    }
  )

  // s3 (flatMapGroupsWithState) and s9 (transformWithState) run the
  // same semantics through two stateful APIs — one shared oracle string
  // pins both (an edit to one cannot strand the other)
  private val statefulOracle: String =
    """SELECT user_id, event_id,
      |  count(1) OVER w AS n_events,
      |  round(sum(value) OVER w, 4) AS total_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "s1_stream_tumble" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, count(1) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // streaming/batch identity is structural: s7 runs the SAME oracle
    // string as the batch q70 — an edit to one cannot strand the other
    "s7_stream_sliding" -> Relational4.oracle("q70_sliding_window"),

    // s23 = s1 through the Avro wire hop: the decode must be the
    // identity, so the oracle string is shared verbatim
    "s23_avro_stream" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, count(1) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "s4_stream_dedup" ->
      """SELECT event_type, count(1) AS n
        |FROM (SELECT DISTINCT event_id, event_type FROM events) d
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // exact-copy duplicates collapse under both dedup APIs → s10 shares
    // s4's oracle verbatim (the API divergence on unequal-ts retries is
    // spec-pinned, not oracle-expressible on this fixture)
    "s10_dedup_within_wm" ->
      """SELECT event_type, count(1) AS n
        |FROM (SELECT DISTINCT event_id, event_type FROM events) d
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s6_stream_static_join" ->
      """SELECT c_mktsegment, count(1) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the replayed stream reproduces batch c31 exactly (ordered
    // contiguous chunks → first-seen == min doc_id), so s12 shares its
    // oracle shape: within-crawl min-id winners minus corpus texts
    // streaming/batch identity is structural: s18 runs the SAME oracle
    // string as the batch c88 (an edit to one cannot strand the other)
    "s18_stream_anomaly" -> LayerC.oracle("c88_rate_anomaly"),

    "s21_stream_percentile" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
        |  round(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 6) AS p95,
        |  count(1) AS n
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,

    // the mirror after the last micro-batch == latest change per key,
    // tombstoned keys absent — order-insensitive by the tombstone
    // retention, so the replay chunking cannot move the answer
    "s22_cdc_apply" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 'delete'
        |         ELSE 'upsert' END AS op,
        |    value
        |  FROM events),
        |r AS (
        |  SELECT user_id, op, value, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM c)
        |SELECT user_id, value AS last_value, ts AS last_ts
        |FROM r WHERE rk = 1 AND op <> 'delete'
        |ORDER BY user_id""".stripMargin,

    "s20_scd2_enrich" ->
      """WITH dim AS (
        |  SELECT o_custkey, o_orderpriority AS prio,
        |    CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        |    lead(CAST(o_orderdate AS TIMESTAMP)) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT coalesce(d.prio, '(none)') AS prio, count(1) AS n
        |FROM events e LEFT JOIN dim d
        |  ON e.user_id = d.o_custkey AND e.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        |GROUP BY 1 ORDER BY prio""".stripMargin,

    "s19_stream_topk" ->
      """WITH wc AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |    event_type, count(1) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY window_start ORDER BY n DESC, event_type) AS rnk
        |  FROM wc)
        |SELECT window_start, event_type, n, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin,

    // the batch equivalent of the streamed drift monitor: c82's LM
    // arithmetic, windowed on the synthesized ingest timeline
    "s17_stream_drift" ->
      """WITH trt AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents WHERE doc_id % 29 <> 0),
        |t2 AS (SELECT token FROM trt WHERE token <> ''),
        |freq AS (SELECT token, count(1) AS f FROM t2 GROUP BY token),
        |nv AS (SELECT CAST(sum(f) AS BIGINT) + count(1) AS denom FROM freq),
        |tet AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents WHERE doc_id % 29 = 0),
        |te2 AS (SELECT doc_id, token FROM tet WHERE token <> ''),
        |sc AS (
        |  SELECT make_timestamp((1700000000 + doc_id * 300) * 1000000) AS ingest_ts,
        |    -ln((coalesce(f, 0) + 1.0) / CAST(denom AS DOUBLE)) AS nll
        |  FROM te2 LEFT JOIN freq USING (token) CROSS JOIN nv)
        |SELECT time_bucket(INTERVAL '1 hour', ingest_ts) AS window_start,
        |  round(avg(nll), 6) AS avg_nll, count(1) AS n_tokens
        |FROM sc GROUP BY 1 ORDER BY window_start""".stripMargin,

    // the batch equivalent of the streamed decontam join: c77's window
    // derivation, counts per contaminated train doc
    "s15_stream_decontam" ->
      """WITH w AS (
        |  SELECT doc_id, i AS pos, substring(text, i, 30) AS win
        |  FROM documents,
        |    LATERAL (SELECT unnest(range(1, greatest(length(text) - 29, 1) + 1)) AS i) u),
        |b AS (SELECT DISTINCT win FROM w WHERE doc_id % 29 = 0)
        |SELECT w.doc_id, count(1) AS n_contam_windows
        |FROM w JOIN b USING (win)
        |WHERE w.doc_id % 29 <> 0
        |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin,

    // the batch equivalent of the gated stream: same synthesized
    // 1 s-per-doc timeline, same word-count gate, same 1 h buckets
    "s14_stream_quality_gate" ->
      """WITH d AS (
        |  SELECT source, n_chars,
        |    make_timestamp((1700000000 + doc_id) * 1000000) AS ingest_ts
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) BETWEEN 40 AND 100)
        |SELECT time_bucket(INTERVAL '1 hour', ingest_ts) AS window_start,
        |  source, count(1) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM d GROUP BY 1, 2 ORDER BY window_start, source""".stripMargin,

    "s12_corpus_dedup" ->
      """WITH b AS (SELECT * FROM documents WHERE doc_id % 7 = 0),
        |seen AS (SELECT DISTINCT text FROM documents WHERE doc_id % 7 <> 0),
        |w AS (
        |  SELECT b.* FROM b
        |  JOIN (SELECT text, min(doc_id) AS kid FROM b GROUP BY text) k
        |    ON b.doc_id = k.kid)
        |SELECT doc_id, source, n_chars FROM w
        |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.text = w.text)
        |ORDER BY doc_id""".stripMargin,

    // semi = DISTINCT matched left rows; no cutoff term (unlike s8) —
    // matched rows emit on arrival, unmatched rows never emit
    "s11_stream_semi_join" ->
      """SELECT DISTINCT c.user_id, c.event_id AS click_id, c.ts AS click_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY 1, 2""".stripMargin,

    "s5_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    // the final watermark is min(max click_ts, max purchase_ts) - 2 h
    // (Spark's multi-input watermark policy is min); an unmatched click
    // emits its null row only if click_ts + 1 h < that watermark.
    // The STRICT < pins Spark's observed eviction boundary: a click
    // whose match horizon lands EXACTLY on the final watermark keeps
    // its state (no null row) — StreamingSpec ("outer-join null row…")
    // locks that tie case with a synthetic fixture, so a fixture
    // regeneration that lands a click on the boundary cannot silently
    // flip this oracle's <.
    // Spark sorts NULL first — DuckDB defaults NULLS LAST, so pin it.
    "s8_stream_outer_join" ->
      """WITH wm AS (
        |  SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'click'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
        |    - INTERVAL 2 HOUR AS w),
        |matched AS (
        |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |         c.ts AS click_ts, p.ts AS purchase_ts
        |  FROM events c JOIN events p
        |    ON c.user_id = p.user_id
        |   AND c.event_type = 'click' AND p.event_type = 'purchase'
        |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR),
        |unmatched AS (
        |  SELECT c.user_id, c.event_id AS click_id, NULL::BIGINT AS purchase_id,
        |         c.ts AS click_ts, NULL::TIMESTAMP AS purchase_ts
        |  FROM events c CROSS JOIN wm
        |  WHERE c.event_type = 'click'
        |    AND c.ts + INTERVAL 1 HOUR < wm.w
        |    AND NOT EXISTS (
        |      SELECT 1 FROM events p
        |      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR))
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM unmatched
        |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin,

    "s9_stream_tws" -> statefulOracle,
    "s3_stream_stateful" -> statefulOracle,

    // exact-serve contract: streamed-in codes + unbounded rerank ==
    // brute-force kNN on the full table (same oracle as c6/c68)
    "s13_stream_ann_ingest" -> LayerC.knnOracleSql,

    // gaps-and-islands sessionization == Spark session_window on bounded
    // input (new session when the gap is >= 30 min; Spark's window end is
    // exclusive at start+gap)
    "s2_stream_session" ->
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT min(ts) AS session_start, user_id,
        |       count(1) AS n_events, max(ts) AS last_ts
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
  )
}
