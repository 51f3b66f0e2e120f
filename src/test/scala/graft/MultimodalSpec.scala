package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "aaaa"), (1L, "bbbb"), (2L, "cccc"), (3L, "dddd"), (4L, "eeee")
  ).toDF("doc_id", "text")

  // a solid-color PNG encoded through ImageIO — known dims, known pixels
  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("attachBinary: image payloads are real decodable JPEG/PNG, dims match metadata") {
    val out = Multimodal.attachBinary(docs)
    assert(out.schema("payload").dataType.typeName == "binary")
    assert(out.schema("meta").dataType == Multimodal.metadataType)
    val images = out.filter($"meta.mime".startsWith("image/")).collect()
    assert(images.map(_.getLong(0)).toSet == Set(0L, 1L, 4L))
    images.foreach { r =>
      val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("payload"))
      assert(img.isDefined, s"payload for doc ${r.getLong(0)} must decode")
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(img.get.getWidth == meta.getInt(1))
      assert(img.get.getHeight == meta.getInt(2))
    }
    // audio payloads are REAL WAV: decodable, duration matches metadata
    val audio = out.filter($"meta.mime" === "audio/wav").collect().head
    val (samples, durMs) = Multimodal.decodeWav(audio.getAs[Array[Byte]]("payload")).get
    assert(durMs == audio.getStruct(audio.fieldIndex("meta")).getLong(3))
    assert(samples.nonEmpty)
    // video payloads are REAL MJPEG/AVI: frames decode, duration and
    // dims match metadata (doc 3: 3 + 3%5 = 6 frames at 10 fps)
    val video = out.filter($"meta.mime" === "video/avi").collect().head
    val meta = video.getStruct(video.fieldIndex("meta"))
    val (frames, vidMs) =
      Multimodal.decodeAviFrames(video.getAs[Array[Byte]]("payload")).get
    assert(frames.length == 6)
    assert(vidMs == 600L && meta.getLong(3) == 600L)
    frames.foreach { f =>
      assert(f.getWidth == meta.getInt(1) && f.getHeight == meta.getInt(2))
    }
  }

  test("encodeMjpegAvi/decodeAviFrames round-trip: exact frame count, dims, duration") {
    val avi = Multimodal.encodeMjpegAvi(seed = 42L, w = 12, h = 9, nFrames = 5, fps = 10)
    val (frames, durMs) = Multimodal.decodeAviFrames(avi).get
    assert(frames.length == 5)
    assert(durMs == 500L)
    assert(frames.forall(f => f.getWidth == 12 && f.getHeight == 9))
    // frames vary deterministically with the index — not one repeated frame
    val h0 = Multimodal.lumaHistogram(frames.head).toSeq
    assert(frames.tail.exists(f => Multimodal.lumaHistogram(f).toSeq != h0))
    // malformed payloads degrade to None, never throw
    assert(Multimodal.decodeAviFrames("not an avi".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(avi.take(40)).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAviFrames(null).isEmpty)
  }

  test("image feature math: hand-computed gradient payload yields the exact luma histogram") {
    // 16×1 PNG (lossless), pixel x = gray 16x+8: equal channels make
    // luma = g (BT.601 weights sum to 1), and every g sits mid-bin, so
    // the expected histogram is EXACTLY uniform 1/16 — computed from
    // first principles, not by re-running the implementation
    val img = new BufferedImage(16, 1, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16) { val g = 16 * x + 8; img.setRGB(x, 0, (g << 16) | (g << 8) | g) }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val decoded = Multimodal.decodeImage(bos.toByteArray).get
    val hist = Multimodal.lumaHistogram(decoded)
    assert(hist.toSeq == Seq.fill(16)(1.0f / 16))
  }

  test("audio feature math: hand-built PCM payload yields the exact samples and histogram") {
    // mono 16-bit little-endian WAV with one sample per amplitude bin:
    // v_k = 4096k + 2048 − 32768 decodes to s = v/32768 landing mid-bin
    // k, so the expected amplitude histogram is EXACTLY uniform 1/16
    val samples = (0 until 16).map(k => 4096 * k + 2048 - 32768)
    val pcm = samples.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    import javax.sound.sampled._
    val fmt = new AudioFormat(Multimodal.wavSampleRate, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 16), AudioFileFormat.Type.WAVE, bos)
    val (decoded, durMs) = Multimodal.decodeWav(bos.toByteArray).get
    assert(decoded.toSeq == samples.map(_ / 32768.0f))
    assert(durMs == 2L) // 16 frames at 8 kHz = 2 ms
    assert(Multimodal.amplitudeHistogram(decoded).toSeq == Seq.fill(16)(1.0f / 16))
  }

  test("video feature math: solid-gray JPEG frames yield the exact mean luma histogram") {
    // 3 solid gray-136 frames (mid-bin 8): a solid JPEG is a pure DC
    // block, so decode error stays within the bin and every pixel of
    // every frame lands in bin 8 — expected mean histogram is exactly
    // one-hot. Built via encodeAviFromJpegs (bring-your-own-frames).
    def solidJpeg(g: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.encodeAviFromJpegs(Seq.fill(3)(solidJpeg(136)), 16, 16, fps = 10)
    val (frames, durMs) = Multimodal.decodeAviFrames(avi).get
    assert(frames.length == 3 && durMs == 300L)
    val expected = Array.tabulate(16)(i => if (i == 8) 1.0f else 0.0f)
    assert(Multimodal.meanLumaHistogram(frames).toSeq == expected.toSeq)
  }

  test("AVI duration agrees between header, decode, and metadata for fps not dividing 1e6") {
    // fps=3: 1e6/3 truncates to 333333 but rounds to 333333 — use fps=7
    // too (1e6/7 = 142857.14 → rounds 142857) and fps=6 (166666.67 →
    // 166667, where truncation would lose a full ms over 6 frames)
    for (fps <- Seq(3, 6, 7)) {
      val n = 6
      val avi = Multimodal.encodeMjpegAvi(seed = 9L, w = 8, h = 8, nFrames = n, fps = fps)
      val (frames, durMs) = Multimodal.decodeAviFrames(avi).get
      assert(frames.length == n)
      assert(durMs == Multimodal.aviDurationMs(n, fps),
        s"fps=$fps: decoded $durMs != header math ${Multimodal.aviDurationMs(n, fps)}")
      // rounded µs-per-frame keeps the decoded duration within 1 ms of truth
      val trueMs = math.round(n * 1000.0 / fps)
      assert(math.abs(durMs - trueMs) <= 1, s"fps=$fps: $durMs vs true $trueMs")
    }
  }

  test("encodeWav/decodeWav round-trip: exact duration, RMS and peak from samples") {
    // 1 s at 8 kHz: duration must be exact; doc 2's amplitude is
    // 0.25 + (2*13 % 50)/100 = 0.51 → peak ≈ 0.51, RMS ≈ 0.51/√2
    val wav = Multimodal.encodeWav(2L, 1000L)
    val (samples, durMs) = Multimodal.decodeWav(wav).get
    assert(durMs == 1000L)
    assert(samples.length == 8000)
    val (rms, peak) = Multimodal.audioStats(samples)
    assert(math.abs(peak - 0.51) < 0.01, s"peak $peak")
    assert(math.abs(rms - 0.51 / math.sqrt(2)) < 0.01, s"rms $rms")
    // malformed payloads degrade to None, never throw
    assert(Multimodal.decodeWav("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
  }

  test("decodeImage: known fixture image yields exact dims and luma histogram") {
    // solid black: luma = 0 → everything lands in bin 0
    val png = solidPng(7, 5, 0x000000)
    val img = Multimodal.decodeImage(png)
    assert(img.isDefined && img.get.getWidth == 7 && img.get.getHeight == 5)
    val hist = Multimodal.lumaHistogram(img.get)
    assert(hist(0) == 1.0f && hist.sum == 1.0f)
    // undecodable / empty / null payloads
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("extractFeatures: image/audio/video all decode for real, per-modality features") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachBinary(docs))
    val rows = feats.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0f) < 1e-5)
    }
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 0 (jpeg): real decoded dims = 8 + (id*37 % 24) = 8, 8 + (id*53 % 24) = 8
    assert(byId(0L).getInt(2) == 8 && byId(0L).getInt(3) == 8)
    // doc 1 (png): w = 8 + 37 % 24 = 21, h = 8 + 53 % 24 = 13
    assert(byId(1L).getInt(2) == 21 && byId(1L).getInt(3) == 13)
    // doc 2 (audio): null dims, features = amplitude histogram of the
    // REAL decoded samples — must equal decoding the payload directly
    assert(byId(2L).isNullAt(2) && byId(2L).isNullAt(3))
    val wav = Multimodal.encodeWav(2L, 50L + 2L * 97 % 450L)
    val expected = Multimodal.amplitudeHistogram(Multimodal.decodeWav(wav).get._1)
    val got = byId(2L).getSeq[Float](byId(2L).fieldIndex("features"))
    assert(got == expected.toSeq)
    // doc 3 (video): REAL decoded frame dims (w = 8 + 3*37 % 24 = 23,
    // h = 8 + 3*53 % 24 = 23) and mean per-frame luma histogram
    assert(byId(3L).getInt(2) == 8 + (3 * 37 % 24) &&
      byId(3L).getInt(3) == 8 + (3 * 53 % 24))
    val aviPayload = Multimodal.attachBinary(docs)
      .filter($"doc_id" === 3L).collect().head.getAs[Array[Byte]]("payload")
    val expectedVid = Multimodal.meanLumaHistogram(
      Multimodal.decodeAviFrames(aviPayload).get._1)
    assert(byId(3L).getSeq[Float](byId(3L).fieldIndex("features")) == expectedVid.toSeq)
  }

  test("attachBinary handles negative doc_ids (floorMod, no crash)") {
    val neg = Seq((-1L, "neg one"), (-4L, "neg four")).toDF("doc_id", "text")
    val out = Multimodal.attachBinary(neg).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getString(0).nonEmpty)
      if (meta.getString(0).startsWith("image/")) {
        assert(meta.getInt(1) >= 8 && meta.getInt(2) >= 8)
        assert(Multimodal.decodeImage(r.getAs[Array[Byte]]("payload")).isDefined)
      }
    }
  }

  test("byteHistogram handles empty payloads") {
    assert(Multimodal.byteHistogram(Array.emptyByteArray).forall(_ == 0f))
    assert(Multimodal.byteHistogram(null).length == 16)
  }

  test("sampleFrames decodes real evenly-spaced frames that round-trip as PNG") {
    // doc 3 is the only video (doc_id % 4 == 3): 6 frames, sample 4
    val frames = Multimodal.sampleFrames(Multimodal.attachBinary(docs), n = 4).collect()
    assert(frames.map(_.getLong(0)).toSet == Set(3L))
    assert(frames.map(_.getInt(1)).sorted.sameElements(Array(0, 1, 2, 3)))
    frames.foreach { r =>
      val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("frame_payload"))
      assert(img.isDefined, "sampled frame must decode as PNG")
      assert(img.get.getWidth == r.getInt(2) && img.get.getHeight == r.getInt(3))
    }
    // a 2-frame video sampled at n=4 yields exactly its 2 frames
    val short = Seq((0L, Multimodal.encodeMjpegAvi(1L, 8, 8, 2)))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("video/avi").as("mime"), lit(8).as("width"),
          lit(8).as("height"), lit(200L).as("duration_ms")).as("meta"))
    assert(Multimodal.sampleFrames(short, n = 4).count() == 2L)
  }

  test("sampleChunks slices n byte chunks for undecodable video codecs") {
    val fake = Seq((9L, Array.fill(200)(7.toByte)))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("video/mp4").as("mime"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"), lit(0L).as("duration_ms")).as("meta"))
    val chunks = Multimodal.sampleChunks(fake, n = 4, frameBytes = 2).collect()
    assert(chunks.length == 4)
    assert(chunks.forall(_.getAs[Array[Byte]]("chunk_payload").length == 2))
  }

  test("resize: real resample to target dims, re-encoded payload decodes back") {
    val resized = Multimodal.resize(Multimodal.attachBinary(docs), 4, 3)
    val rows = resized.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 4L))
    rows.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getString(0) == "image/png")
      assert(meta.getInt(1) == 4 && meta.getInt(2) == 3)
      val back = Multimodal.decodeImage(r.getAs[Array[Byte]]("payload"))
      assert(back.isDefined && back.get.getWidth == 4 && back.get.getHeight == 3)
    }
  }

  test("resize preserves pixel content (solid image stays solid after resample)") {
    val png = solidPng(16, 16, 0x4080C0)
    val df = Seq((0L, png)).toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("image/png").as("mime"), lit(16).as("width"),
          lit(16).as("height"), lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.resize(df, 5, 5).collect().head
    val img = Multimodal.decodeImage(out.getAs[Array[Byte]]("payload")).get
    for (y <- 0 until 5; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xffffff) == 0x4080C0)
  }

  test("resize falls back to linear stride sampling for undecodable image payloads") {
    val junk = ("héllo wörld ünïcode" * 10).getBytes("UTF-8")
    val df = Seq((7L, junk)).toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("image/jpeg").as("mime"), lit(0).as("width"),
          lit(0).as("height"), lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.resize(df, 2, 2).collect().head
    val sampled = out.getAs[Array[Byte]]("payload")
    // sampled bytes are a subset of the original, in order, near the budget
    assert(sampled.nonEmpty && sampled.length <= 2 * junk.length / (junk.length / 4))
    assert(sampled.forall(junk.contains))
    // empty payload: no crash, passthrough
    val empty = Multimodal.resize(
      Seq((8L, Array.emptyByteArray)).toDF("doc_id", "payload")
        .select(col("doc_id"), col("payload"),
          struct(lit("image/png").as("mime"), lit(0).as("width"),
            lit(0).as("height"), lit(null).cast("long").as("duration_ms")).as("meta")),
      2, 2).collect().head
    assert(empty.getAs[Array[Byte]]("payload").isEmpty)
  }

  test("averageHash: exact hash of a hand-computable gradient, invariances") {
    // 8×8 left-to-right gray gradient: column x has luma x*255/7; the
    // grid mean is 127.5, so exactly columns 4..7 set their bits →
    // each row contributes byte 0xF0
    val grad = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = x * 255 / 7; grad.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(Multimodal.averageHash(grad) == 0xF0F0F0F0F0F0F0F0L)
    // scale invariance: the same gradient at 4× resolution hashes equal
    val big = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = (x / 4) * 255 / 7; big.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(Multimodal.averageHash(big) == 0xF0F0F0F0F0F0F0F0L)
  }

  test("hashNearDupPairs: JPEG re-encode pairs with its source, distinct structures don't") {
    // structurally distinct images: left-right gradient, top-bottom
    // gradient, checkerboard — only the lossy JPEG re-encode of the
    // first should pair up (note the FIXTURE's images are all offset
    // gradients of one structure, so aHash correctly calls them
    // near-dups; this test builds its own structures)
    def gray(v: Int) = (v << 16) | (v << 8) | v
    def build(f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, gray(f(x, y)))
      img
    }
    val lr = build((x, _) => x * 255 / 15)
    val tb = build((_, y) => y * 255 / 15)
    val cb = build((x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 0 else 255)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(lr, "jpg", bos)
    val lrJpeg = Multimodal.decodeImage(bos.toByteArray).get
    val rows = Seq(
      (1L, Multimodal.averageHash(lr)), (2L, Multimodal.averageHash(lrJpeg)),
      (3L, Multimodal.averageHash(tb)), (4L, Multimodal.averageHash(cb))
    ).toDF("doc_id", "ahash")
    val pairs = Multimodal.hashNearDupPairs(rows, "doc_id", "ahash",
        maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the re-encode pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 7)
  }

  test("m7 sensitivity sweep: monotone in the hamming knob, dup floor at 0") {
    val out = SparkEntry.queries("m7_phash_sensitivity")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == (0 to 7), s"spine: ${out.toSeq}")
    // cumulative counts can only grow with the threshold
    assert(out.sliding(2).forall(w => w(0)._2 <= w(1)._2 && w(0)._3 <= w(1)._3),
      s"not monotone: ${out.toSeq}")
    // the fixture plants exact/near image duplicates — the widest
    // setting must see at least as many pairs as strictly exact ones,
    // and every counted pair touches two images at most
    assert(out.last._2 >= out.head._2 && out.last._2 > 0,
      s"no pairs at the widest setting: ${out.toSeq}")
    assert(out.forall { case (_, p, d) => d <= 2 * p || p == 0 },
      s"docs exceed 2×pairs: ${out.toSeq}")
  }

  test("perceptualHash survives a clipped brightness shift that aHash misses") {
    // The photometric edit that separates the tiers: a LOW-CONTRAST
    // spectrally-rich texture (cells within a few luma units of the
    // mean) plus one hot specular highlight. The highlight pulls the
    // global mean ABOVE the texture band; a +90 brightness shift
    // saturates the highlight (250→255 instead of +90), dropping the
    // mean back INTO the band — so many near-mean aHash cells flip.
    // pHash excludes DC and thresholds AC coefficients against their
    // own median: the texture's coherent full-support modes dwarf the
    // highlight's thinly-spread spectral delta, so the bit pattern
    // holds through the shift AND a lossy JPEG re-encode.
    val n = 64
    val rnd = new java.util.Random(42) // fixed phases — deterministic image
    val amp = Array.tabulate(8, 8)((u, v) =>
      if (u + v == 0) 0.0 else 6.0 / (1.0 + 0.4 * (u + v)))
    val phase = Array.fill(8, 8)(rnd.nextDouble() * 2 * math.Pi)
    def gray(v: Int) = { val c = math.max(0, math.min(255, v)); (c << 16) | (c << 8) | c }
    val base = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until n; x <- 0 until n) {
      var v = 120.0
      for (u <- 0 until 8; w <- 0 until 8)
        v += amp(u)(w) * math.cos(math.Pi * u * (x + 0.5) / n + phase(u)(w)) *
          math.cos(math.Pi * w * (y + 0.5) / n)
      val dx = x - 50.0; val dy = y - 14.0
      if (dx * dx + dy * dy < 100) v = 250.0 // specular highlight
      base.setRGB(x, y, gray(math.round(v).toInt))
    }
    def luma(rgb: Int): Double =
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
    val shifted = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until n; x <- 0 until n)
      shifted.setRGB(x, y, gray(math.round(luma(base.getRGB(x, y)) + 90).toInt))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(shifted, "jpg", bos)
    val edited = Multimodal.decodeImage(bos.toByteArray).get
    val hamA = java.lang.Long.bitCount(
      Multimodal.averageHash(base) ^ Multimodal.averageHash(edited))
    val hamP = java.lang.Long.bitCount(
      Multimodal.perceptualHash(base) ^ Multimodal.perceptualHash(edited))
    assert(hamA > 7, s"aHash unexpectedly held the edit (hamming $hamA) — " +
      "the pair no longer demonstrates the pHash tier's value")
    assert(hamP <= 7, s"pHash missed the brightness-shifted re-encode (hamming $hamP)")
    // the banding machinery is hash-agnostic: same pair joins on phash…
    val rows = Seq((1L, Multimodal.perceptualHash(base)),
      (2L, Multimodal.perceptualHash(edited))).toDF("doc_id", "phash")
    val pPairs = Multimodal.hashNearDupPairs(rows, "doc_id", "phash", maxHamming = 7)
      .collect()
    assert(pPairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // …and an unrelated structure stays far (no degenerate all-match)
    val cb = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until n; x <- 0 until n)
      cb.setRGB(x, y, gray(if (((x / 8) + (y / 8)) % 2 == 0) 0 else 255))
    val hamUnrelated = java.lang.Long.bitCount(
      Multimodal.perceptualHash(base) ^ Multimodal.perceptualHash(cb))
    assert(hamUnrelated > 7, s"unrelated structures too close: $hamUnrelated")
    // the fused one-pixel-pass path (what imageHashes runs) must equal
    // the two single-tier entry points bit for bit
    assert(Multimodal.imageSignatures(base) ==
      (Multimodal.averageHash(base), Multimodal.perceptualHash(base)))
    assert(Multimodal.imageSignatures(edited) ==
      (Multimodal.averageHash(edited), Multimodal.perceptualHash(edited)))
  }

  test("perceptualHash is scale-invariant on the area-averaged grid") {
    // same gradient at 1× and 4× resolution lands on the same 32×32
    // luma grid, hence the same DCT block and hash
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val small = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      small.setRGB(x, y, gray(x * 255 / 31))
    val big = new BufferedImage(128, 128, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 128; x <- 0 until 128)
      big.setRGB(x, y, gray((x / 4) * 255 / 31))
    assert(Multimodal.perceptualHash(small) == Multimodal.perceptualHash(big))
  }

  test("audioFingerprintBits: gain-invariant, noise-robust, frequency-discriminating") {
    def decoded(seed: Long) =
      Multimodal.decodeWav(Multimodal.encodeWav(seed, 400L)).get._1
    val a = decoded(2L)
    val fpA = Multimodal.audioFingerprintBits(a)
    // gain change flips no autocorrelation sign
    assert(Multimodal.audioFingerprintBits(a.map(_ * 0.5f)) == fpA)
    // small deterministic additive noise (1% of full scale vs tone amp
    // >= 0.25): the lag sums average it out, few signs flip
    val rnd = new scala.util.Random(7)
    val noisy = a.map(s => s + (rnd.nextFloat() - 0.5f) * 0.02f)
    val hNoise = java.lang.Long.bitCount(
      Multimodal.audioFingerprintBits(noisy) ^ fpA)
    assert(hNoise <= 3, s"noise moved $hNoise bits")
    // a different tone (different seed → different frequency) is far
    val hOther = java.lang.Long.bitCount(
      Multimodal.audioFingerprintBits(decoded(3L)) ^ fpA)
    assert(hOther > 10, s"distinct tones only $hOther bits apart")
  }

  test("majorityBits: frame-drop invariant where a first-frame hash is not") {
    val (frames, _) = Multimodal.decodeAviFrames(
      Multimodal.encodeMjpegAvi(5L, 16, 16, nFrames = 7)).get
    val hashes = frames.map(Multimodal.averageHash)
    assert(hashes.distinct.length > 1,
      "fixture videos must have varying frames for this test to bite")
    val full = Multimodal.majorityBits(hashes)
    // dropping one frame of 7 flips no majority bit unless that bit was
    // exactly at the 4/7 boundary — require a small hamming drift
    val dropped = Multimodal.majorityBits(hashes.drop(1))
    assert(java.lang.Long.bitCount(full ^ dropped) <= 4,
      s"frame drop moved ${java.lang.Long.bitCount(full ^ dropped)} bits")
    // reordering flips nothing at all — majority is order-free
    assert(Multimodal.majorityBits(hashes.reverse) == full)
  }

  test("videoSignatures + hashNearDupPairs: planted duplicate videos pair up") {
    val spark2 = spark
    import spark2.implicits._
    // the fixture's synthetic videos are all smooth gradients and share
    // an aHash half-plane by construction, so build structurally
    // DISTINCT videos: gradient frames vs checkerboard frames
    def jpeg(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, paint(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val gradFrames = (0 until 4).map(f =>
      jpeg((x, y) => gray(math.min(x * 16 + f, 255))))
    val checkFrames = (0 until 4).map(f =>
      jpeg((x, y) => gray(if (((x / 4) + (y / 4) + f) % 2 == 0) 230 else 20)))
    val grad = Multimodal.encodeAviFromJpegs(gradFrames, 16, 16, fps = 10)
    val check = Multimodal.encodeAviFromJpegs(checkFrames, 16, 16, fps = 10)
    val vids = Seq((1L, grad), (2L, grad), (3L, check))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("video/avi").as("mime"),
        lit(16).as("width"), lit(16).as("height"),
        lit(400L).as("duration_ms")))
    val sigs = Multimodal.videoSignatures(vids)
    assert(sigs.count() == 3)
    val pairs = Multimodal.hashNearDupPairs(sigs, "doc_id", "vhash", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected only the planted duplicate pair, got $pairs")
  }

  test("decodeHealth counts a corrupt payload as failed, intact ones as decodable") {
    val spark2 = spark
    import spark2.implicits._
    val base = Multimodal.attachBinary(
      Seq((2L, "a"), (3L, "b"), (4L, "c")).toDF("doc_id", "text")) // wav, avi, jpeg
    // truncate the audio payload — a real corrupt-file shape
    val corrupt = base.filter(col("doc_id") === 2L)
      .withColumn("doc_id", lit(102L))
      .withColumn("payload", expr("substring(payload, 1, 10)"))
    val out = Multimodal.decodeHealth(base.unionByName(corrupt))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_payloads"), r.getAs[Long]("n_decodable"),
          r.getAs[Long]("n_failed")))).toMap
    assert(out("audio/wav") == ((2L, 1L, 1L)), s"audio: ${out("audio/wav")}")
    assert(out("video/avi") == ((1L, 1L, 0L)))
    assert(out("image/jpeg") == ((1L, 1L, 0L)))
  }

  test("audioFingerprints + hashNearDupPairs: planted duplicate clip pairs, distinct don't") {
    val spark2 = spark
    import spark2.implicits._
    // ids 2, 6, 10 map to audio/wav (floorMod(id,4)==2); attachBinary
    // derives payload from doc_id, so re-tag id 2's payload as id 102
    // to plant an exact-duplicate clip under a distinct id
    val base = Multimodal.attachBinary(
      Seq((2L, "x"), (6L, "y"), (10L, "z")).toDF("doc_id", "text"))
    val planted = base.filter(col("doc_id") === 2L)
      .withColumn("doc_id", lit(102L))
    val fps = Multimodal.audioFingerprints(base.unionByName(planted))
    assert(fps.count() == 4)
    val pairs = Multimodal.hashNearDupPairs(fps, "doc_id", "afp", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 102L)),
      s"expected only the planted duplicate pair, got $pairs")
  }

  test("imageQualityStats: solid and half-and-half PNGs score exactly") {
    val spark2 = spark
    import spark2.implicits._
    def pngOf(w: Int, h: Int)(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val solid = pngOf(20, 10)((_, _) => gray(100))
    val half = pngOf(16, 16)((x, _) => if (x < 8) gray(0) else gray(255))
    val imgs = Seq((1L, solid), (2L, half)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms")))
    val out = Multimodal.imageQualityStats(imgs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val s = out(1L)
    assert(s.getInt(1) == 20 && s.getInt(2) == 10)
    assert(s.getDouble(3) == 2.0)
    // PNG is lossless: solid gray 100 has luma exactly 100, no spread,
    // zero histogram entropy
    assert(s.getDouble(4) == 100.0 && s.getDouble(5) == 0.0)
    assert(s.getDouble(6) == 0.0)
    val t = out(2L)
    // half luma-0 / half luma-255: mean 127.5, std 127.5, entropy 1 bit
    assert(t.getDouble(4) == 127.5, s"mean ${t.getDouble(4)}")
    assert(t.getDouble(5) == 127.5, s"std ${t.getDouble(5)}")
    assert(math.abs(t.getDouble(6) - 1.0) < 1e-12, s"entropy ${t.getDouble(6)}")
  }

  test("imagePatches: grid coords, per-patch means, and edge-remainder drop") {
    val spark2 = spark
    import spark2.implicits._
    def pngOf(w: Int, h: Int)(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // 32×16 split left/right: 4×2 grid of 8px patches, px<2 black
    val split = pngOf(32, 16)((x, _) => if (x < 16) gray(0) else gray(255))
    // 20×10: remainders (4 px right, 2 px bottom) drop → 2×1 grid
    val ragged = pngOf(20, 10)((_, _) => gray(100))
    val imgs = Seq((1L, split), (2L, ragged)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("mime"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms")))
    val out = Multimodal.imagePatches(imgs, patchSize = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(out.keys.count(_._1 == 1L) == 8)
    assert(out.keys.count(_._1 == 2L) == 2)
    // row-major index ↔ grid coords; PNG is lossless so means are exact
    assert(out((1L, 0)) == ((0, 0, 0.0)))
    assert(out((1L, 3)) == ((3, 0, 255.0)))
    assert(out((1L, 5)) == ((1, 1, 0.0)))
    assert(out((1L, 6)) == ((2, 1, 255.0)))
    assert(out((2L, 0)) == ((0, 0, 100.0)) && out((2L, 1)) == ((1, 0, 100.0)))
  }

  test("audioQualityStats: silent, clipped, and known-amplitude clips score exactly") {
    val spark2 = spark
    import spark2.implicits._
    import javax.sound.sampled._
    def pcmWav(samples: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val silence = pcmWav(Array.fill[Short](800)(0))
    val square = pcmWav(Array.tabulate[Short](800)(i =>
      if (i % 2 == 0) 32767 else -32768))
    val sine = Multimodal.encodeWav(seed = 0L, durationMs = 500L) // amp 0.25
    val clips = Seq((1L, silence), (2L, square), (3L, sine))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("audio/wav").as("mime"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms")))
    val out = Multimodal.audioQualityStats(clips)
      .collect().map(r => r.getLong(0) -> r).toMap
    val s1 = out(1L)
    assert(s1.getInt(1) == 800 && s1.getLong(2) == 100L)
    assert(s1.getDouble(3) == 0.0 && s1.getDouble(4) == -100.0)
    assert(s1.getDouble(5) == 0.0 && s1.getDouble(6) == 1.0)
    val s2 = out(2L)
    assert(s2.getDouble(5) == 1.0, s"square must be fully clipped: $s2")
    assert(s2.getDouble(6) == 0.0)
    assert(s2.getDouble(4) > -0.01, s"full-scale square is ~0 dBFS: ${s2.getDouble(4)}")
    val s3 = out(3L)
    // sine at amplitude 0.25: RMS = 0.25/sqrt(2) → ~-15.05 dBFS
    assert(math.abs(s3.getDouble(4) - (-15.05)) < 0.2, s"sine dBFS ${s3.getDouble(4)}")
    assert(math.abs(s3.getDouble(3) - 0.25) < 0.01, s"sine peak ${s3.getDouble(3)}")
    assert(s3.getDouble(5) == 0.0)
  }

  test("frameRedundancy: slideshow bills as its unique content") {
    val spark2 = spark
    import spark2.implicits._
    def jpeg(paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, paint(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val grad = jpeg((x, _) => gray(math.min(x * 16, 255)))
    val check = jpeg((x, y) => gray(if (((x / 4) + (y / 4)) % 2 == 0) 230 else 20))
    // slideshow: 6 frames, only 2 structurally distinct
    val slide = Multimodal.encodeAviFromJpegs(
      Seq(grad, grad, grad, check, check, check), 16, 16)
    val vids = Seq((1L, slide)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("video/avi").as("mime"),
        lit(16).as("width"), lit(16).as("height"), lit(0L).as("duration_ms")))
    val r = Multimodal.frameRedundancy(vids).collect().head
    assert(r.getInt(1) == 6 && r.getInt(2) == 2, s"got $r")
    assert(math.abs(r.getDouble(3) - (1.0 - 2.0 / 6)) < 1e-12)
  }

  test("sceneCutStats: planted two-scene video scores exactly one cut, flat video zero") {
    val spark2 = spark
    import spark2.implicits._
    def solidJpeg(v: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // bin midpoints (24 → bin 1, 232 → bin 14) so JPEG noise of a few
    // luma levels cannot cross a 16-wide bin boundary
    val dark = solidJpeg(24)
    val bright = solidJpeg(232)
    val twoScene = Multimodal.encodeAviFromJpegs(
      Seq(dark, dark, dark, bright, bright, bright, bright), 16, 16)
    val flat = Multimodal.encodeAviFromJpegs(Seq(dark, dark, dark, dark), 16, 16)
    val vids = Seq((1L, twoScene), (2L, flat)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("video/avi").as("mime"),
        lit(16).as("width"), lit(16).as("height"), lit(0L).as("duration_ms")))
    val out = Multimodal.sceneCutStats(vids, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val two = out(1L)
    assert(two.getInt(1) == 7)
    assert(two.getInt(2) == 1, s"expected exactly one cut, got ${two.getInt(2)}")
    // the two scenes occupy disjoint luma bins → boundary L1 is the
    // maximum 2.0; identical frames within a scene score exactly 0
    assert(math.abs(two.getDouble(3) - 2.0) < 1e-9, s"max ${two.getDouble(3)}")
    assert(math.abs(two.getDouble(4) - 2.0 / 6) < 1e-9, s"mean ${two.getDouble(4)}")
    val one = out(2L)
    assert(one.getInt(1) == 4 && one.getInt(2) == 0)
    assert(one.getDouble(3) == 0.0 && one.getDouble(4) == 0.0)
  }

  test("attachBinaryCached self-heals after an external unpersist sweep") {
    // round 12: the bench's per-query hygiene unpersists everything; the
    // shared binary fixture must re-pin itself (and stay value-stable)
    // instead of silently re-encoding the corpus on every later action
    import org.apache.spark.storage.StorageLevel
    val dir = "/root/testdata/sf0.001"
    val df = graft.multimodal.Multimodal.attachBinaryCached(spark, dir)
    val before = df.select("doc_id").count()
    assert(df.storageLevel != StorageLevel.NONE, "fixture must be pinned")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    val healed = graft.multimodal.Multimodal.attachBinaryCached(spark, dir)
    assert(healed.storageLevel != StorageLevel.NONE,
      "fixture must be re-pinned after the sweep")
    assert(healed.select("doc_id").count() == before)
  }
}
