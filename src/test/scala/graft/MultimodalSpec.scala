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
    // video payloads remain the UTF-8 text stand-in
    val video = out.filter($"meta.mime" === "video/mp4").collect().head
    assert(new String(video.getAs[Array[Byte]]("payload"), "UTF-8") == "dddd")
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

  test("extractFeatures: images decode to real dims; others byte-histogram with null dims") {
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
    // doc 3 (video): byte histogram of "dddd" ('d' = 0x64 → bin 6)
    assert(byId(3L).isNullAt(2) && byId(3L).isNullAt(3))
    assert(byId(3L).getSeq[Float](byId(3L).fieldIndex("features"))(6) == 1.0f)
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

  test("sampleFrames explodes n slices per video payload") {
    val frames = Multimodal.sampleFrames(Multimodal.attachBinary(docs), n = 4, frameBytes = 2)
    // mime is video/mp4 for doc_id % 4 == 3 → doc 3 only
    val byDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
    assert(byDoc.length == 1 && byDoc.head.getLong(0) == 3L && byDoc.head.getLong(1) == 4L)
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
}
