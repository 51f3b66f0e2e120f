package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "aaaa"), (1L, "bbbb"), (2L, "cccc"), (3L, "dddd"), (4L, "eeee")
  ).toDF("doc_id", "text")

  test("attachBinary produces payload bytes + typed metadata struct") {
    val out = Multimodal.attachBinary(docs)
    assert(out.schema("payload").dataType.typeName == "binary")
    assert(out.schema("meta").dataType == Multimodal.metadataType)
    val r = out.filter($"doc_id" === 0L).collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "aaaa")
  }

  test("extractFeatures: 16-dim L1-normalized histograms, deterministic") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachBinary(docs))
    val rows = feats.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0f) < 1e-5)
    }
    // 'a' = 0x61 → bin 6 gets everything for doc 0
    val r0 = feats.filter($"doc_id" === 0L).collect().head
    val f0 = r0.getSeq[Float](r0.fieldIndex("features"))
    assert(f0(6) == 1.0f)
  }

  test("decodeStub handles empty payloads") {
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
    assert(Multimodal.decodeStub(null).length == 16)
  }

  test("sampleFrames explodes n slices per video payload") {
    val frames = Multimodal.sampleFrames(Multimodal.attachBinary(docs), n = 4, frameBytes = 2)
    // mime is video/mp4 for doc_id % 4 == 3 → doc 3 only
    val byDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
    assert(byDoc.length == 1 && byDoc.head.getLong(0) == 3L && byDoc.head.getLong(1) == 4L)
  }

  test("resizeStub shrinks image payloads and rewrites metadata") {
    val resized = Multimodal.resizeStub(Multimodal.attachBinary(docs), 2, 2)
    val rows = resized.collect()
    // image/jpeg for doc_id % 4 == 0, image/png for % 4 == 1
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 4L))
    rows.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getInt(1) == 2 && meta.getInt(2) == 2)
      // documented bound: stride rounding can overshoot up to 2× budget
      assert(r.getAs[Array[Byte]]("payload").length <= 8)
    }
  }

  test("resizeStub: byte-exact sampling, non-ASCII and empty payloads survive") {
    import org.apache.spark.sql.functions._
    val weird = Seq((0L, "héllo wörld ünïcode"), (4L, "")).toDF("doc_id", "text")
    val out = Multimodal.resizeStub(Multimodal.attachBinary(weird), 2, 2).collect()
    val byId = out.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    // sampled bytes must be a subset of the original UTF-8 bytes, in order
    val orig = "héllo wörld ünïcode".getBytes("UTF-8")
    assert(byId(0L).nonEmpty && byId(0L).length <= 2 * 4)
    assert(byId(0L).forall(orig.contains))
    assert(byId(4L).isEmpty)  // empty payload: no crash, empty result
  }
}
