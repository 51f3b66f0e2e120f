package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads with a
  * typed metadata struct, plus per-partition feature extraction.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration
  * shape — is real and tested. The actual media decode (JPEG/PNG/audio
  * frames) is STUBBED behind `decodeStub`: this container has no codec
  * libraries, so the stub derives a deterministic 16-bin byte histogram
  * from the payload. Swapping in a real decoder changes only that one
  * function; everything around it (schema contract, mapPartitions
  * batching, downstream aggregation) is production-shaped.
  *
  * At 100 TB: payloads stay columnar in parquet (binary column), feature
  * extraction is embarrassingly parallel per partition, and the feature
  * table is written back separately so downstream queries never re-read
  * media bytes.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a binary payload + metadata struct to the documents fixture
    * (deterministic: payload = UTF-8 of text, metadata derived from
    * doc_id) — the stand-in for real media ingestion. */
  def attachBinary(docs: DataFrame): DataFrame = {
    val mime = element_at(
      typedLit(Seq("image/jpeg", "image/png", "audio/wav", "video/mp4")),
      (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        mime.as("mime"),
        (pmod(col("doc_id") * 37, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(1080)) + 1).cast("int").as("height"),
        (pmod(col("doc_id") * 97, lit(600000))).as("duration_ms")).as("meta"))
  }

  /** STUB for the real media decoder: deterministic 16-bin byte
    * histogram, L1-normalized. A real implementation would decode pixels
    * or PCM samples here; the signature (bytes → fixed-length features)
    * and call site are what production code keeps. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload != null && payload.nonEmpty) {
      payload.foreach(b => bins((b & 0xff) / 16) += 1f)
      val total = payload.length.toFloat
      var i = 0
      while (i < 16) { bins(i) /= total; i += 1 }
    }
    bins
  }

  /** Per-partition feature extraction over the binary column. Runs as a
    * single `mapPartitions` pass: one decode per row, iterator-to-
    * iterator (no per-partition materialization), preserving
    * partitioning. Output: (doc_id, mime, features[16]). */
  def extractFeatures(spark: SparkSession, withBinary: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBinary
      .select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), r.getString(1),
            decodeStub(r.getAs[Array[Byte]]("payload")).toSeq)
        }
      }(enc)
  }

  /** Resize stub: deterministic payload downsampling to roughly a
    * target byte budget (every k-th byte; stride rounding can overshoot
    * by up to 2×), with metadata updated to the target
    * dimensions — the plumbing shape of image resizing (payload
    * transform + metadata rewrite in one pass). A real implementation
    * decodes, resamples pixels, and re-encodes here. */
  def resizeStub(withBinary: DataFrame, targetW: Int, targetH: Int,
                 bytesPerPixelBudget: Int = 1): DataFrame = {
    val budget = targetW * targetH * bytesPerPixelBudget
    val n = length(col("payload"))  // byte length for BinaryType
    val stride = greatest((n / budget).cast("int"), lit(1))
    // sample bytes DIRECTLY on the binary column (substr slices bytes);
    // a string round-trip would reinterpret bytes as UTF-8 and corrupt
    // or inflate non-ASCII payloads
    val positions = sequence(lit(1), greatest(n, lit(1)), stride)
    val sampled = aggregate(
      transform(positions, i => substr(col("payload"), i, lit(1))),
      lit(Array.emptyByteArray),
      (acc, b) => concat(acc, b))
    withBinary
      .filter(col("meta.mime").startsWith("image/"))
      .select(
        col("doc_id"),
        when(n === 0, col("payload")).otherwise(sampled).as("payload"),
        struct(
          col("meta.mime").as("mime"),
          lit(targetW).as("width"),
          lit(targetH).as("height"),
          col("meta.duration_ms").as("duration_ms")).as("meta"))
  }

  /** Frame sampling stub: slice `n` evenly-spaced fixed-size chunks from
    * the payload — the plumbing shape of video frame extraction
    * (explode to one row per frame). */
  def sampleFrames(withBinary: DataFrame, n: Int, frameBytes: Int = 32): DataFrame = {
    val idxs = sequence(lit(0), lit(n - 1))
    withBinary
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"),
        posexplode(transform(idxs, i =>
          substr(col("payload"),
            (i * greatest((length(col("payload")) - frameBytes) / n, lit(1)) + 1).cast("int"),
            lit(frameBytes)))).as(Seq("frame_idx", "frame_payload")))
  }
}
