package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A multimodal record: an opaque binary payload plus typed metadata.
  * Top-level case classes so Spark derives Encoders. */
case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte],
    n_bytes: Long, source: String)

/** Deterministic stand-in for decoded media features. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    checksum: Long, width: Int, height: Int, feature: Array[Float])

/** Multimodal column plumbing (SURVEY §2C `mm_metadata`).
  *
  * Images/audio/video are carried as opaque `binary` columns with typed
  * metadata; decode/feature-extract runs batched per partition over a
  * typed Dataset — the Spark-side shape (schema, encoders, partition
  * batching, feature vector output) is real and tested, while the
  * codec itself is a DETERMINISTIC STUB (this environment has no media
  * libraries): "decoding" hashes the payload into a fake
  * width/height/feature vector. Swapping in a real codec changes only
  * `decodeStub`, nothing in the plan.
  */
object Multimodal {

  /** Manufacture a binary corpus from the documents table: payload =
    * UTF-8 bytes of the text, media type assigned round-robin. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("blob"),
      length(col("text")).cast("long").as("n_bytes"),
      col("source"))

  /** The decode stub: deterministic pseudo-features from the payload
    * bytes. A real implementation would decode pixels/samples here —
    * batched per partition, exactly this signature. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    // FNV-1a over the payload — cheap, deterministic, dependency-free
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < m.blob.length) {
      h ^= (m.blob(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val w = 160 + (math.abs(h) % 1280).toInt
    val ht = 90 + (math.abs(h >> 16) % 720).toInt
    val feat = Array.tabulate(8)(k =>
      (((h >> (8 * (k % 8))) & 0xff).toFloat - 128f) / 128f)
    MediaFeatures(m.doc_id, m.media_type, m.n_bytes, h, w, ht, feat)
  }

  /** Typed decode over the Dataset — Spark already executes `map`
    * partition-batched; a real codec needing per-partition setup
    * (shared decoder handles) would switch this to mapPartitions
    * without touching the plan shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].map(decodeStub)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> { (s, dir) =>
      val feats = extractFeatures(s, mediaTable(Tables.load(s, dir, "documents")))
      feats.toDF()
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("feature"), x => x.cast("double") * x),
            lit(0.0), (acc, v) => acc + v)))
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("checksum"), col("width"), col("height"), col("feat_norm"))
        .orderBy(col("doc_id"))
    })

  /** Binary plumbing + stubbed decode — rows-only check by design. */
  def oracleSql: Map[String, String] = Map.empty
}
