package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The flagship end-to-end training-corpus build (SURVEY §2C
  * `pipeline_corpus`): what a user of this engine actually runs over
  * raw documents before tokenization —
  *
  *   1. quality gate   — length/word floors (per-row projection)
  *   2. exact dedup    — keep the min doc_id per content hash
  *   3. near-dup dedup — MinHash-LSH pairs → connected components →
  *                       drop every non-canonical cluster member
  *   4. decontaminate  — drop eval-set members and every doc sharing
  *                       a verbatim 13-gram with them
  *   5. split + mix    — deterministic hash-bucket train/val/test,
  *                       summarized per (lang, split) with doc and
  *                       token counts
  *
  * Composition is the point: each stage is an operator that is
  * individually correctness-gated elsewhere (`text_quality`,
  * `dedup_exact`, `dedup_minhash`/`dedup_cluster`, `sample_split`), so
  * this query certifies they compose — same plans, one lineage.
  *
  * Scale notes (100 TB): stage order is the cost order. The quality
  * gate is a scan-time filter (cheapest, first); exact dedup shuffles
  * only (hash, id) pairs; MinHash runs on the exact-dedup SURVIVORS
  * (near-dup candidates can't span exact-dup groups — members are
  * byte-identical, so the canonical copy represents them in the LSH
  * pass); the split is a row-local expression and the final summary is
  * a tiny-cardinality map-side-combined aggregation.
  */
object Corpus {

  /** Quality floors: documents shorter than this are boilerplate/noise
    * at corpus scale. Tuned to be NON-VACUOUS on the synthetic corpus
    * (min 10 words / ~50 chars per doc: the floors really drop rows). */
  val MinWords = 20
  val MinChars = 120

  def qualityGate(docs: DataFrame): DataFrame =
    docs.filter(size(split(col("text"), " ")) >= MinWords &&
      length(col("text")) >= MinChars)

  /** Keep the min-doc_id copy of every byte-identical text: semi-join
    * against the per-hash keeper set — the (8B, 8B) shuffle shape of
    * Dedup.exact, with the full rows carried only for survivors. */
  def dropExactDups(docs: DataFrame): DataFrame = {
    val keepers = docs
      .groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    docs.join(keepers, col("doc_id") === col("keep_id"), "left_semi")
  }

  /** Drop non-canonical members of every MinHash near-dup cluster:
    * docs not in the pair graph are untouched (left join, null label
    * means singleton). */
  def dropNearDups(docs: DataFrame): DataFrame = {
    val clusters = Dedup.nearDupClusters(docs)
      .withColumnRenamed("doc_id", "member_id")
    docs.join(clusters, col("doc_id") === col("member_id"), "left_outer")
      .filter(col("keep_id").isNull || col("keep_id") === col("doc_id"))
      .select(docs.columns.toIndexedSeq.map(col): _*)
  }

  /** The stand-in eval suite for the decontamination stage: every 50th
    * doc plays the benchmark (a real deployment passes its eval sets).
    * Members and any doc sharing a verbatim 13-gram with them leave the
    * training corpus. */
  val BenchPred: org.apache.spark.sql.Column = col("doc_id") % 50 === 0

  /** Drop every document flagged by [[Dedup.contamination]] — eval-set
    * members (self-matches) and verbatim leaks both. Anti-join on the
    * flagged id set; the contamination pass itself moves only gram
    * hashes (broadcast semi-join, see Dedup.scala). */
  def dropContaminated(docs: DataFrame): DataFrame = {
    val flagged = Dedup.contamination(docs, BenchPred)
      .select(col("doc_id").as("bad_id"))
    docs.join(flagged, col("doc_id") === col("bad_id"), "left_anti")
  }

  /** The composed pipeline → per-(lang, split) corpus mix summary. */
  def buildSummary(docs: DataFrame): DataFrame = {
    val b = Sampling.hashBucket(col("doc_id"))
    dropContaminated(dropNearDups(dropExactDups(qualityGate(docs))))
      .select(col("lang"),
        when(b < 800, "train").when(b < 900, "val").otherwise("test")
          .as("split"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("n_chars"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("split"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_corpus" -> ((s, dir) =>
      buildSummary(Tables.load(s, dir, "documents"))))

  /** Rows-only: the near-dup stage (MinHash-LSH) is not
    * SQL-expressible; every component stage carries its own oracle. */
  def oracleSql: Map[String, String] = Map.empty
}
