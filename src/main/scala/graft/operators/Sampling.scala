package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling operators for training-data pipelines
  * (SURVEY §2C): stratified down-sampling per language and
  * train/val/test splitting.
  *
  * Both are driven by a DETERMINISTIC hash bucket, not `rand()`:
  * engine-seeded randomness cannot be reproduced by the oracle or by a
  * re-run, while the multiplicative-hash bucket below is plain integer
  * arithmetic any SQL engine evaluates identically — the same document
  * lands in the same stratum sample and the same split on every engine,
  * every run, every cluster layout (which is what makes dataset
  * versioning and leak-free splits possible at 100 TB).
  *
  * Scale: both operators are pure per-row projections/filters over a
  * scan — no shuffle, no state; `splitCounts` adds one map-side-combined
  * aggregation keyed by (lang, split) whose cardinality is tiny.
  */
object Sampling {

  /** Bucket count for permille thresholds. */
  val Buckets = 1000

  /** Knuth multiplicative hash → bucket in [0, Buckets). The id is
    * reduced mod 1000003 BEFORE the multiply so the product stays well
    * inside BIGINT range in every engine (no overflow, no
    * engine-specific wrap semantics); the multiplier is odd and coprime
    * to Buckets, so consecutive ids spread uniformly across buckets. */
  def hashBucket(id: Column): Column =
    ((id % 1000003L) * lit(2654435761L)) % Buckets

  private val hashBucketSql = s"((doc_id % 1000003) * 2654435761) % $Buckets"

  /** Per-language keep-rates in permille (‰) for the stratified sample;
    * languages not listed fall back to [[DefaultPermille]]. */
  val DefaultRates: Seq[(String, Int)] = Seq(
    "en" -> 500, "de" -> 300, "fr" -> 200, "es" -> 100, "zh" -> 250)
  val DefaultPermille = 150

  /** Stratified sample: keep a document iff its hash bucket falls under
    * its language's permille threshold. Pure scan + filter. */
  def stratifiedSample(docs: DataFrame,
      rates: Seq[(String, Int)] = DefaultRates,
      defaultPermille: Int = DefaultPermille): DataFrame = {
    val threshold = rates.reverse.foldLeft(lit(defaultPermille): Column) {
      case (acc, (lang, permille)) =>
        when(col("lang") === lang, permille).otherwise(acc)
    }
    docs.filter(hashBucket(col("doc_id")) < threshold)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic 80/10/10 train/val/test assignment, reported as
    * per-(lang, split) counts. The assignment is a row-local expression;
    * the only shuffle is the final tiny-cardinality count. */
  def splitCounts(docs: DataFrame): DataFrame = {
    val b = hashBucket(col("doc_id"))
    docs.select(col("lang"),
        when(b < 800, "train").when(b < 900, "val").otherwise("test")
          .as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))
  }

  /** Deterministic per-stratum top-N: the "take exactly N documents
    * per language" mix primitive (fixed-size eval sets, per-language
    * probes, pilot corpora) — rate-based sampling can't hit an exact
    * count. Docs rank by (hash bucket, doc_id): uniform, reproducible
    * on any engine, no rand(). ONE shuffle keyed by the stratum;
    * rank<=N compiles to WindowGroupLimit, so each partition retains
    * only N rows before the exchange at any corpus size. */
  def topKPerStratum(docs: DataFrame, k: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(hashBucket(col("doc_id")), col("doc_id"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Token-budget packing: fill a per-language token budget by taking
    * documents in deterministic hash order until the running total
    * exceeds it — the "give me ~2000 tokens per language" step of
    * assembling a fixed-size training mix. A doc is kept iff the
    * cumulative token count THROUGH it stays within budget; the
    * cumulative sum is monotone, so the kept set is the maximal
    * prefix, and exact integer window math makes it identical on any
    * engine. One shuffle keyed by lang; the running sum is a single
    * ordered window pass. */
  def tokenBudget(docs: DataFrame, budgetTokens: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(hashBucket(col("doc_id")), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .orderBy(col("lang"), col("cum_tokens"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_stratified" -> ((s, dir) =>
      stratifiedSample(Tables.load(s, dir, "documents"))),
    "sample_split" -> ((s, dir) =>
      splitCounts(Tables.load(s, dir, "documents"))),
    "sample_topk" -> ((s, dir) =>
      topKPerStratum(Tables.load(s, dir, "documents"))),
    "sample_token_budget" -> ((s, dir) =>
      tokenBudget(Tables.load(s, dir, "documents"))))

  def oracleSql: Map[String, String] = Map(
    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
        |WHERE $hashBucketSql <
        |  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 300
        |    WHEN 'fr' THEN 200 WHEN 'es' THEN 100 WHEN 'zh' THEN 250
        |    ELSE 150 END
        |ORDER BY doc_id""".stripMargin,
    "sample_split" ->
      s"""SELECT lang,
        |  CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
        |    ELSE 'test' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT lang, $hashBucketSql AS b FROM documents) t
        |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "sample_topk" ->
      s"""SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY $hashBucketSql, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 30 ORDER BY lang, rk""".stripMargin,
    // both engines' running SUM defaults to RANGE ... CURRENT ROW;
    // the (bucket, doc_id) order key is unique, so RANGE = ROWS
    "sample_token_budget" ->
      s"""SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, lang,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) OVER (
        |      PARTITION BY lang ORDER BY $hashBucketSql, doc_id)
        |      AS BIGINT) AS cum_tokens
        |  FROM documents) t
        |WHERE cum_tokens <= 2000 ORDER BY lang, cum_tokens""".stripMargin)
}
