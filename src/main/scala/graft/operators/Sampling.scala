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

  /** Shard count for training-output layout. */
  val Shards = 16

  /** Epoch-reproducible global shuffle + shard assignment: the last
    * step before a training corpus is written out. `shuffle_key` is a
    * full-range multiplicative hash (NOT the permille bucket — the
    * shuffle needs a fine-grained total order, the sampler needs 1000
    * coarse bins), `shard = key % Shards` spreads documents uniformly.
    * Writing is then `repartition(Shards, $"shard")` +
    * `sortWithinPartitions($"shuffle_key")` + a partitioned write —
    * each shard lands sorted in its own file with NO global sort; the
    * order is reproducible on any engine/cluster/run because it derives
    * from doc_id alone, which is what makes training resumable and
    * ablations comparable. The correctness face returns the assignment
    * globally ordered so the oracle can hash it. */
  /** Curriculum-staged, sharded training order — the composition a
    * pretraining run actually consumes: documents enter by QUALITY
    * STAGE (perplexity tercile from
    * [[TextAnalysis.pplBucket]] — most-corpus-like first, the standard
    * easy→hard curriculum), shuffled deterministically within each
    * stage by the epoch-reproducible multiplicative hash, and split
    * into shards whose COUNT grows with the corpus (max(8, ⌈n/target⌉)
    * — so per-shard row volume, and therefore the per-shard position
    * window's frame, is BOUNDED at any scale; a fixed shard count
    * would put n/8 rows on one window partition at 100 TB). The
    * trainer reads stage ascending, round-robins shards, pos
    * ascending.
    *
    * Scale shape: scoring is unigramLogProb's broadcast-lookup plan;
    * staging adds one lang-keyed window (the documented pplBucket
    * seam); ordering adds ONE (stage, shard)-keyed window over
    * bounded frames. All arithmetic is the engine-replayable hash —
    * the whole epoch order is reproducible bit-for-bit anywhere. */
  def curriculum(docs: DataFrame, targetShard: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count() // bounded driver state (the bm25 pattern)
    val nShards = math.max(8L, (n + targetShard - 1) / targetShard)
    val key = ((col("doc_id") % 1000003L) * lit(2654435761L)) %
      lit(1000000007L)
    TextAnalysis.pplBucket(docs)
      .select(col("doc_id"),
        when(col("ppl_bucket") === "head", 1L)
          .when(col("ppl_bucket") === "middle", 2L)
          .otherwise(3L).as("stage"))
      .withColumn("shuffle_key", key)
      .withColumn("shard", col("shuffle_key") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("stage"), col("shard"))
          .orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("stage"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  def shardAssign(docs: DataFrame, nShards: Int = Shards): DataFrame = {
    val key = ((col("doc_id") % 1000003L) * lit(2654435761L)) % lit(1000000007L)
    docs.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
  }

  /** Concat-and-chunk sequence packing — the GPT-pretraining layout
    * step: each shard's documents concatenate (in the epoch-
    * reproducible shuffle order of [[shardAssign]]) into one token
    * stream that is cut every `capacity` tokens into training
    * sequences; a document's placement is the sequence index and
    * token offset of its START position (documents straddling a cut
    * are split by the trainer mid-document — the standard packing
    * contract, zero padding waste). One running-sum window per shard
    * — shards pack independently, so the plan is Shards parallel
    * ordered passes after a single shard-keyed shuffle; no global
    * sort, no sequential bin state (next-fit bin packing would need
    * it; start-offset chunking is the closed form the window can
    * compute). Exact integer math end to end — identical on any
    * engine. */
  def packSequences(docs: DataFrame, capacity: Long = 2048L,
      nShards: Int = Shards): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val key = ((col("doc_id") % 1000003L) * lit(2654435761L)) % lit(1000000007L)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard"),
        // pure BIGINT division (`div` = IntegralDivide): no double
        // intermediate exists for the engines to represent differently
        // (oracle mirrors with DuckDB's integer `//`)
        expr(s"start_tok div $capacity").as("seq_id"),
        (col("start_tok") % capacity).as("seq_offset"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Per-source representation cap: keep at most `cap` documents per
    * source, preferring the longest (a quality proxy the synthetic
    * corpus carries precomputed), ties on doc_id. The anti-boilerplate
    * / anti-domination primitive of corpus curation — one overrepresented
    * crawl domain otherwise swamps the mixture. Same
    * WindowGroupLimit shape as topKPerStratum: each map partition
    * retains ≤cap rows per source BEFORE the exchange, so the shuffle
    * moves O(sources·cap) rows, not the corpus. */
  def sourceCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** Temperature-based mixture reweighting (the mT5/XLM-R sampling
    * rule): source i gets probability p_i^α / Σ p_j^α where p_i is its
    * share of the corpus MASS (characters here — temperature sampling
    * reweights token mass, and the synthetic sources have uniform doc
    * counts, which would make a doc-count gate vacuous). α<1 flattens
    * the mixture toward low-resource sources; α=1 is proportional,
    * α=0 uniform. Emits per source: mass, 6-decimal mixture weight,
    * and the document target for a `budget`-doc epoch computed FROM
    * the rounded weight (half-up on a 1-decimal product — both
    * engines round positives identically, and the rounding makes the
    * value cross-engine-exact where raw pow() is libm-dependent in
    * the last ulp).
    *
    * Scale shape: one map-side-combined groupBy to source cardinality,
    * then unpartitioned windows over that SOURCE-sized frame (bounded
    * by the number of sources at any corpus size, never by rows). */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.7,
      budget: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("mass"))
      .withColumn("pw",
        pow(col("mass") / sum(col("mass")).over(all), lit(alpha)))
      .withColumn("weight", round(col("pw") / sum(col("pw")).over(all), 6))
      .select(col("source"), col("mass"), col("weight"),
        round(col("weight") * budget, 0).cast("long").as("target_docs"))
      .orderBy(col("source"))
  }

  /** Named target weights for the mixture solver; sources not listed
    * fall back to [[MixDefaultWeight]]. Integer weights, so every
    * downstream quantity stays in exact BIGINT arithmetic. */
  val MixWeights: Seq[(String, Long)] = Seq(
    "src0" -> 8L, "src1" -> 5L, "src2" -> 4L)
  val MixDefaultWeight = 1L

  /** Domain-mixture solver + deterministic sampler: given target
    * mixture weights per source, find the LARGEST total token budget T
    * the corpus can serve at those proportions without oversampling
    * any source (T = min_s ⌊toks_s · W / w_s⌋ — the binding source is
    * taken whole, every other source is down-sampled), then convert
    * each source's share into a permille keep-rate and apply it with
    * the hash-bucket sampler. The report carries the solve (weight,
    * permille) and the realized sample (n_kept, kept_toks) per source
    * — the "hit the paper's data mixture" step of corpus assembly.
    *
    * Everything is exact integer arithmetic (`div` = IntegralDivide;
    * permille floors, so a source is never oversampled past its
    * target), reproducible on any engine — no rand(), no floats.
    * Scale shape: two map-side-combined source-keyed aggregations
    * over the scan (stats, then the kept re-count), unpartitioned
    * windows only over the SOURCE-sized frame (the temperatureMix
    * contract), and the per-row keep decision joins the
    * source-cardinality rate table back by BROADCAST — the corpus
    * never shuffles. */
  def mixtureRates(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val wcol = MixWeights.reverse.foldLeft(lit(MixDefaultWeight): Column) {
      case (acc, (src, w)) => when(col("source") === src, w).otherwise(acc)
    }
    val toks = docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val rates = toks
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      .withColumn("weight", wcol)
      .withColumn("w_total", sum(col("weight")).over(all))
      .withColumn("t_max", min(expr("toks * w_total div weight")).over(all))
      .withColumn("permille", least(lit(1000L),
        expr("1000 * t_max * weight div (w_total * toks)")))
    val kept = toks
      .join(broadcast(rates.select(col("source"), col("permille"))), "source")
      .filter(hashBucket(col("doc_id")) < col("permille"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_toks"))
    rates
      .select(col("source"), col("n_docs"), col("toks"), col("weight"),
        col("permille"))
      .join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("toks"), col("weight"),
        col("permille"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_toks"), lit(0L)).as("kept_toks"))
      .orderBy(col("source"))
  }

  /** Epoch-budget multiplier: the plan targets EpochBudgetX× the
    * corpus's total tokens (a multi-pass training run), so the budget
    * scales with the data instead of being a magic absolute. */
  val EpochBudgetX = 3L

  /** Epoch cap above which a source is flagged as over-repeated —
    * the standard "repeating data degrades past ~4 epochs" guard
    * (Muennighoff et al. 2023, "Scaling Data-Constrained LMs"). */
  val EpochCap = 4L

  /** Multi-epoch data-recipe planner — [[mixtureRates]]'s dual: the
    * mixture solver DOWN-samples to the largest budget servable
    * without repeats, while a data-constrained recipe UP-samples
    * (repeats = epochs) to hit a fixed budget at the target mixture.
    * Per source: target tokens = budget·w_s/W, served as `full_epochs`
    * complete passes (target div toks) plus a deterministic hash-kept
    * partial pass whose keep-permille closes the remainder — all
    * INTEGER arithmetic, so the plan is bit-identical on any engine.
    * Sources pushed past [[EpochCap]] epochs carry an over-repeat
    * flag (the quality guard a recipe reviewer reads first).
    *
    * Scale shape: one per-source token aggregate (map-side combined),
    * a source-cardinality window for the weight total, one broadcast
    * join for the partial-pass count — the corpus is scanned twice
    * and shuffles only its (source, n_toks) projection. */
  def epochPlan(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val wcol = MixWeights.reverse.foldLeft(lit(MixDefaultWeight): Column) {
      case (acc, (src, w)) => when(col("source") === src, w).otherwise(acc)
    }
    val toks = docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val plan = toks
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
      .withColumn("weight", wcol)
      .withColumn("w_total", sum(col("weight")).over(all))
      .withColumn("budget",
        (sum(col("toks")).over(all) * EpochBudgetX))
      .withColumn("target_toks",
        expr("budget * weight div w_total"))
      .withColumn("full_epochs", expr("target_toks div toks"))
      .withColumn("last_permille",
        expr("1000 * (target_toks - full_epochs * toks) div toks"))
    val partial = toks
      .join(broadcast(plan.select(col("source"), col("last_permille"))),
        "source")
      .filter(hashBucket(col("doc_id")) < col("last_permille"))
      .groupBy(col("source"))
      .agg(sum(col("n_toks")).as("partial_toks"))
    plan
      .join(partial, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("toks"), col("weight"),
        col("target_toks"), col("full_epochs"), col("last_permille"),
        (col("full_epochs") * col("toks") +
          coalesce(col("partial_toks"), lit(0L))).as("planned_toks"),
        (col("full_epochs") >= EpochCap).as("over_repeated"))
      .orderBy(col("source"))
  }

  /** Deterministic round-robin source interleaving — the training-order
    * layout that keeps every batch mixture-representative: documents
    * order globally by (per-source rank, source), so round r serves
    * the r-th document of every source before any source's (r+1)-th,
    * and uneven sources drop out of the rotation exactly when
    * exhausted.
    *
    * Scale shape: the GLOBAL position is NOT a global window (which
    * would single-partition the corpus — the q34 scale-killer). It is
    * computed per-row by closed form over the source-count vector:
    * pos(r, s) = Σ_{s'} min(c_{s'}, r−1) + #{s' < s : c_{s'} ≥ r} + 1
    * — rows before (r, s) are the complete earlier rounds plus the
    * earlier sources still alive in round r. The count vector is
    * SOURCE-cardinality-sized (bounded at any corpus scale) and ships
    * as a broadcast 1-row sorted array; per-source ranks come from one
    * source-keyed window. The oracle computes the NAIVE global
    * ROW_NUMBER over (rank, source) — hash equality proves the
    * distributed closed form ≡ the definition (the stream_late_audit
    * proof pattern). */
  def interleave(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val ranked = docs.select(col("doc_id"), col("source"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
    val counts = ranked.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .agg(sort_array(collect_list(struct(col("source"), col("cnt"))))
        .as("cs"))
    ranked.crossJoin(broadcast(counts))
      .withColumn("global_pos",
        aggregate(col("cs"), lit(0L), (acc, x) =>
          acc + least(x.getField("cnt"), col("src_rank") - 1) +
            when(x.getField("source") < col("source") &&
              x.getField("cnt") >= col("src_rank"), 1L).otherwise(0L)) + 1)
      .select(col("doc_id"), col("source"), col("src_rank"),
        col("global_pos"))
      .orderBy(col("global_pos"))
  }

  /** Deterministic uniform k-sample — the distributed, re-runnable form
    * of reservoir sampling: give every document a fixed pseudorandom
    * priority (an overflow-safe Knuth multiplicative permutation of
    * its id mod the poly-hash prime) and keep the k SMALLEST. Bottom-k
    * by a fixed hash IS the reservoir result (Efraimidis-Spirtsis with
    * hash priorities), but unlike a stateful reservoir it is
    * order-independent, mergeable across partitions, and replayable —
    * re-running at any parallelism yields the SAME sample, which is
    * what a training-data audit needs.
    *
    * Shape: one narrow projection + TakeOrderedAndProject — each task
    * keeps its local k, the driver merges k-sized heaps; no shuffle of
    * the corpus, no global sort, no RNG state. The final k-row sort is
    * driver-side by construction. */
  def reservoirSample(docs: DataFrame, k: Int = 200): DataFrame = {
    val priority =
      ((col("doc_id") % 1000000007L) * 2654435761L) % 1000000007L
    docs
      .select(col("doc_id"), col("source"), col("lang"),
        priority.as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
      .orderBy(col("doc_id"))
  }

  /** GROUP-holdout split — the leakage-free counterpart to the row-
    * keyed [[splitCounts]]: ALL rows of one group (here the user) land
    * in the same fold, so a user's events can never straddle train and
    * test. That straddle is the canonical eval-contamination bug for
    * behavioral, per-author, or per-site corpora — a row-hash split
    * leaks every multi-row entity across folds; the fix is hashing the
    * GROUP key, and disjointness then holds by construction (fold is a
    * function of the key). Same multiplicative hash as every sampling
    * face (deterministic, engine-independent, no rand()).
    *
    * Emits the per-fold census (groups, rows). Shape: one map-side-
    * combined group aggregate (the only corpus-scale exchange, keyed
    * by the group), then a 3-row fold rollup. */
  def groupSplit(events: DataFrame): DataFrame = {
    val b = hashBucket(col("user_id"))
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(when(b < 800, "train").when(b < 900, "val")
        .otherwise("test").as("split"), col("n"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"))
      .orderBy(col("split"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, simplified to
    * unigram LMs): score every document by how much more likely its
    * tokens are under the TARGET slice's unigram distribution than
    * under the whole corpus's — imp(d) = Σ_w ln P_t(w) − ln P_s(w)
    * with add-one smoothing — and keep the target-leaning documents
    * (imp > 0). This is the data-selection step that tilts a generic
    * crawl toward a domain (here: the 'en' slice stands in for the
    * target domain) without training a classifier.
    *
    * Exactness: each per-token term is ⌊ln(c_t+1)·1e6⌋ −
    * ⌊ln(c_all+1)·1e6⌋ — lns of EXACT integers (the unigramLogProb
    * contract), so both engines floor the same doubles and the
    * per-doc sum is an order-independent BIGINT; the corpus-level
    * normalizer ln(N_s+V) − ln(N_t+V) enters as n_tokens · (constant
    * integer), never a float. The keep flag compares the integer
    * score to 0 — length normalization cannot change its sign, so no
    * integer division (and no trunc-vs-floor seam on negatives).
    *
    * Scale: one corpus tokenize, ONE token-keyed count aggregate
    * (map-side combined, both slices in one pass), scores joined back
    * broadcast (key-shuffled at web scale — the unigramLogProb seam),
    * one per-doc rollup. V and the totals are one bounded scalar
    * aggregate. */
  def importanceWeight(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
    val counts = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
    val st = counts.agg(sum(col("c_all")).as("n_all"),
      sum(col("c_t")).as("n_t"), count(lit(1)).as("v")).head()
    val (nAll, nT, v) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val shift = math.floor(math.log((nAll + v).toDouble) * 1e6).toLong -
      math.floor(math.log((nT + v).toDouble) * 1e6).toLong
    toks.join(broadcast(counts), "w")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(floor(log((col("c_t") + 1).cast("double")) * 1e6).cast("long")
          - floor(log((col("c_all") + 1).cast("double")) * 1e6)
            .cast("long")).as("ratio_fp"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("ratio_fp") + col("n_tokens") * shift).as("imp_fp"),
        (col("ratio_fp") + col("n_tokens") * shift > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** WEIGHTED reservoir sample (Efraimidis–Spirakis 2006) — k docs
    * drawn with probability proportional to weight (here n_chars, the
    * token-count proxy), the primitive behind size-proportional corpus
    * subsampling ("sample 10k docs but let long docs count more").
    * E-S keeps the k largest u^(1/w) for uniform u — equivalently the
    * k SMALLEST −ln(u)/w. Both engines must agree on the order, so
    * the priority is an exact INTEGER: u = h/P for the deterministic
    * hash h ∈ [1, P), −ln(u) = ln P − ln h, and
    * key = (⌊ln P·10⁶⌋ − ⌊ln h·10⁶⌋)·10⁶ div w — lns of exact
    * integers (the unigramLogProb discipline), integer scale and
    * division, doc_id tie-break. No rand(), no float comparison, no
    * pow: the sample is a pure function of the data, reproducible on
    * any engine and any partitioning.
    *
    * Scale: the priority is a per-row projection and bottom-k
    * compiles to TakeOrderedAndProject — per-partition heaps of k,
    * one k-row merge at the driver, NO global sort at any corpus
    * size (the reservoirSample plan, weighted). */
  def weightedSample(docs: DataFrame, k: Int = 200): DataFrame = {
    val p = 1000000007L
    val lnPFp = math.floor(math.log(p.toDouble) * 1e6).toLong
    docs
      // a zero-weight item has selection probability 0 in E-S; without
      // this filter `div w` yields a NULL priority, which Spark sorts
      // FIRST (zero-weight doc enters the sample) while SQL engines
      // default NULLS LAST — filter the seam out entirely
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars").as("w"),
        ((col("doc_id") % p) * 2654435761L % (p - 1) + 1).as("h"))
      .withColumn("key_fp",
        expr(s"($lnPFp - CAST(FLOOR(LN(h) * 1e6) AS BIGINT)) " +
          "* 1000000 div w"))
      .orderBy(col("key_fp"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("lang"), col("w"),
        col("key_fp"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_weighted" -> ((s, dir) =>
      weightedSample(Tables.load(s, dir, "documents"))),
    "sample_importance" -> ((s, dir) =>
      importanceWeight(Tables.load(s, dir, "documents"))),
    "sample_group_split" -> ((s, dir) =>
      groupSplit(Tables.load(s, dir, "events"))),
    "sample_reservoir" -> ((s, dir) =>
      reservoirSample(Tables.load(s, dir, "documents"))),
    "sample_temperature" -> ((s, dir) =>
      temperatureMix(Tables.load(s, dir, "documents"))),
    "sample_stratified" -> ((s, dir) =>
      stratifiedSample(Tables.load(s, dir, "documents"))),
    "sample_split" -> ((s, dir) =>
      splitCounts(Tables.load(s, dir, "documents"))),
    "sample_topk" -> ((s, dir) =>
      topKPerStratum(Tables.load(s, dir, "documents"))),
    "sample_token_budget" -> ((s, dir) =>
      tokenBudget(Tables.load(s, dir, "documents"))),
    // staged + sharded + positioned epoch order, hash-reproducible
    "sample_curriculum" -> ((s, dir) =>
      curriculum(Tables.load(s, dir, "documents"))),
    "sample_shard" -> ((s, dir) =>
      shardAssign(Tables.load(s, dir, "documents"))),
    "sample_pack" -> ((s, dir) =>
      packSequences(Tables.load(s, dir, "documents"))),
    "sample_source_cap" -> ((s, dir) =>
      sourceCap(Tables.load(s, dir, "documents"))),
    "sample_epoch_plan" -> ((s, dir) =>
      epochPlan(Tables.load(s, dir, "documents"))),
    "sample_mixture" -> ((s, dir) =>
      mixtureRates(Tables.load(s, dir, "documents"))),
    "sample_interleave" -> ((s, dir) =>
      interleave(Tables.load(s, dir, "documents"))))

  def oracleSql: Map[String, String] = Map(
    // same hash, integer E-S priority, bottom-k, tie-break
    "sample_weighted" ->
      """WITH p AS (
        |  SELECT doc_id, source, lang, n_chars AS w,
        |    (doc_id % 1000000007) * 2654435761 % 1000000006 + 1 AS h
        |  FROM documents WHERE n_chars > 0),
        |k AS (
        |  SELECT doc_id, source, lang, w,
        |    (20723265 - CAST(FLOOR(LN(h) * 1e6) AS BIGINT))
        |      * 1000000 // w AS key_fp
        |  FROM p ORDER BY key_fp, doc_id LIMIT 200)
        |SELECT doc_id, source, lang, w, key_fp FROM k
        |ORDER BY doc_id""".stripMargin,
    // full replay: one-pass two-slice token counts, per-token integer
    // log-ratio terms, the corpus normalizer as an integer constant
    "sample_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT w, COUNT(*) AS c_all,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c_t
        |  FROM toks GROUP BY w),
        |s AS (
        |  SELECT CAST(SUM(c_all) AS BIGINT) AS n_all,
        |    CAST(SUM(c_t) AS BIGINT) AS n_t, COUNT(*) AS v FROM c),
        |d AS (
        |  SELECT t.doc_id, t.lang, COUNT(*) AS n_tokens,
        |    CAST(SUM(CAST(FLOOR(LN(c_t + 1) * 1e6) AS BIGINT)
        |      - CAST(FLOOR(LN(c_all + 1) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS ratio_fp
        |  FROM toks t JOIN c ON c.w = t.w GROUP BY 1, 2)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(ratio_fp + n_tokens *
        |    (CAST(FLOOR(LN(n_all + v) * 1e6) AS BIGINT)
        |     - CAST(FLOOR(LN(n_t + v) * 1e6) AS BIGINT)) AS BIGINT)
        |    AS imp_fp,
        |  ratio_fp + n_tokens *
        |    (CAST(FLOOR(LN(n_all + v) * 1e6) AS BIGINT)
        |     - CAST(FLOOR(LN(n_t + v) * 1e6) AS BIGINT)) > 0 AS keep
        |FROM d CROSS JOIN s ORDER BY doc_id""".stripMargin,
    // same group-key hash, fold rule, and two-level census; SUM cast
    // to BIGINT
    "sample_group_split" ->
      """WITH g AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    ((user_id % 1000003) * 2654435761) % 1000 AS b
        |  FROM events GROUP BY user_id)
        |SELECT CASE WHEN b < 800 THEN 'train'
        |  WHEN b < 900 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n_groups, CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same fixed permutation priority, the same bottom-k — hash
    // equality proves the merged per-partition heaps equal the global
    // ORDER BY ... LIMIT definition
    "sample_reservoir" ->
      """WITH p AS (
        |  SELECT doc_id, source, lang,
        |    ((doc_id % 1000000007) * 2654435761) % 1000000007
        |      AS priority
        |  FROM documents),
        |k AS (
        |  SELECT * FROM p ORDER BY priority, doc_id LIMIT 200)
        |SELECT doc_id, source, lang, priority FROM k
        |ORDER BY doc_id""".stripMargin,
    // the NAIVE definition: one global ROW_NUMBER over (rank, source).
    // Hash equality proves the engine's broadcast closed-form position
    // arithmetic ≡ this definition on every row
    "sample_interleave" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS src_rank
        |  FROM documents)
        |SELECT doc_id, source, src_rank,
        |  ROW_NUMBER() OVER (ORDER BY src_rank, source, doc_id)
        |    AS global_pos
        |FROM ranked ORDER BY global_pos""".stripMargin,
    // full relational replay: mass shares, tempered power weights,
    // renormalization, budget targets
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, mass,
        |    POWER(CAST(mass AS DOUBLE) / SUM(mass) OVER (), 0.7) AS pw
        |  FROM c)
        |SELECT source, mass,
        |  ROUND(pw / SUM(pw) OVER (), 6) AS weight,
        |  CAST(ROUND(ROUND(pw / SUM(pw) OVER (), 6) * 100000, 0)
        |    AS BIGINT) AS target_docs
        |FROM w ORDER BY source""".stripMargin,
    // the dual recipe: 3x-corpus budget split by weight, full epochs
    // + hash-kept partial pass, every step integer `//`
    "sample_epoch_plan" ->
      """WITH stats AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |ws AS (
        |  SELECT source, n_docs, toks,
        |    CAST(CASE source WHEN 'src0' THEN 8 WHEN 'src1' THEN 5
        |      WHEN 'src2' THEN 4 ELSE 1 END AS BIGINT) AS weight
        |  FROM stats),
        |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total,
        |               CAST(SUM(toks) * 3 AS BIGINT) AS budget FROM ws),
        |plan AS (
        |  SELECT source, n_docs, toks, weight,
        |    CAST((SELECT budget FROM tot) * weight
        |      // (SELECT w_total FROM tot) AS BIGINT) AS target_toks
        |  FROM ws),
        |p2 AS (
        |  SELECT *, CAST(target_toks // toks AS BIGINT) AS full_epochs,
        |    CAST(1000 * (target_toks - (target_toks // toks) * toks)
        |      // toks AS BIGINT) AS last_permille
        |  FROM plan),
        |partial AS (
        |  SELECT d.source,
        |    CAST(SUM(LEN(STRING_SPLIT(d.text, ' '))) AS BIGINT)
        |      AS partial_toks
        |  FROM documents d JOIN p2 USING (source)
        |  WHERE ((d.doc_id % 1000003) * 2654435761) % 1000
        |    < p2.last_permille
        |  GROUP BY d.source)
        |SELECT p2.source, p2.n_docs, p2.toks, p2.weight, p2.target_toks,
        |  p2.full_epochs, p2.last_permille,
        |  CAST(p2.full_epochs * p2.toks
        |    + COALESCE(partial.partial_toks, 0) AS BIGINT)
        |    AS planned_toks,
        |  p2.full_epochs >= 4 AS over_repeated
        |FROM p2 LEFT JOIN partial USING (source)
        |ORDER BY p2.source""".stripMargin,
    // full relational replay of the mixture solve: per-source token
    // stats, the min-over-sources feasible budget, floored permille
    // rates (DuckDB `//` = Spark `div` on the all-positive operands),
    // and the hash-bucket keep re-count
    "sample_mixture" ->
      """WITH stats AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |ws AS (
        |  SELECT source, n_docs, toks,
        |    CAST(CASE source WHEN 'src0' THEN 8 WHEN 'src1' THEN 5
        |      WHEN 'src2' THEN 4 ELSE 1 END AS BIGINT) AS weight
        |  FROM stats),
        |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS w_total FROM ws),
        |tm AS (SELECT MIN(toks * (SELECT w_total FROM tot) // weight)
        |  AS t_max FROM ws),
        |rates AS (
        |  SELECT source, n_docs, toks, weight,
        |    CAST(LEAST(1000, (1000 * (SELECT t_max FROM tm) * weight)
        |      // ((SELECT w_total FROM tot) * toks)) AS BIGINT) AS permille
        |  FROM ws),
        |kept AS (
        |  SELECT d.source, COUNT(*) AS n_kept,
        |    CAST(SUM(LEN(STRING_SPLIT(d.text, ' '))) AS BIGINT) AS kept_toks
        |  FROM documents d JOIN rates r USING (source)
        |  WHERE ((d.doc_id % 1000003) * 2654435761) % 1000 < r.permille
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.toks, r.weight, r.permille,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.kept_toks, 0) AS kept_toks
        |FROM rates r LEFT JOIN kept k USING (source)
        |ORDER BY r.source""".stripMargin,
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
        |WHERE cum_tokens <= 2000 ORDER BY lang, cum_tokens""".stripMargin,
    // the ppl-tercile CTEs verbatim, then the stage map, the shared
    // multiplicative hash, the corpus-scaled shard count and the
    // (stage, shard) position window — the whole epoch order rides
    // the hash
    "sample_curriculum" ->
      """WITH toks AS (
        |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
        |  FROM documents),
        |counts AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
        |total AS (SELECT COUNT(*) AS n FROM toks),
        |scored AS (
        |  SELECT doc_id,
        |    ROUND(CAST(SUM(CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1e6)
        |        AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1e6)
        |      - LN(CAST((SELECT n FROM total) AS DOUBLE)), 6) AS mean_logp
        |  FROM toks JOIN counts USING (w) GROUP BY doc_id),
        |b AS (
        |  SELECT s.doc_id,
        |    NTILE(3) OVER (PARTITION BY d.lang
        |      ORDER BY s.mean_logp DESC, s.doc_id) AS t
        |  FROM scored s JOIN documents d USING (doc_id)),
        |st AS (
        |  SELECT doc_id, CAST(t AS BIGINT) AS stage,
        |    ((doc_id % 1000003) * 2654435761) % 1000000007 AS shuffle_key
        |  FROM b),
        |ns AS (SELECT GREATEST(8, (COUNT(*) + 49999) // 50000) AS k
        |       FROM documents)
        |SELECT doc_id, stage,
        |  shuffle_key % (SELECT k FROM ns) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY stage, shuffle_key % (SELECT k FROM ns)
        |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
        |FROM st ORDER BY doc_id""".stripMargin,
    "sample_shard" ->
      """SELECT doc_id,
        |  ((doc_id % 1000003) * 2654435761) % 1000000007 AS shuffle_key,
        |  CAST((((doc_id % 1000003) * 2654435761) % 1000000007) % 16
        |    AS INT) AS shard
        |FROM documents ORDER BY shard, shuffle_key, doc_id""".stripMargin,
    "sample_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        |    ((doc_id % 1000003) * 2654435761) % 1000000007 AS shuffle_key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens, shuffle_key,
        |    CAST(shuffle_key % 16 AS INT) AS shard
        |  FROM t),
        |p AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY shuffle_key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_tok
        |  FROM s)
        |SELECT doc_id, shard,
        |  start_tok // 2048 AS seq_id,
        |  start_tok % 2048 AS seq_offset, n_tokens
        |FROM p ORDER BY doc_id""".stripMargin,
    "sample_source_cap" ->
      """SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)
}
