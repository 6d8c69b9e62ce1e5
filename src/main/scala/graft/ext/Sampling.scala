package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixture weighting.
  *
  * Production pipelines sample strata (source, language, length band,
  * quality tier) at different rates to hit a target mixture. The
  * decision must be a pure function of the document key — not of
  * partitioning, task order, or an RNG stream — so re-runs, retries,
  * and different cluster shapes keep the exact same rows. The standard
  * construction: hash the key to a uniform u ∈ [0,1), keep iff
  * u < rate(stratum).
  */
object Sampling {

  /** Length-stratified deterministic sample of a documents table:
    * stratum = whitespace-token count band (`short` < 35 ≤ `medium`
    * < 50 ≤ `long`), rates 0.25 / 0.5 / 1.0 — up-weighting long
    * documents, the common curriculum shape. u = the first 12 hex
    * digits of md5(doc_id ++ ":" ++ salt) over 2^48: exactly-dyadic
    * division, so the keep comparison is bit-deterministic in any
    * IEEE engine (the DuckDB oracle replays the identical
    * arithmetic). Map-only: no shuffle, no RNG, survives any scale
    * and any retry. */
  def stratifiedSample(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       salt: String = "p1"): DataFrame = {
    val u = (conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 12),
      16, 10).cast("long").cast("double") / lit(281474976710656.0)).as("__u")
    val rate = when(col("stratum") === "short", lit(0.25))
      .when(col("stratum") === "medium", lit(0.5))
      .otherwise(lit(1.0))
    docs
      .select(col(idCol).as("doc_id"),
        size(TextOps.tokens(lower(col(textCol)))).cast("long").as("n_tokens"),
        u)
      .withColumn("stratum",
        when(col("n_tokens") < 35, lit("short"))
          .when(col("n_tokens") < 50, lit("medium"))
          .otherwise(lit("long")))
      .filter(col("__u") < rate)
      .select(col("doc_id"), col("n_tokens"), col("stratum"),
        Num.roundLike(col("__u"), 6).as("u"))
  }

  /** Length-quartile curriculum bucketing: each document labeled with
    * its corpus token-count quartile (q1 shortest … q4 longest) —
    * the standard length-curriculum / batch-packing preparation step.
    * Quartiles are EXACT linear-interpolated percentiles
    * (`functions.percentile`, the type-7 estimator DuckDB's
    * quantile_cont also implements; interpolation fractions are
    * dyadic, so the cut points are bit-identical cross-engine). The
    * three cut points ride a broadcast 1-row aggregate — the doc scan
    * is one pass plus the percentile shuffle.
    *
    * Scale note: exact percentile holds per-partition count maps of
    * the value domain; token counts are small integers so the domain
    * (not the corpus) bounds memory and this stays exact even at
    * 100 TB. For unbounded-domain columns swap in
    * `approx_percentile(col, p, accuracy)` — same plan shape. */
  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, Inf. Process. Lett. 97(5) — the standard
    * distributed weighted-sample primitive): each row draws priority
    * `-ln(u)/w` from its own md5 uniform `u` (the [[stratifiedSample]]
    * seeding — no RNG state, replayable at any parallelism), and the n
    * SMALLEST priorities are exactly a weight-proportional sample
    * without replacement. One scan + `TakeOrderedAndProject` (each
    * partition keeps its local top-n, the driver merges n·parts rows)
    * — no global sort, no per-group state: the shape that realizes a
    * mixture policy's weights ([[mixtureWeights]]/[[dsirWeights]])
    * as an actual drawn subset at 100 TB. Priorities round to 9 dp
    * with id tie-breaks — the cross-engine total order (ln parity per
    * the t9/t10 precedent); zero weights clamp to 1. */
  def weightedSample(docs: DataFrame, n: Int = 50,
                     idCol: String = "doc_id",
                     weightCol: String = "n_chars",
                     salt: String = "p12"): DataFrame = {
    val u = (conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 12),
      16, 10).cast("long").cast("double") + 1.0) / lit(281474976710657.0)
    val w = greatest(col(weightCol), lit(1L)).cast("double")
    docs.select(col(idCol).as("doc_id"), col(weightCol).as("weight"),
        Num.roundLike(-log(u) / w, 9).as("priority"))
      .orderBy(col("priority").asc, col("doc_id"))
      .limit(n)
  }

  def lengthQuartiles(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val lens = docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(lower(col(textCol)))).cast("long").as("n_tokens"))
    val qs = lens.agg(
      percentile(col("n_tokens"), lit(0.25)).as("__q1"),
      percentile(col("n_tokens"), lit(0.5)).as("__q2"),
      percentile(col("n_tokens"), lit(0.75)).as("__q3"))
    lens.crossJoin(broadcast(qs))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") <= col("__q1"), lit("q1"))
          .when(col("n_tokens") <= col("__q2"), lit("q2"))
          .when(col("n_tokens") <= col("__q3"), lit("q3"))
          .otherwise(lit("q4")).as("bucket"))
  }

  /** Per-source corpus mixture weights — the bookkeeping step behind
    * temperature-sampled training mixtures: for each source stratum,
    * its document count, token count, exact corpus share, and a
    * √-temperature weight (relative to the largest source) that
    * up-weights small sources the way multilingual/multi-domain
    * training mixes do. Determinism is engineered, not hoped for:
    * `share` divides two exact integer sums (order-independent), and
    * `temp_weight` = sqrt(n)/sqrt(max n) chains three correctly-
    * rounded IEEE ops on exact integers — bit-identical in any
    * engine, no float accumulation anywhere. One map-side-combined
    * groupBy plus a broadcast 1-row total: two tiny shuffles at any
    * corpus size. */
  def mixtureWeights(docs: DataFrame, byCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val per = docs
      .select(col(byCol).as("source"),
        size(TextOps.tokens(lower(col(textCol)))).cast("long")
          .as("__n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__n_tokens").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("__total"),
      max("n_tokens").as("__max"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Num.roundLike(
          col("n_tokens").cast("double") / col("__total"), 6).as("share"),
        Num.roundLike(
          sqrt(col("n_tokens").cast("double")) /
            sqrt(col("__max").cast("double")), 6).as("temp_weight"))
  }

  /** Sequence packing — assign each document a (shard, pack, offset)
    * slot in the concatenate-then-chunk layout pre-training batch
    * builders use: documents stream in doc-id order within a shard,
    * token offsets accumulate, and context windows of `budget` tokens
    * are cut at fixed boundaries (documents may straddle a cut — the
    * standard concat-and-chunk scheme). The running offset is an exact
    * integer window sum per shard and the pack index/offset are
    * integer div/mod on it — exact for ANY budget, deterministic
    * everywhere. Parallelism = nShards independent sorted windows: each
    * shard is one sort partition, so the plan scales by adding shards,
    * never by growing a single global sort. */
  def packSequences(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", nShards: Int = 8,
                    budget: Long = 512L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol).as("doc_id"),
        (col(idCol) % nShards).cast("long").as("shard"),
        size(TextOps.tokens(lower(col(textCol)))).cast("long")
          .as("n_tokens"))
      .withColumn("__start", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"__start div ${budget}L").as("pack_id"),
        pmod(col("__start"), lit(budget)).as("pack_offset"))
  }

  /** [[packSequences]] driven by a LEARNED tokenizer instead of the
    * whitespace count — the composed pretraining data path
    * (train BPE → tokenize corpus → pack fixed-budget sequences) as
    * one pinned operator, the same seam-free-composition claim
    * rag_retrieve makes for the retrieval stack. Token counts come
    * from [[TextOps.bpeTokenize]] under a [[TextOps.bpeTrain]]-induced
    * vocabulary; packing is the identical shard-local prefix-sum
    * window. Docs with zero tokens emit no row (they pack nothing —
    * the tokenize contract). Scale: tokenize's vocab join + ONE
    * window over (shard, doc_id) — shard keys are uniform by
    * construction. */
  def bpePack(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", rounds: Int = 12,
              nShards: Int = 8, budget: Long = 512L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    TextOps.bpeTokenize(docs, rounds, idCol, textCol)
      .select(col("doc_id"),
        (col("doc_id") % nShards).cast("long").as("shard"),
        col("n_bpe_tokens"))
      .withColumn("__start", sum("n_bpe_tokens").over(w) - col("n_bpe_tokens"))
      .select(col("doc_id"), col("shard"), col("n_bpe_tokens"),
        expr(s"__start div ${budget}L").as("pack_id"),
        pmod(col("__start"), lit(budget)).as("pack_offset"))
  }

  /** The END-TO-END corpus-curation pipeline as ONE operator — what a
    * CCNet/RefinedWeb-style preprocessing run actually executes, each
    * stage an already-pinned lane, composed seam-free (the
    * rag_retrieve claim for the curation leg):
    *
    *   1. model-based quality filter — keep docs the trained NB
    *      classifier labels 'pos' ([[TextOps.nbQualityClassifier]]);
    *   2. corpus-boilerplate removal over the SURVIVORS — block df
    *      recomputed on the filtered corpus ([[Dedup.boilerplateDedup]]);
    *   3. exact dedup of the SCRUBBED text — first occurrence (min
    *      doc_id) per post-scrub text survives, [[Dedup.exact]]'s
    *      canonical rule (scrubbing first matters: docs differing only
    *      in boilerplate become exact dups only after stage 2);
    *   4. tokenizer induction on the CURATED text + tokenize + pack
    *      ([[bpePack]] = [[TextOps.bpeTrain]]/[[TextOps.bpeTokenize]]
    *      feeding [[packSequences]]'s window).
    *
    * Docs scrubbed to nothing by stage 2 collapse to one empty
    * survivor in stage 3, which tokenizes to zero and emits no pack
    * row. Scale: each stage's own shape (all linear, term/hash
    * equi-joins, one md5-keyed window, vocab-frame training); stages
    * hand off doc-granular frames, so nothing materializes beyond the
    * stage outputs. */
  def curateCorpus(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", rounds: Int = 12,
                   nShards: Int = 8, budget: Long = 512L): DataFrame = {
    // NOT checkpointed: stage-2 consumes the survivors twice (block-df
    // + scrub join-back), but both consumers live in ONE plan, where
    // Spark's ReusedExchange already shares the NB subtree's shuffles —
    // an eager checkpoint here materializes the survivors' full text
    // for nothing (measured: 4.2 s → 7.9 s isolated at sf0.1)
    val kept = docs.join(
      TextOps.nbQualityClassifier(docs, idCol, textCol)
        .filter(col("nb_label") === "pos")
        .select(col("doc_id").as("__keep_id")),
      col(idCol) === col("__keep_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    // checkpoint the curated text once: BPE training and the tokenize
    // join both read it (12 collect rounds would re-run stages 1-3)
    val cleaned = Dedup.boilerplateDedup(kept, idCol, textCol)
      .select(col("doc_id"), col("text_clean").as("text"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    bpePack(cleaned, rounds = rounds, nShards = nShards, budget = budget)
  }

  /** Leakage-safe train/val/test split: a plain per-document hash
    * split puts near-duplicates on BOTH sides of the cut — the eval
    * set then leaks into training and the val/test numbers are
    * fiction. This routes every member of a near-dup cluster (the
    * MinHash-LSH pair graph's connected components,
    * [[Dedup.dedupClusters]]) to ONE side by hashing the CLUSTER id
    * instead of the document id; unclustered documents hash their own
    * id. Same dyadic u ∈ [0,1) construction as [[stratifiedSample]]
    * (first 12 md5 hex digits over 2^48 — bit-deterministic in any
    * IEEE engine), compared against the raw split fractions in both
    * engines, so the side a cluster lands on is a pure function of its
    * canonical id at any scale and any retry. Cluster sides move
    * whole clusters, so realized fractions are approximate — the
    * price of a leak-free cut.
    *
    * Scale: the cluster map is LSH-linear + shallow CC (see
    * dedupClusters); the split itself is a map plus one equi-join of
    * the corpus against the (much smaller) clustered-doc map. */
  def leakSafeSplit(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    valFrac: Double = 0.1, testFrac: Double = 0.1,
                    threshold: Double = 0.5,
                    salt: String = "p5"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1.0,
      "split fractions must be non-negative and sum below 1")
    val clusters = Dedup.dedupClusters(docs, idCol, textCol, threshold)
      .select(col("doc_id").as("__cdoc"), col("cluster_id"))
    val u = conv(substring(
        md5(concat(col("split_key").cast("string"), lit(":" + salt))),
        1, 12), 16, 10)
      .cast("long").cast("double") / lit(281474976710656.0)
    docs.select(col(idCol).as("doc_id"))
      .join(clusters, col("doc_id") === col("__cdoc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_key"))
      .withColumn("__u", u)
      .select(col("doc_id"), col("split_key"),
        Num.roundLike(col("__u"), 6).as("u"),
        when(col("__u") < testFrac, "test")
          .when(col("__u") < testFrac + valFrac, "val")
          .otherwise("train").as("split"))
  }

  /** Cluster-balanced mixture weights — [[mixtureWeights]] with the
    * stratum coming from EMBEDDING-SPACE clustering instead of a
    * source label: assign every vector its nearest coarse centroid
    * ([[Similarity.ivfAssign]] against a shared codebook), then emit
    * per-cluster counts, exact corpus share, and the √-temperature
    * up-weight for small clusters. This is the semantic-balancing
    * step web-scale pipelines run when source labels are too coarse
    * (topic skew inside one crawl): cluster, then re-weight the
    * mixture by cluster. Same determinism as mixtureWeights — integer
    * counts, correctly-rounded sqrt/div chains; the assignment's
    * argmax orders by 6-dp-rounded cosine with centroid-id tie-break
    * (the s2 scheme). Scale: one broadcast-codebook scan + one
    * k-row groupBy; nothing grows faster than the corpus. */
  def clusterMixture(emb: DataFrame, cb: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val per = Similarity.ivfAssign(emb, cb, idCol, vecCol)
      .groupBy("centroid_id").agg(count(lit(1)).as("n_vecs"))
    val tot = per.agg(sum("n_vecs").as("__total"),
      max("n_vecs").as("__mx"))
    per.crossJoin(broadcast(tot))
      .select(col("centroid_id"), col("n_vecs"),
        Num.roundLike(
          col("n_vecs").cast("double") / col("__total"), 6).as("share"),
        Num.roundLike(
          sqrt(col("n_vecs").cast("double")) /
            sqrt(col("__mx").cast("double")), 6).as("temp_weight"))
  }

  /** DSIR-style importance weighting (Xie et al., NeurIPS 2023 — Data
    * Selection for Language Models via Importance Resampling): score
    * every document by how much likelier its hashed-bigram features are
    * under a TARGET domain's bag-of-ngrams model than under the raw
    * corpus's — the standard cheap proxy for "select web data that
    * looks like the curated target" at pre-training scale. Features
    * are bigrams hashed into `nBuckets` buckets (the DSIR hashing
    * trick: a bounded feature space regardless of vocabulary size);
    * both models are add-one-smoothed bucket frequencies; a document's
    * log importance weight is the sum of its bigrams' per-bucket
    * log-ratios λ_b = ln((ct_b+1)(Nr+B) / ((cr_b+1)(Nt+B))).
    *
    * Determinism at any partitioning (t10-style): each λ_b is rounded
    * to a SIGNED 6-dp fixed-point long (floor(λ·10⁶ + 0.5) — round
    * half toward +∞, identical in any IEEE engine), so per-document
    * sums are exact integer arithmetic and only the display value
    * divides back. The bucket hash is the house md5-prefix → 48-bit
    * construction. ln is the one transcendental (tfidf-class ≤1-ulp
    * caveat); its argument chains two correctly-rounded double
    * products and one division on exact integers.
    *
    * Scale shape: two passes over the corpus token stream (counting,
    * then scoring — same shape as [[TextOps.lmCrossEntropy]]); the
    * bucket-count shuffle is map-side combined down to `nBuckets`
    * rows, the λ table is an explicit broadcast (B rows, no shuffle on
    * the scoring side), and the per-doc re-agg is the only corpus-
    * sized shuffle. Nothing is quadratic; nothing depends on
    * vocabulary size. */
  def dsirWeights(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  targetCol: String = "source",
                  targetValue: String = "src0",
                  nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val B = nBuckets.toLong
    val bg = docs
      .select(col(idCol).as("doc_id"),
        (col(targetCol) === targetValue).as("__is_t"),
        TextOps.tokens(lower(col(textCol))).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), col("__is_t"),
        explode(transform(sequence(lit(0), size(col("__toks")) - 2),
          i => concat(element_at(col("__toks"), i + 1), lit(" "),
            element_at(col("__toks"), i + 2)))).as("__gram"))
      .select(col("doc_id"), col("__is_t"),
        pmod(conv(substring(md5(col("__gram")), 1, 12), 16, 10)
          .cast("long"), lit(B)).as("bucket"))
    val cnt = bg.groupBy("bucket")
      .agg(sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"),
        count(lit(1)).as("__cr"))
    val tot = cnt.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))
    val lam = cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor(log(((col("__ct") + 1).cast("double") *
            (col("__nr") + B).cast("double")) /
          ((col("__cr") + 1).cast("double") *
            (col("__nt") + B).cast("double"))) * 1e6 + lit(0.5))
          .cast("long").as("__lam"))
    bg.join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("__lam").as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        Num.roundLike(col("__s").cast("double") / 1e6, 6).as("log_weight"),
        (col("__s") > 0L).as("keep"))
  }

  /** Overlapping-window document chunking — the context-preparation
    * step every RAG / long-context pipeline runs before embedding or
    * packing: each document splits into windows of `chunkTokens`
    * whitespace tokens starting every `chunkTokens − overlap` tokens
    * (the trailing partial window kept — truncating it would silently
    * drop every document tail). Unlike [[packSequences]] (which
    * CONCATENATES docs into fixed budgets for training), chunking
    * PRESERVES per-document provenance: (doc_id, chunk_idx) is the
    * retrieval unit's identity, and overlap keeps boundary-spanning
    * sentences findable from both sides.
    *
    * Map-only at any corpus size: tokenize → window starts via
    * `sequence` → one posexplode — ≈ n_tokens/stride output rows per
    * doc, no shuffle, no state; the chunk text re-joins with single
    * spaces (the tokenizer's inverse up to whitespace runs, same as
    * d9/d10's reassembly convention). Empty docs yield zero chunks.
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text). */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 128,
                overlap: Int = 32, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(overlap < chunkTokens, "overlap must leave a positive stride")
    val stride = chunkTokens - overlap
    // tokenize behind an explode(array(...)) Generate boundary so the
    // slice lambda below reads a concrete array attribute — an outer
    // tokenizer expression inside a HOF lambda body re-evaluates once
    // PER CHUNK (the t14 lesson, TextOps.hashEmbed)
    val toksOf = docs.select(col(idCol).as("doc_id"),
      explode(array(TextOps.tokens(col(textCol)))).as("__t"))
    val t = col("__t")
    val starts = when(size(t) > 0,
        sequence(lit(0), size(t) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts,
      s => slice(t, s + 1, lit(chunkTokens)))
    toksOf
      .select(col("doc_id"), posexplode(chunks))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Deterministic training-order shuffle + fixed shard assignment —
    * the corpus-to-training-shards materialization step: every doc
    * gets a pseudo-random SHARD (first 12 md5 hex digits of id:salt,
    * mod nShards — the [[stratifiedSample]] keyed-uniform trick) and a
    * pseudo-random POSITION within its shard (rank of the md5 key,
    * doc-id tiebreak), so a shard writer emits each shard's docs in
    * `pos` order and the global read order is epoch-reproducible from
    * (salt, nShards) alone — no RNG state, retry/cluster-shape
    * independent.
    *
    * Scale: ONE shuffle (the per-shard rank window); shards are
    * md5-uniform so the nShards window partitions are balanced, and
    * parallelism = nShards independent sorted windows (the
    * [[packSequences]] regime) — no global-order single-task window,
    * which is exactly what this construction dodges: a total order
    * DEFINED as (shard, pos) needs no global sort to materialize.
    * Output: (doc_id, shard, pos). */
  def shardShuffle(docs: DataFrame, nShards: Int = 8,
                   idCol: String = "doc_id",
                   salt: String = "p9"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__k"), col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), key.as("__k"),
        pmod(conv(substring(key, 1, 12), 16, 10).cast("long"),
          lit(nShards.toLong)).as("shard"))
      .select(col("doc_id"), col("shard"),
        (row_number().over(w) - 1).cast("long").as("pos"))
  }

  /** Deterministic fractional upsampling — materialize the mixture a
    * weight table prescribes (e.g. [[mixtureWeights]]' temperature
    * weights rescaled to target epochs): a doc in a group with weight
    * w is emitted floor(w) times always, plus once more when its
    * keyed-uniform u < frac(w) — so realized group sizes hit w ×
    * n_docs in expectation with ZERO RNG state, and every copy is
    * identified by copy_idx (a trainer shuffles copies apart via
    * [[shardShuffle]] on (doc_id, copy_idx)).
    *
    * Scale: one broadcast join (the weight table is one row per
    * group) + a map-only posexplode — ≈ w copies per doc, no shuffle,
    * no state. Weights < 1 downsample (floor 0 + probabilistic keep:
    * exactly [[stratifiedSample]]'s acceptance), weights > 1
    * upsample; w ≤ 0 drops the group.
    * Output: (doc_id, group, copy_idx, n_copies). */
  def epochUpsample(docs: DataFrame, weights: DataFrame,
                    byCol: String = "source", idCol: String = "doc_id",
                    weightCol: String = "weight",
                    salt: String = "p10"): DataFrame = {
    val u = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 12),
      16, 10).cast("long").cast("double") / lit(281474976710656.0)
    val nCopies = (floor(col("__w")).cast("long") +
      when(u < col("__w") - floor(col("__w")), lit(1L)).otherwise(lit(0L)))
      .as("n_copies")
    docs
      .select(col(idCol).as("doc_id"), col(byCol).as("group"))
      .join(broadcast(weights.select(col(byCol).as("group"),
        col(weightCol).cast("double").as("__w"))), Seq("group"))
      .select(col("doc_id"), col("group"), nCopies)
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("group"),
        posexplode(sequence(lit(0L), col("n_copies") - 1)), col("n_copies"))
      .select(col("doc_id"), col("group"),
        col("col").as("copy_idx"), col("n_copies"))
  }
}
