package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — one broadcast of the (small)
  * probe set against a linear scan of the corpus; the scoring loop is
  * a fused native Catalyst expression inside whole-stage codegen
  * ([[graft.ext.expr.CosineSimExpr]], no UDF). Scale path: IVF coarse
  * quantization — assign every vector to its nearest centroid once
  * (linear scan), then probe only matching buckets; the probe-side join
  * becomes an equi-join on centroid id.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — the fused native
    * expression ([[graft.ext.expr.CosineSimExpr]]): one pass, three
    * scalar accumulators, no per-row allocation, inside whole-stage
    * codegen. Bit-identical to [[cosineComposed]] (CosineExprSpec), so
    * every oracle-pinned consumer keeps its hashes. Cast float arrays
    * to array<double> first for determinism. */
  def cosine(a: Column, b: Column): Column =
    graft.ext.expr.CosineSimExpr(a, b)

  /** The builtin-composed form cosine replaced: `zip_with` product +
    * three `aggregate` folds — four array walks and a zipped-array
    * allocation per row. Kept as the independently-derived semantic
    * reference the fused expression is proven against. */
  def cosineComposed(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Sign-pattern coarse bucket: concatenated signs of the first n
    * components — a trivial LSH family for near-dup blocking. */
  def signBucket(v: Column, n: Int): Column =
    concat_ws("", (0 until n).map(i =>
      when(element_at(v, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Brute-force cosine top-k: for every probe (small DF), the k most
    * similar corpus vectors. Probes broadcast; corpus scanned once; the
    * per-probe top-k is a window. Ranking uses the 6-dp-ROUNDED cosine
    * (the displayed precision) with the corpus id as tiebreak: raw
    * doubles differ across engines/summation orders in the last bits,
    * so ranking raw values makes near-ties engine-dependent — observed
    * as a rank-10 flip at 20k vectors. Rounded-key + id ordering is a
    * total order both engines reproduce. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("cosine"), 6).desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("cosine"), 6).as("cosine"))
  }

  /** IVF coarse codebook: a FIXED-size (k rows, independent of corpus
    * cardinality) deterministic sample — corpus vectors ranked by
    * md5(id), first k. A real deployment swaps this for sampled k-means
    * centroids; the assignment/probe plans below are identical either
    * way, and the broadcast is bounded by k at any corpus scale. */
  def codebook(corpus: DataFrame, k: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("centroid_id"),
        col(vecCol).cast("array<double>").as("centv"))
      .orderBy(md5(col("centroid_id").cast("string")), col("centroid_id"))
      .limit(k)

  /** IVF codebook refined by Lloyd (k-means) iterations, seeded from
    * the deterministic [[codebook]] sample: assign every vector to its
    * nearest current centroid (one scan against the k-row broadcast),
    * recompute each centroid as the element-wise mean of its members
    * (posexplode → groupBy(centroid, dim) avg → rebuild the array in
    * dim order), repeat. Empty clusters keep their previous centroid.
    * Every step is a DataFrame op — the broadcast stays bounded by k at
    * any corpus scale, and each iteration is one corpus scan + one
    * k·dim-sized aggregate. On clustered embeddings this concentrates
    * each cluster into one bucket, so probes reach target recall with
    * fewer nProbe buckets (the whole point of a trained codebook —
    * SimilaritySpec proves recall@10 ≥ 0.9 at nProbe=1 vs the sampled
    * codebook's miss). */
  def codebookKMeans(corpus: DataFrame, k: Int, iters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    var cb = codebook(corpus, k, idCol, vecCol)
    var it = 0
    while (it < iters) {
      val assigned = ivfAssign(corpus, cb, idCol, vecCol)
      // fixed-point mean (see pqCodebookKMeans): float avg() is
      // partition-order-dependent at the last ulp and this codebook
      // feeds pinned boolean certificates
      val means = assigned
        .select(col("centroid_id"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
        .groupBy(col("centroid_id"), col("__i"))
        .agg((sum(floor(col("__x") * 1e6 + lit(0.5)).cast("long"))
          .cast("double") / count(lit(1)) / 1e6).as("__m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("__i"), col("__m")))),
          e => e.getField("__m")).as("__new"))
      cb = cb.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__new"), col("centv")).as("centv"))
        .localCheckpoint(eager = true) // k rows; cut the per-iter lineage
      it += 1
    }
    cb
  }

  /** IVF index build: assign every corpus vector to its nearest centroid
    * of the given codebook — one linear scan against a k-row broadcast.
    * The codebook is an EXPLICIT parameter shared between assign and
    * probe (build it once with [[codebook]], persist it next to the
    * index): re-deriving it per call would rescan the corpus and —
    * worse — silently disagree with the index if the corpus drifted.
    * Returns the corpus with a `centroid_id` column. */
  def ivfAssign(corpus: DataFrame, cb: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      col(vecCol).cast("array<double>").as("__v"))
    // rounded-sim ordering: see bruteForceTopK — engine-stable ties
    val w = Window.partitionBy(col(idCol))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    c.crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col("__v"), col("centv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__sim", "centv", "__v")
  }

  /** The codebook rolled to ONE row — `cids[i]`/`cvs[i]` sorted by
    * centroid id — for the window-free assignment below (and any other
    * consumer that wants the whole codebook in a single broadcast
    * value rather than k rows). */
  def rollCodebook(cb: DataFrame): DataFrame =
    cb.groupBy()
      .agg(array_sort(collect_list(struct(col("centroid_id"),
        col("centv")))).as("__l"))
      .select(transform(col("__l"), e => e.getField("centroid_id"))
          .as("cids"),
        transform(col("__l"), e => e.getField("centv")).as("cvs"))

  /** Window-free IVF assignment: the nearest-centroid argmin as a fold
    * over the rolled codebook instead of [[ivfAssign]]'s row_number
    * window — bit-equal output (same rounded-sim compare, ties to the
    * LOWEST centroid id because the fold walks ids ascending with a
    * strict >), but legal on an UNBOUNDED STREAM, where non-time
    * windows are not: this is the form streaming ingest uses to keep
    * an IVF index current as vectors arrive
    * (EventStreams.ivfAssignStreamFromParquet). The codebook join is
    * stream-static on a constant key — a broadcast hash join, never a
    * shuffle.
    *
    * Documented divergence from batch [[ivfAssign]]: rows whose every
    * centroid similarity is NULL (malformed vector) are DROPPED here,
    * where the batch window keeps them under an arbitrary centroid
    * (row_number over all-NULL sort keys still ranks) — the stream
    * admits only rows it can place, the defensible ingest semantics.
    * An EMPTY codebook assigns nothing (all rows dropped) instead of
    * throwing: the fold is guarded so `sequence(0, -1)` + 0-index
    * `element_at` — both ANSI errors — are never evaluated. */
  def ivfAssignStreamable(corpus: DataFrame, cbRow: DataFrame,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val keyed = cbRow.withColumn("__k", lit(1))
    corpus.withColumn("__k", lit(1))
      .join(broadcast(keyed), Seq("__k"))
      .withColumn("__best",
        when(size(col("cids")) > 0,
          aggregate(sequence(lit(0), size(col("cids")) - 1),
            struct(lit(-1).cast("int").as("i"),
              lit(Double.NegativeInfinity).as("s")),
            (acc, i) => {
              val s = Num.roundLike(
                cosine(col(vecCol).cast("array<double>"),
                  element_at(col("cvs"), i + 1)), 6)
              when(s > acc.getField("s"),
                struct(i.cast("int").as("i"), s.as("s")))
                .otherwise(acc)
            }).getField("i"))
          .otherwise(lit(-1).cast("int")))
      .filter(col("__best") >= 0)
      .select(col(idCol), col(vecCol),
        element_at(col("cids"), col("__best") + 1).as("centroid_id"))
  }

  /** IVF top-k: probe only the nProbe nearest centroid buckets of the
    * SAME codebook the index was assigned with. The bucket-pruned scan
    * replaces the full linear scan — at 100 TB the corpus is
    * partitioned/bucketed BY centroid_id on disk so a probe touches
    * only its buckets' files. */
  def ivfTopK(assigned: DataFrame, cb: DataFrame, probes: DataFrame,
              k: Int, nProbe: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val centroids = cb
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    val probeBuckets = p.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col("pv"), col("centv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("centroid_id"))
    val c = assigned.select(col("centroid_id"), col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("cosine"), 6).desc, col("corpus_id"))
    probeBuckets.join(c, Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("cosine"), 6).as("cosine"))
  }


  /** Recall@k of ivfTopK against bruteForceTopK over the same probes —
    * the ANN quality certificate, computed as ONE DataFrame so the
    * driver's oracle gate can verify the number (and the target) rather
    * than trust it. Returns a single row (n_matched, n_total, recall,
    * meets_target). Note: on embeddings with no cluster structure
    * (isotropic vectors — the synthetic testdata), IVF recall is bounded
    * by the scanned corpus fraction ≈ nProbe/nCentroids regardless of
    * codebook quality; recall targets are met by tuning nProbe, exactly
    * the recall-vs-scan trade IVF deployments tune in production. */
  def ivfRecall(corpus: DataFrame, cb: DataFrame, probes: DataFrame,
                k: Int, nProbe: Int, target: Double = 0.9,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, cb, idCol, vecCol)
    val ivf = ivfTopK(assigned, cb, probes, k, nProbe, idCol, vecCol)
      .select(col("probe_id"), col("corpus_id"), lit(1).as("__hit"))
    val bf = bruteForceTopK(corpus, probes, k, idCol, vecCol)
    bf.join(ivf, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  // ------------------------------------------------------------------
  // Filtered (attribute-constrained) ANN: every production vector
  // store serves "top-k WHERE attr = x" (tenant scoping, language or
  // license filters). Strategy here is PRE-filtering at candidate
  // generation: the attribute equality joins INTO the bucket-probe
  // join key, so candidates shrink to same-bucket AND same-attribute
  // rows BEFORE any cosine is scored or shuffled — at 100 TB the
  // probe-side work scales with the filtered bucket slice, not the
  // corpus. (Post-filtering — search then drop — would need k/sel
  // oversampling and still score discarded rows.)
  // ------------------------------------------------------------------

  /** Brute-force filtered top-k: exact ground truth for the filtered
    * search — corpus rows with the probe's attribute value, ranked by
    * 6-dp cosine (same total order as [[bruteForceTopK]]). The cross
    * join becomes a broadcast HASH join on the attribute. */
  def bruteForceTopKFiltered(corpus: DataFrame, probes: DataFrame, k: Int,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             attrCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(attrCol).as("__attr"),
      col(vecCol).cast("array<double>").as("cv"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(attrCol).as("__attr"),
      col(vecCol).cast("array<double>").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("cosine"), 6).desc, col("corpus_id"))
    c.join(broadcast(p), Seq("__attr"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("cosine"), 6).as("cosine"))
  }

  /** Coarse assignment that KEEPS the filter attribute:
    * (idCol, attrCol, vecCol, centroid_id) — the persistable
    * filtered-index frame ([[writeIvfIndex]]/[[readIvfIndex]]
    * round-trip it for the served lifecycle). Assignment arithmetic
    * is [[ivfAssign]]'s exactly. */
  def ivfAssignAttr(corpus: DataFrame, cb: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    attrCol: String = "label"): DataFrame = {
    val wa = Window.partitionBy(col(idCol))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    corpus
      .select(col(idCol), col(attrCol),
        col(vecCol).cast("array<double>").as(vecCol))
      .crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col(vecCol), col("centv")))
      .withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(attrCol), col(vecCol), col("centroid_id"))
  }

  /** Each probe's nProbe nearest coarse buckets, attribute attached:
    * (probe_id, pv, __attr, centroid_id) — bounded by probes·nProbe. */
  private def filteredProbeBuckets(cb: DataFrame, probes: DataFrame,
                                   nProbe: Int, idCol: String,
                                   vecCol: String,
                                   attrCol: String): DataFrame = {
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    probes
      .select(col(idCol).as("probe_id"), col(attrCol).as("__attr"),
        col(vecCol).cast("array<double>").as("pv"))
      .crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col("pv"), col("centv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("__attr"), col("centroid_id"))
  }

  /** Score-and-rank over pre-filtered candidates: the
    * (centroid_id, attribute) equi-join, self-exclusion, per-probe
    * top-k by (6-dp cosine, id). */
  private def filteredSearchCore(a: DataFrame, probeBuckets: DataFrame,
                                 k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("cosine"), 6).desc, col("corpus_id"))
    probeBuckets.join(a, Seq("centroid_id", "__attr"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("cosine"), 6).as("cosine"))
  }

  /** The search stage over an attribute-carrying assigned frame
    * ([[ivfAssignAttr]]'s shape, fresh or reopened from a snapshot):
    * probe buckets as [[ivfTopK]], candidates keyed on
    * (centroid_id, attribute) — the pre-filter join. */
  def ivfSearchFiltered(assigned: DataFrame, cb: DataFrame,
                        probes: DataFrame,
                        k: Int, nProbe: Int = 2,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        attrCol: String = "label"): DataFrame = {
    val a = assigned.select(col("centroid_id"),
      col(attrCol).as("__attr"), col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    filteredSearchCore(a,
      filteredProbeBuckets(cb, probes, nProbe, idCol, vecCol, attrCol), k)
  }

  /** Centroid-partitioned index snapshot: the assigned frame lands as
    * one directory per coarse bucket (`centroid_id=<c>/`), so a serve
    * that probes nProbe of nCentroids buckets LISTS only those
    * directories — at 100 TB the scan IO is nProbe/nCentroids of the
    * index, enforced by the file index, not a row filter (the
    * chromosome-partitioned Serving snapshot precedent). */
  def writeIvfIndexPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite")
      .partitionBy("centroid_id").parquet(path)

  /** The pruned serve over a [[writeIvfIndexPartitioned]] snapshot:
    * probe buckets compute as usual (bounded probes × broadcast
    * codebook), their distinct centroid ids — ≤ probes·nProbe values —
    * collect to the driver (the bounded-dimension-list pattern of
    * Serving.geneSearchPruned) and push into the partitioned scan as a
    * LITERAL isin, which the FileIndex prunes at directory level.
    * Row-identical to [[ivfSearchFiltered]] over the full index.
    *
    * EAGER contract (unlike every other Similarity entry point, which
    * builds a lazy plan): the probe-bucket resolution runs Spark jobs
    * AT CALL TIME — a localCheckpoint plus the bounded
    * (≤ probes·nProbe) bucket-id collect the isin literal needs.
    * Merely constructing this frame therefore triggers work; callers
    * composing it lazily (bench harnesses, plan audits) see those jobs
    * on construction, not first action. An empty probe frame returns
    * an empty-but-schema'd result explicitly — a bare `isin()` with
    * zero values would otherwise still plan a full directory listing
    * just to scan nothing. */
  def ivfSearchFilteredPruned(index: DataFrame, cb: DataFrame,
                              probes: DataFrame,
                              k: Int, nProbe: Int = 2,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              attrCol: String = "label"): DataFrame = {
    val pb = filteredProbeBuckets(cb, probes, nProbe, idCol, vecCol, attrCol)
      .localCheckpoint(eager = true)
    val bucketIds = pb.select(col("centroid_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (bucketIds.isEmpty) {
      // no probes → no buckets: return the result schema with no rows
      // (and no partitioned-scan planning at all)
      return filteredSearchCore(
        index.limit(0)
          .select(col("centroid_id").cast("long").as("centroid_id"),
            col(attrCol).as("__attr"), col(idCol).as("corpus_id"),
            col(vecCol).cast("array<double>").as("cv")), pb, k)
    }
    val a = index
      .filter(col("centroid_id").isin(bucketIds: _*))
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col(attrCol).as("__attr"), col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv"))
    filteredSearchCore(a, pb, k)
  }

  /** IVF filtered top-k in one call: [[ivfAssignAttr]] then
    * [[ivfSearchFiltered]] — the cold shape; the served lifecycle
    * persists the assigned frame and reopens it instead. */
  def ivfTopKFiltered(corpus: DataFrame, cb: DataFrame, probes: DataFrame,
                      k: Int, nProbe: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      attrCol: String = "label"): DataFrame =
    ivfSearchFiltered(ivfAssignAttr(corpus, cb, idCol, vecCol, attrCol),
      cb, probes, k, nProbe, idCol, vecCol, attrCol)

  /** Recall@k of the filtered IVF search vs the filtered exact scan —
    * one row (n_matched, n_total, recall, meets_target), the s2
    * certificate shape. On isotropic embeddings the filter is
    * geometry-independent, so recall stays ≈ nProbe/nCentroids exactly
    * as unfiltered IVF — the property this certificate pins. */
  def filteredIvfRecall(corpus: DataFrame, cb: DataFrame, probes: DataFrame,
                        k: Int, nProbe: Int, target: Double = 0.7,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        attrCol: String = "label"): DataFrame = {
    val ivf = ivfTopKFiltered(corpus, cb, probes, k, nProbe,
        idCol, vecCol, attrCol)
      .select(col("probe_id"), col("corpus_id"), lit(1).as("__hit"))
    val bf = bruteForceTopKFiltered(corpus, probes, k, idCol, vecCol, attrCol)
    bf.join(ivf, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ): compress each vector to m sub-centroid
  // ids (here 8 codes of 4 bits = 4 bytes vs 256 bytes of floats — the
  // memory step that makes billion-vector ANN fit a cluster), score
  // probes against CODES via an asymmetric distance computation (ADC)
  // lookup table, never touching the raw corpus floats. Composes with
  // IVF (IVF-PQ) by running inside each probed bucket unchanged.
  // ------------------------------------------------------------------

  /** Fixed-point squared-L2 between two equal-length double arrays:
    * each (x−y)² term is rounded to 6 dp and scaled to an exact LONG
    * before summing, so every PQ comparison — argmin ties, ADC sums —
    * is pure integer arithmetic with NO float-summation-order
    * dependence across engines or partitionings. */
  private def sqDistScaled(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor((x - y) * (x - y) * 1e6 + lit(0.5)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** PQ sub-codebooks from the SAME deterministic md5-ranked sample as
    * [[codebook]]: sample ks vectors, split each into m contiguous
    * dim/m subvectors; centroid c of subspace j is sample c's j-th
    * slice. Returned as ONE row — `cbs[j][c]` (m × ks × dim/m doubles,
    * bounded by m·ks·dim at any corpus scale) — so assignment and ADC
    * are map-only against a broadcast. A production system swaps the
    * sample for per-subspace k-means exactly like [[codebookKMeans]];
    * the assignment/scoring plans are identical either way. */
  def pqCodebook(corpus: DataFrame, m: Int = 8, ks: Int = 16,
                 dim: Int = 64, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    require(sub * m == dim, s"dim $dim must split into $m subspaces")
    val w = Window.orderBy(md5(col("__sid").cast("string")), col("__sid"))
    corpus
      .filter(size(col(vecCol)) === dim) // no malformed codebook slots
      .select(col(idCol).as("__sid"),
        col(vecCol).cast("array<double>").as("__v"))
      .orderBy(md5(col("__sid").cast("string")), col("__sid"))
      .limit(ks)
      .select((row_number().over(w) - 1).as("__c"),
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__v"), j * sub + 1, lit(sub))).as("__subs"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("__c"), col("__subs"))))
        .as("__l"))
      .select(transform(sequence(lit(0), lit(m - 1)),
        j => transform(col("__l"),
          e => element_at(e.getField("__subs"), j + 1))).as("cbs"))
  }

  /** PQ sub-codebooks refined by Lloyd iterations, seeded from the
    * deterministic [[pqCodebook]] sample — the trained variant, exactly
    * [[codebookKMeans]]' role for the coarse quantizer. All m subspace
    * k-means run as ONE DataFrame chain per iteration: explode the
    * corpus to (id, j, subv) rows, assign each subvector to its nearest
    * current sub-centroid (fixed-point argmin, broadcast codebook),
    * recompute each (j, centroid) as the element-wise mean of its
    * members, rebuild the single-row cbs. Empty cells keep their
    * previous centroid. Each iteration is one corpus scan + an
    * m·ks·(dim/m)-sized aggregate; the codebook stays a bounded
    * broadcast at any corpus scale. Training tightens per-subspace
    * quantization cells around the data's marginal structure, which is
    * what lifts ADC recall when the corpus is not isotropic. */
  def pqCodebookKMeans(corpus: DataFrame, m: Int = 8, ks: Int = 16,
                       dim: Int = 64, iters: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    var pcb = pqCodebook(corpus, m, ks, dim, idCol, vecCol)
    val subs = corpus.filter(size(col(vecCol)) === dim)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col(vecCol).cast("array<double>"),
            j * sub + 1, lit(sub)))).as(Seq("__j", "__subv")))
    var it = 0
    while (it < iters) {
      val assigned = subs.crossJoin(broadcast(pcb))
        .select(col("__j"), col("__subv"),
          aggregate(sequence(lit(0), lit(ks - 1)),
            struct(lit(-1).cast("int").as("c"),
              lit(Long.MaxValue).as("d")),
            (acc, c) => {
              val d = sqDistScaled(col("__subv"),
                element_at(element_at(col("cbs"), col("__j") + 1), c + 1))
              when(d < acc.getField("d"),
                struct(c.cast("int").as("c"), d.as("d")))
                .otherwise(acc)
            }).getField("c").as("__c"))
      // fixed-point mean, like every other PQ compare: avg() of doubles
      // is last-ulp ORDER-dependent (float add is non-associative across
      // partitions) and this feeds a pinned boolean certificate — sum
      // the 1e-6-quantized longs (exact, associative, any partitioning)
      // and divide once. Headroom: |x|·1e6 ≲ 1e7 per member leaves
      // ~1e11 members per (j,c,i) cell before long overflow.
      val means = assigned
        .select(col("__j"), col("__c"),
          posexplode(col("__subv")).as(Seq("__i", "__x")))
        .groupBy(col("__j"), col("__c"), col("__i"))
        .agg((sum(floor(col("__x") * 1e6 + lit(0.5)).cast("long"))
          .cast("double") / count(lit(1)) / 1e6).as("__mx"))
        .groupBy(col("__j"), col("__c"))
        .agg(transform(array_sort(collect_list(struct(col("__i"),
          col("__mx")))), e => e.getField("__mx")).as("__mean"))
      // rebuild cbs[j][c], keeping the previous centroid where a cell
      // went empty (no member subvectors this round)
      val prev = pcb
      pcb = means
        .groupBy(col("__j"))
        .agg(map_from_arrays(collect_list(col("__c")),
          collect_list(col("__mean"))).as("__bym"))
        .groupBy()
        .agg(map_from_arrays(collect_list(col("__j")),
          collect_list(col("__bym"))).as("__byj"))
        .crossJoin(broadcast(prev))
        // try_element_at, NOT element_at: the maps are keyed only by
        // (j, c) pairs that had members this round — a plain map lookup
        // on an empty cell's missing key throws MAP_KEY_DOES_NOT_EXIST
        // under Spark 4 ANSI; try_ yields NULL and the coalesce keeps
        // the previous centroid, which is the documented empty-cell rule
        .select(transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(ks - 1)), c =>
            coalesce(
              try_element_at(try_element_at(col("__byj"), j),
                c.cast("int")),
              element_at(element_at(col("cbs"), j + 1), c + 1))))
          .as("cbs"))
        .localCheckpoint(eager = true) // 1 row; cut per-iter lineage
      it += 1
    }
    pcb
  }

  /** PQ encode: per vector the m nearest-sub-centroid ids (ties break
    * to the LOWEST centroid id — the same total order the SQL oracle's
    * `ORDER BY d, cid` row_number picks). One corpus scan × a
    * single-row broadcast codebook: map-only, zero shuffle, whole
    * argmin inside codegen'd array lambdas. Returns (id, codes[m]). */
  def pqAssign(corpus: DataFrame, pcb: DataFrame, m: Int = 8,
               ks: Int = 16, dim: Int = 64, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    // a short/null vector would null every subspace distance, leave
    // the argmin at its -1 sentinel, and crash ADC's 1-based table
    // lookup under ANSI — drop non-conforming vectors at index build
    corpus.filter(size(col(vecCol)) === dim)
      .crossJoin(broadcast(pcb))
      .select(col(idCol),
        pqCodes(col(vecCol).cast("array<double>"), m, ks, dim)
          .as("codes"))

  /** The m nearest-sub-centroid ids of one vector against the broadcast
    * `cbs` column in scope — the shared encode expression of
    * [[pqAssign]] and [[buildIvfAdcIndex]] (ties to the LOWEST centroid
    * id, the total order every PQ consumer shares). */
  private def pqCodes(v: Column, m: Int, ks: Int, dim: Int): Column = {
    val sub = dim / m
    transform(sequence(lit(0), lit(m - 1)), j => {
      val cents = element_at(col("cbs"), j + 1)
      val subv = slice(v, j * sub + 1, lit(sub))
      aggregate(sequence(lit(0), lit(ks - 1)),
        struct(lit(-1).cast("int").as("c"),
          lit(Long.MaxValue).as("d")),
        (acc, c) => {
          val d = sqDistScaled(subv, element_at(cents, c + 1))
          when(d < acc.getField("d"),
            struct(c.cast("int").as("c"), d.as("d")))
            .otherwise(acc)
        }).getField("c")
    })
  }

  /** PQ top-k via ADC: each probe precomputes its m×ks distance table
    * against the broadcast codebook (fixed-point longs), then every
    * corpus CODE row is scored by m table lookups and an exact integer
    * sum — the raw corpus floats are never read at query time, which
    * is the entire PQ bargain (4-byte codes + k·dim table vs 256-byte
    * vectors per candidate). One probe-side map, one corpus-code scan
    * × broadcast tables, one probe-partitioned top-k window. */
  def pqTopK(codes: DataFrame, pcb: DataFrame, probes: DataFrame,
             k: Int, m: Int = 8, ks: Int = 16, dim: Int = 64,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    adcScoreTopK(
      codes.select(col(idCol).as("corpus_id"), col("codes"))
        .crossJoin(broadcast(adcTables(probes, pcb, m, ks, dim, idCol,
          vecCol))),
      k, m)

  /** One m×ks fixed-point ADC table per WELL-FORMED probe — the
    * shared probe-side build of [[pqTopK]] and [[ivfPqTopK]] (a single
    * row per probe; computing it per probed bucket would redo the
    * m·ks·dim distance work nProbe times). Short/null probes are
    * dropped by the same guard as [[pqAssign]]. */
  private def adcTables(probes: DataFrame, pcb: DataFrame, m: Int,
                        ks: Int, dim: Int, idCol: String,
                        vecCol: String): DataFrame = {
    val sub = dim / m
    probes.filter(size(col(vecCol)) === dim)
      .crossJoin(broadcast(pcb))
      .select(col(idCol).as("probe_id"),
        transform(sequence(lit(0), lit(m - 1)), j => {
          val cents = element_at(col("cbs"), j + 1)
          val subv = slice(col(vecCol).cast("array<double>"),
            j * sub + 1, lit(sub))
          transform(sequence(lit(0), lit(ks - 1)),
            c => sqDistScaled(subv, element_at(cents, c + 1)))
        }).as("dtab"))
  }

  /** Shared ADC scoring: candidates carry (probe_id, corpus_id, codes,
    * dtab); score = m exact-integer table lookups, rank by (adc,
    * corpus_id) per probe — ONE total-order rule for every PQ consumer,
    * so the [[ivfPqTopK]] == pruned-[[pqTopK]] equivalence is
    * structural, not a convention three copies must keep in sync. */
  private def adcScoreTopK(cand: DataFrame, k: Int, m: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("__adc"), col("corpus_id"))
    cand
      .filter(col("corpus_id") =!= col("probe_id"))
      .withColumn("__adc",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
          (acc, j) => acc + element_at(element_at(col("dtab"), j + 1),
            element_at(col("codes"), j + 1) + 1)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("__adc") / 1e6, 6).as("adc_dist"))
  }

  /** Exact L2 top-k — the ADC ground truth [[pqRecall]] certifies
    * against. Same broadcast-probe linear-scan shape as
    * [[bruteForceTopK]]; the rank key is the fixed-point
    * [[sqDistScaled]] long, an exact total order every engine
    * reproduces bit-for-bit. The malformed-vector guard matters for
    * CORRECTNESS here, not just crash-safety: a short/null vector's
    * NULL distance would sort NULLS FIRST under Spark's ascending
    * order and claim rank 1 for every probe (DuckDB sorts them last —
    * an engine divergence on dirty data). */
  def bruteForceTopKL2(corpus: DataFrame, probes: DataFrame, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("__d"), col("corpus_id"))
    c.crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        sqDistScaled(col("pv"), col("cv")).as("__d"))
      // dimension-free malformed guard: a length mismatch or null
      // vector nulls the fixed-point distance — drop the pair
      .filter(col("__d").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("__d") / 1e6, 6).as("l2_dist"))
  }

  /** Recall@k of the ADC code search against the exact L2 scan — the
    * PQ quality certificate, one verifiable row like [[ivfRecall]]:
    * (n_matched, n_total, recall, meets_target). */
  def pqRecall(corpus: DataFrame, pcb: DataFrame, probes: DataFrame,
               k: Int, target: Double, m: Int = 8, ks: Int = 16,
               dim: Int = 64, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val codes = pqAssign(corpus, pcb, m, ks, dim, idCol, vecCol)
    val pq = pqTopK(codes, pcb, probes, k, m, ks, dim, idCol, vecCol)
      .select(col("probe_id"), col("corpus_id"), lit(1).as("__hit"))
    bruteForceTopKL2(corpus, probes, k, idCol, vecCol)
      .join(pq, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  /** IVF-PQ index build: the coarse bucket id AND the PQ codes in ONE
    * frame — the layout [[ivfPqTopK]] queries and [[writeIvfIndex]]
    * persists (partitioned by centroid_id, so a probe's nProbe buckets
    * are a partition-pruned read of 4-byte codes). Built once at index
    * time; queries never touch the raw floats or re-join the corpus. */
  def buildIvfPqIndex(corpus: DataFrame, cb: DataFrame, pcb: DataFrame,
                      m: Int = 8, ks: Int = 16, dim: Int = 64,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    ivfAssign(corpus, cb, idCol, vecCol).drop(vecCol)
      .join(pqAssign(corpus, pcb, m, ks, dim, idCol, vecCol), Seq(idCol))

  /** IVF-PQ query: the billion-scale composition — IVF prunes the
    * index to the probe's nProbe coarse buckets, PQ's ADC scores ONLY
    * those buckets' codes. `index` is [[buildIvfPqIndex]]'s frame
    * (idCol, centroid_id, codes), built with the SAME codebooks passed
    * here — the explicit-codebook contract of [[ivfTopK]]. Query plan:
    * probe buckets and per-probe ADC tables are bounded broadcasts,
    * the bucket prune is a broadcast equi-join against the index scan
    * (with the partitioned disk layout, a partition-pruned read of
    * nProbe/k_coarse of the codes), and scoring is map-only integer
    * lookups — no corpus-sized shuffle anywhere in the query path. */
  def ivfPqTopK(index: DataFrame, cb: DataFrame, pcb: DataFrame,
                probes: DataFrame, k: Int,
                nProbe: Int = 2, m: Int = 8, ks: Int = 16, dim: Int = 64,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val p = probes.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("pv"))
    // nProbe nearest coarse buckets per probe (same rule as ivfTopK)
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    val probeBuckets = p.crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col("pv"), col("centv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("centroid_id"))
    // prune FIRST: broadcast the bounded (probe × bucket) pairs
    // against the index scan, then attach each probe's ADC table
    val cand = index
      .select(col("centroid_id"), col(idCol).as("corpus_id"),
        col("codes"))
      .join(broadcast(probeBuckets), Seq("centroid_id"))
      .join(broadcast(adcTables(probes, pcb, m, ks, dim, idCol, vecCol)),
        Seq("probe_id"))
    adcScoreTopK(cand, k, m)
  }

  /** IVFADC residuals: each well-formed vector minus its coarse
    * centroid. Quantizing the RESIDUAL instead of the raw vector spends
    * the whole PQ bit budget on the within-cluster offset — the coarse
    * cluster's position is already encoded by centroid_id for free — so
    * ADC distances are tighter at the same 4-byte code size (the IVFADC
    * layout of Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011, §IV). One assignment scan + a k-row broadcast
    * join; map-only after the assign. */
  def ivfResiduals(corpus: DataFrame, cb: DataFrame,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    ivfAssign(corpus, cb, idCol, vecCol)
      .join(broadcast(cb), Seq("centroid_id"))
      .select(col(idCol), col("centroid_id"),
        zip_with(col(vecCol).cast("array<double>"), col("centv"),
          (x, y) => x - y).as("residual"))

  /** Residual-trained PQ sub-codebooks: [[pqCodebookKMeans]] run over
    * the residual distribution (which is what the index encodes —
    * training on raw vectors would place centroids where no residual
    * lives). Same bounded single-row broadcast shape. */
  def pqResidualCodebook(corpus: DataFrame, cb: DataFrame, m: Int = 8,
                         ks: Int = 16, dim: Int = 64, iters: Int = 2,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    pqCodebookKMeans(ivfResiduals(corpus, cb, idCol, vecCol),
      m, ks, dim, iters, idCol, "residual")

  /** IVFADC index build: (id, coarse centroid_id, PQ codes of the
    * RESIDUAL) in one pass over the residual frame — no id re-join, no
    * corpus-sized shuffle beyond the assignment scan. Persist with
    * [[writeIvfIndex]] (partitionBy centroid_id) exactly like the plain
    * IVF-PQ index. */
  def buildIvfAdcIndex(corpus: DataFrame, cb: DataFrame, pcbRes: DataFrame,
                       m: Int = 8, ks: Int = 16, dim: Int = 64,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    ivfResiduals(corpus, cb, idCol, vecCol)
      .filter(size(col("residual")) === dim)
      .crossJoin(broadcast(pcbRes))
      .select(col(idCol), col("centroid_id"),
        pqCodes(col("residual"), m, ks, dim).as("codes"))

  /** IVFADC query: like [[ivfPqTopK]] but the ADC table is built from
    * the PROBE'S RESIDUAL against each probed bucket's centroid — the
    * table is per (probe, bucket), not per probe, because the probe
    * residual depends on which bucket is being scanned. Cost stays
    * bounded: nProbe × m × ks sub-distances per probe, all broadcast;
    * the index side is still a partition-pruned scan of 4-byte codes
    * scored by integer lookups. */
  def ivfAdcTopK(index: DataFrame, cb: DataFrame, pcbRes: DataFrame,
                 probes: DataFrame, k: Int,
                 nProbe: Int = 2, m: Int = 8, ks: Int = 16, dim: Int = 64,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val sub = dim / m
    val p = probes.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("pv"))
    // nProbe nearest coarse buckets per probe (same rule as ivfTopK),
    // keeping centv: the probe residual is bucket-specific
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    val pb = p.crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col("pv"), col("centv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("centroid_id"),
        zip_with(col("pv"), col("centv"), (x, y) => x - y).as("__pres"))
    // one m×ks fixed-point table per (probe, bucket) — bounded broadcast
    val tabs = pb.crossJoin(broadcast(pcbRes))
      .select(col("probe_id"), col("centroid_id"),
        transform(sequence(lit(0), lit(m - 1)), j => {
          val cents = element_at(col("cbs"), j + 1)
          val subv = slice(col("__pres"), j * sub + 1, lit(sub))
          transform(sequence(lit(0), lit(ks - 1)),
            c => sqDistScaled(subv, element_at(cents, c + 1)))
        }).as("dtab"))
    val cand = index
      .select(col("centroid_id"), col(idCol).as("corpus_id"), col("codes"))
      .join(broadcast(tabs), Seq("centroid_id"))
    adcScoreTopK(cand, k, m)
  }

  /** Persist an IVF-assigned corpus partitioned BY centroid: the disk
    * layout that makes ivfTopK's bucket pruning physical — a probe with
    * nProbe buckets reads only those buckets' files (partition pruning
    * at the parquet source), so query cost scales with k/nCentroids of
    * the corpus instead of the corpus. Persist the codebook NEXT TO the
    * index with [[writeCodebook]] — assign and probe must share it. */
  def writeIvfIndex(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.parquet(path)

  /** SQ8 range model: per-dimension (lo, hi) over the corpus, rolled to
    * ONE row (`los`, `spans` arrays indexed by dimension) — the scalar
    * quantizer's whole training state, broadcast everywhere it's used.
    * One posexplode fan-out (corpus × dim rows) into a 64-key groupBy
    * that map-side combines to dim×partitions rows — the same shuffle
    * shape as a global agg, independent of corpus size. */
  def sq8Range(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus.select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("__lo"), max(col("col")).as("__hi"))
      .agg(array_sort(collect_list(struct(col("pos"), col("__lo"),
        col("__hi")))).as("__r"))
      .select(transform(col("__r"), s => s.getField("__lo")).as("los"),
        transform(col("__r"), s => s.getField("__hi") - s.getField("__lo"))
          .as("spans"))

  /** SQ8 encode: each vector to dim uint8 codes,
    * `floor((x − lo)/span · 255 + 0.5)` clamped to [0, 255] (flat
    * dimensions → 0). 4 bytes of float32 become 1 byte per dimension —
    * map-only against the broadcast 1-row range model, and every code
    * is exact integer output of one IEEE double expression, so the
    * codes (and everything ranked from them) are engine-reproducible
    * without fixed-point machinery. */
  def sq8Encode(corpus: DataFrame, rng: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(rng))
      .select(col("corpus_id"),
        sq8Codes(col("__v"), col("los"), col("spans")).as("codes"))

  /** The SQ8 code expression itself, shared verbatim by the batch and
    * streaming encoders so their outputs are bit-equal by
    * construction. */
  private def sq8Codes(v: Column, los: Column, spans: Column): Column =
    zip_with(zip_with(v, los, (x, l) => x - l), spans, (c, s) =>
      when(s > 0, least(greatest(
        floor(c / s * 255 + lit(0.5)), lit(0.0)), lit(255.0)))
        .otherwise(lit(0.0)).cast("long"))

  /** Stream-legal SQ8 encode: the identical [[sq8Codes]] expression,
    * but the 1-row range model arrives via a constant-key broadcast
    * hash join (the [[ivfAssignStreamable]] trick — streams reject
    * cross joins). Stateless, so ingest encodes at scan speed and the
    * emitted row set is order-independent: batch [[sq8Encode]] is the
    * exact oracle. */
  def sq8EncodeStreamable(corpus: DataFrame, rng: DataFrame,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("__k", lit(1))
      .join(broadcast(rng.withColumn("__k", lit(1))), Seq("__k"))
      .select(col(idCol).as("corpus_id"),
        sq8Codes(col(vecCol).cast("array<double>"), col("los"),
          col("spans")).as("codes"))

  /** SQ8 top-k with exact re-rank: asymmetric scan — the probe's RAW
    * vector against each corpus vector RECONSTRUCTED from its codes
    * (`code·span/255 + lo`) ranks a candidate pool of `rerank`·k per
    * probe; only those candidates re-join the float corpus for the
    * exact cosine that orders the final k. The scan phase reads 1 byte
    * per dimension instead of 4 — at 100 TB the index is a quarter the
    * size and the scan a quarter the memory traffic of [[bruteForceTopK]]
    * (the canonical SQ8 trade, e.g. faiss `ScalarQuantizer` QT_8bit) —
    * and the float fetch is an equi-join probing `rerank`·k·|probes|
    * rows, broadcast under AQE. Approximate and exact ranks both order
    * by the 6-dp-rounded score with id tiebreak ([[bruteForceTopK]]'s
    * total-order rule). */
  def sq8TopK(corpus: DataFrame, probes: DataFrame, k: Int,
              rerank: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val rng = sq8Range(corpus, vecCol)
    val codes = sq8Encode(corpus, rng, idCol, vecCol)
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val rec = zip_with(zip_with(col("codes"), col("spans"),
      (c, s) => c * s / 255.0), col("los"), (t, l) => t + l)
    val wApprox = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__approx"), 6).desc, col("corpus_id"))
    val cand = codes.crossJoin(broadcast(rng))
      .select(col("corpus_id"), rec.as("__rv"))
      .crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("__rv")).as("__approx"))
      .withColumn("__arn", row_number().over(wApprox))
      .filter(col("__arn") <= k * rerank)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val wExact = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__cos"), 6).desc, col("corpus_id"))
    cand.join(c, Seq("corpus_id"))
      .join(p.select(col("probe_id"), col("pv").as("__pv2")), Seq("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("__pv2"), col("cv")).as("__cos"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("__cos"), 6).as("cosine"))
  }

  /** IVF-SQ8: the other quantized-index composition (beside
    * [[ivfPqTopK]]) — IVF prunes to the probe's nProbe coarse buckets,
    * the 8-bit codes of ONLY those buckets are reconstructed and
    * approximate-scored, and the exact re-rank touches `rerank`·k
    * floats per probe. Versus IVF-PQ: 8× bigger codes but no trained
    * sub-codebooks and reconstruction error per dimension ≤ span/510,
    * so the approximate ranking is close enough that the exact re-rank
    * recovers brute-force order at small `rerank` — the standard
    * middle point of the faiss index menu (`IVF…,SQ8`). Query path:
    * bounded broadcasts (codebook, range model, probes) + the bucket
    * equi-join on the index scan + the `rerank`·k·|probes|-row float
    * fetch — no corpus-sized shuffle; with [[writeIvfIndex]]'s
    * partitionBy(centroid_id) layout the code scan partition-prunes to
    * nProbe/k of the corpus. */
  def ivfSq8TopK(corpus: DataFrame, cb: DataFrame, probes: DataFrame,
                 k: Int, nProbe: Int = 2, rerank: Int = 4,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val rng = sq8Range(corpus, vecCol)
    // the disk layout: (centroid_id, corpus_id, codes) — floats absent
    val index = ivfAssign(corpus, cb, idCol, vecCol)
      .select(col("centroid_id"), col(idCol))
      .join(sq8Encode(corpus, rng, idCol, vecCol),
        col(idCol) === col("corpus_id"))
      .select(col("centroid_id"), col("corpus_id"), col("codes"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__sim"), 6).desc, col("centroid_id"))
    val probeBuckets = p.crossJoin(broadcast(cb))
      .withColumn("__sim", cosine(col("pv"), col("centv")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("centroid_id"))
    val rec = zip_with(zip_with(col("codes"), col("spans"),
      (c, s) => c * s / 255.0), col("los"), (t, l) => t + l)
    val wApprox = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__approx"), 6).desc, col("corpus_id"))
    val cand = index.crossJoin(broadcast(rng))
      .select(col("centroid_id"), col("corpus_id"), rec.as("__rv"))
      .join(probeBuckets, Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("pv"), col("__rv")).as("__approx"))
      .withColumn("__arn", row_number().over(wApprox))
      .filter(col("__arn") <= k * rerank)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val wExact = Window.partitionBy(col("probe_id"))
      .orderBy(Num.roundLike(col("__cos"), 6).desc, col("corpus_id"))
    cand.join(c, Seq("corpus_id"))
      .join(p.select(col("probe_id"), col("pv").as("__pv2")), Seq("probe_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(col("__pv2"), col("cv")).as("__cos"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("corpus_id"),
        Num.roundLike(col("__cos"), 6).as("cosine"))
  }

  /** Recall@k of [[sq8TopK]] against [[bruteForceTopK]] — the SQ8
    * quality certificate, one hash-gated row like [[ivfRecall]]: a
    * quantization-noise regression that pushes a true neighbor out of
    * the rerank pool flips `meets_target` and fails the gate. With
    * `rerank`·k deep pools the exact re-rank recovers brute-force
    * order unless 8-bit noise reorders past the pool boundary, so the
    * expected recall is ~1.0 at any corpus scale. */
  def sq8Recall(corpus: DataFrame, probes: DataFrame, k: Int,
                rerank: Int = 4, target: Double = 0.9,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val sq = sq8TopK(corpus, probes, k, rerank, idCol, vecCol)
      .select(col("probe_id"), col("corpus_id"), lit(1).as("__hit"))
    val bf = bruteForceTopK(corpus, probes, k, idCol, vecCol)
    bf.join(sq, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  // ------------------------------------------------------------------
  // s7: NN-Descent approximate kNN-graph construction
  // ------------------------------------------------------------------

  /** Deterministic NN-Descent (Dong, Moses & Li, "Efficient k-nearest
    * neighbor graph construction for generic similarity measures",
    * WWW 2011): build the approximate kNN graph — itself a first-class
    * training-data artifact (SemDeDup-style clustering, graph-ANN
    * serving, manifold dedup all start from it) — by iterating
    * "a neighbor of my neighbor is probably my neighbor":
    *
    *  1. init: `k` hash-drawn candidate neighbors per vector
    *     (md5(id:i:knn) mod N — no RNG, any retry/partitioning yields
    *     the same graph; ids that miss the corpus drop in the fetch
    *     join, mirroring the oracle's IN-filter).
    *  2. round: every node introduces candidate pairs among its
    *     in∪out neighborhood; score new pairs; keep each node's top-k
    *     by (6-dp cosine, id) — the same total order every other
    *     similarity op ranks by.
    *
    * Scale shape: one round = a self-join of the (src, dst) edge frame
    * on the pivot — |candidates| ≤ N·cap²/2 rows of (long, long), text
    * and vectors never ride along; scoring is an equi-join fetch of
    * the two endpoint vectors. The per-pivot neighborhood is CAPPED at
    * `maxNeighborhood` by hash order (the paper's ρ-sampling made
    * deterministic), so a hub node — the skew hazard of a reversed kNN
    * graph — contributes a bounded pair set regardless of its
    * in-degree. Rounds are a fixed small constant (4 by default:
    * neighborhoods square each round, so round r explores paths of
    * length 2^r). Everything is joins + windows: AQE handles residual
    * skew, no driver state, no collect.
    *
    * Quality on the isotropic gate embeddings (the hard case — weak
    * neighbor transitivity, the same distance-concentration floor the
    * s3 PQ certificates document): recall@10 vs brute force measured
    * 0.80 at 500 vectors, 0.62 at 2000 (rounds = 4). Clustered
    * real-world embedding corpora converge much faster — the paper's
    * 90%+ regime. */
  /** Regime bound for the one-task [[LocalKnn]] twin (the a6/a7/g8
    * routing precedent): below it the relational rounds' per-round
    * shuffle+checkpoint fixed cost dwarfs the arithmetic. 4096 covers
    * the oracle-capped gate corpora and RAG chunk sets; everything
    * larger takes the distributed rounds unchanged. */
  private[ext] val LocalKnnMaxVectors = 4096L

  def knnGraphNNDescent(corpus: DataFrame, k: Int = 10, rounds: Int = 4,
                        maxNeighborhood: Int = 20,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true) // read 2x per scoring round
    val n = vecs.count() // 1-row driver aggregate (the id-space modulus)
    if (n <= LocalKnnMaxVectors) {
      // one-task twin, bit-identical edges (LocalKnn scaladoc); every
      // downstream gate lane hash-pins the full graph, so the regimes
      // cannot silently diverge
      val spark = vecs.sparkSession
      val rows = vecs.coalesce(1).rdd.mapPartitions { it =>
        val arr = it.map(r => (r.getLong(0),
          r.getSeq[Double](1).toArray)).toArray
        LocalKnn.descent(arr, k, rounds, maxNeighborhood)
          .map { case (s, rk, d, c) =>
            org.apache.spark.sql.Row(s, rk, d, c) }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cosine",
          org.apache.spark.sql.types.DoubleType)))
      return spark.createDataFrame(rows, schema)
        .localCheckpoint(eager = true)
    }
    val init = vecs.select(col("vid").as("src"),
        explode(array((0 until k).map(lit): _*)).as("__i"))
      .select(col("src"),
        pmod(conv(substring(md5(concat(col("src").cast("string"), lit(":"),
            col("__i").cast("string"), lit(":knn"))), 1, 12), 16, 10)
          .cast("long"), lit(n)).as("dst"))
      .filter(col("dst") =!= col("src"))
      .distinct()
    var g = edgeTopK(edgeScore(vecs, init), k)
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds)
      g = descentRound(vecs, g, k, maxNeighborhood)
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    g.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src"), col("rank"), col("dst"), col("cos").as("cosine"))
  }

  /** Fetch both endpoint vectors and score on the ROUNDED cosine — raw
    * doubles differ across engines in the last bits (bruteForceTopK's
    * rationale); ties break on dst id downstream. */
  private def edgeScore(vecs: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(vecs.select(col("vid").as("src"), col("v").as("__va")),
        Seq("src"))
      .join(vecs.select(col("vid").as("dst"), col("v").as("__vb")),
        Seq("dst"))
      .select(col("src"), col("dst"),
        Num.roundLike(cosine(col("__va"), col("__vb")), 6).as("cos"))

  private def edgeTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** One NN-Descent improvement round over edge frame `g` (src, dst,
    * cos): capped neighborhoods introduce candidate pairs, new pairs
    * score, each node keeps its top-k of old ∪ new. */
  private def descentRound(vecs: DataFrame, g: DataFrame, k: Int,
                           maxNeighborhood: Int): DataFrame = {
    val b = g.select(col("src").as("p"), col("dst").as("x"))
      .unionAll(g.select(col("dst").as("p"), col("src").as("x")))
      .distinct()
    val wCap = Window.partitionBy("p").orderBy(col("__h"), col("x"))
    val bc = b
      .withColumn("__h", md5(concat(col("p").cast("string"), lit(":"),
        col("x").cast("string"))))
      .withColumn("__rn", row_number().over(wCap))
      .filter(col("__rn") <= maxNeighborhood)
      .select(col("p"), col("x"))
    val cand = bc.as("a").join(bc.as("b"),
        col("a.p") === col("b.p") && col("a.x") < col("b.x"))
      .select(col("a.x").as("src"), col("b.x").as("dst"))
      .distinct()
    val sc = edgeScore(vecs, cand)
    val both = sc.unionAll(sc.select(col("dst").as("src"),
      col("src").as("dst"), col("cos")))
    // same pair rediscovered scores identically (deterministic
    // rounded cosine) — max() is pure dedup, not a choice
    val all = g.unionAll(both)
      .groupBy("src", "dst").agg(max(col("cos")).as("cos"))
    edgeTopK(all, k).localCheckpoint(eager = true)
  }

  /** NN-Descent refinement of an EXISTING graph — the post-ingest
    * repair pass: after many [[knnGraphInsert]]/[[knnGraphCompact]]
    * batches (whose new ids connected through beam search against the
    * graph as it was) or [[knnGraphDelete]] holes, run descent rounds
    * over the CURRENT edge set so neighbors-of-neighbors propagate the
    * accumulated changes — the same "my neighbor's neighbor" step the
    * builder iterates, applied as maintenance. Per-node lists only
    * improve in the (6-dp cosine, id) order (top-k of old ∪ new), and
    * since brute-force truth ranks by the SAME order, recall vs truth
    * is monotone non-decreasing — certified by the refine-recall gate
    * entry. Cost per round: one capped neighborhood self-join + one
    * candidate scoring, linear in |edges|·cap — never corpus². */
  def knnGraphRefine(corpus: DataFrame, graph: DataFrame,
                     rounds: Int = 1, k: Int = 10,
                     maxNeighborhood: Int = 20,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true)
    var g = graph.select(col("src"), col("dst"), col("cosine").as("cos"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds)
      g = descentRound(vecs, g, k, maxNeighborhood)
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    g.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src"), col("rank"), col("dst"), col("cos").as("cosine"))
  }

  /** Before/after certificate for [[knnGraphRefine]] over the
    * insert-then-refine composition. Truth is brute force over the
    * FULL post-insert corpus (base ∪ batch, self excluded) — the id
    * universe the refined graph actually lives in. That choice makes
    * the story measurable: the insert connects new ids only to the
    * indexed BASE (it is blind to its own batch siblings, so
    * recall_before caps below 1 when true neighbors arrived in the
    * same batch), and one refine round propagates the new edges so
    * siblings find each other. It also makes `improved` a THEOREM the
    * oracle pins TRUE: refine keeps each node's top-k of old ∪ new
    * under the same (6-dp cosine, id) total order the truth ranks by,
    * and every candidate lives in the truth universe, so a list entry
    * is only ever displaced by a candidate ranking strictly higher in
    * the true order — overlap with true top-k never drops. (Vs a
    * base-only truth the flag would be FALSE-able: a batch-sibling
    * edge can legitimately displace a base edge.) */
  def knnGraphRefineRecall(base: DataFrame, batch: DataFrame,
                           k: Int = 10, idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val g = knnGraphNNDescent(base, idCol = idCol, vecCol = vecCol)
    val ins = knnGraphInsert(base, g, batch, k,
        idCol = idCol, vecCol = vecCol)
      .localCheckpoint(eager = true)
    val ref = knnGraphRefine(base.unionAll(batch), ins, rounds = 1, k = k,
      idCol = idCol, vecCol = vecCol)
    val batchIds = batch.select(col(idCol).cast("long").as("src"))
    def hits(gr: DataFrame) = gr
      .join(batchIds, Seq("src"), "left_semi")
      .select(col("src").as("probe_id"), col("dst").as("corpus_id"))
    val bf = bruteForceTopK(base.unionAll(batch), batch, k, idCol, vecCol)
      .select("probe_id", "corpus_id")
      .localCheckpoint(eager = true)
    def recallOf(gr: DataFrame, name: String) = bf
      .join(hits(gr).withColumn("__h", lit(1)),
        Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__h"), lit(0))).cast("long").as(s"n_$name"),
        count(lit(1)).as(s"__tot_$name"))
    recallOf(ins, "before").crossJoin(recallOf(ref, "after"))
      .select(col("n_before"), col("n_after"),
        col("__tot_before").as("n_total"),
        Num.roundLike(col("n_before") / col("__tot_before"), 6)
          .as("recall_before"),
        Num.roundLike(col("n_after") / col("__tot_before"), 6)
          .as("recall_after"),
        (col("n_after") >= col("n_before")).as("improved"))
  }

  /** Recall certificate for [[knnGraphNNDescent]] against brute-force
    * truth on a bounded probe set — the same contract as [[ivfRecall]]:
    * the oracle pins `meets_target = TRUE`, so a construction
    * regression that drops recall below `target` fails the hash gate.
    * Probes are `probeMax` ids (bounded), truth is [[bruteForceTopK]]
    * over the full corpus for those probes only. */
  def knnGraphRecall(corpus: DataFrame, probeMax: Long, k: Int = 10,
                     rounds: Int = 4, target: Double = 0.5,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val g = knnGraphNNDescent(corpus, k, rounds, idCol = idCol,
        vecCol = vecCol)
      .filter(col("src") < probeMax)
      .select(col("src").as("probe_id"), col("dst").as("corpus_id"),
        lit(1).as("__hit"))
    val bf = bruteForceTopK(corpus,
      corpus.filter(col(idCol) < probeMax), k, idCol, vecCol)
    bf.join(g, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  /** Beam search over a [[knnGraphNNDescent]] graph — the query side
    * of graph-ANN serving: per probe, `seeds` hash-drawn entry points
    * (md5(probe:i:beam) mod N — deterministic, like the graph's own
    * init) are iteratively improved for `steps` rounds of
    * expand-score-prune: the frontier's graph neighbors (BOTH edge
    * directions — the reverse edges double connectivity for free)
    * join in, every candidate scores against the probe, and the
    * per-probe beam keeps the `beam` best by (6-dp cosine, id).
    *
    * Scale shape: a step touches ≤ |probes|·beam·(2k+1) candidate
    * rows — bounded by the PROBE batch, independent of corpus size;
    * the graph join is an equi-join on the edge source (the adjacency
    * partitioning key) and the only corpus-wide structure read is the
    * kNN graph itself. This is the serve path that amortizes the s7
    * build across arbitrarily many queries. */
  def graphBeamSearch(corpus: DataFrame, graph: DataFrame,
                      probeMax: Long, k: Int = 10, beam: Int = 20,
                      steps: Int = 5, seeds: Int = 10,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      localMaxVectors: Long = LocalKnnMaxVectors)
      : DataFrame = {
    val vecs = corpus.select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true)
    val n = vecs.count()
    if (n <= localMaxVectors) {
      // one-task twin (the knnGraphNNDescent routing): the 5
      // expand-score-prune steps are ~18 near-empty stages at this
      // size — LocalKnn.beamSearch replays them bit-identically
      // inside one task over the tag-unioned (vectors ∪ edges) rows
      return localBeamFrame(vecs, graph,
        nodeFilter = None, probeMax = Some(probeMax), n = n,
        m = k, beam = beam, steps = steps, seeds = seeds)
        .select(col("probe_id"), col("rank"),
          col("node").as("corpus_id"), col("cos").as("cosine"))
    }
    val gsym = symmetrized(graph)
    val c = beamCore(vecs, vecs.select("vid"),
      vecs.filter(col("vid") < probeMax).select(col("vid").as("probe_id")),
      gsym, n, beam, steps, seeds)
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("node"))
    beamTop(c, k).withColumn("rank", row_number().over(w).cast("long"))
      .select(col("probe_id"), col("rank"), col("node").as("corpus_id"),
        col("cos").as("cosine"))
  }

  /** The one-task beam route shared by [[graphBeamSearch]] (probes =
    * corpus ids < probeMax, nodes = the whole corpus) and
    * [[forwardCore]] (probes = the batch, nodes = the base): vectors
    * and graph edges tag-union into ONE frame, coalesce to one task,
    * and [[LocalKnn.beamSearch]] replays the relational loop there.
    * `nodeFilter` marks which vector rows are legal entry/expansion
    * NODES (None = all; Some(pred) = base rows only — batch rows are
    * probes and score-only). Output: (probe_id, rank, node, cos),
    * checkpointed (consumers branch on it). */
  private def localBeamFrame(vecs: DataFrame, graph: DataFrame,
                             nodeFilter: Option[Column],
                             probeMax: Option[Long], n: Long, m: Int,
                             beam: Int, steps: Int, seeds: Int,
                             probeTag: Option[Column] = None): DataFrame = {
    val spark = vecs.sparkSession
    val isNode = nodeFilter.getOrElse(lit(true))
    val isProbe = probeTag.getOrElse(probeMax.map(col("vid") < _)
      .getOrElse(lit(false)))
    val tagged = vecs.select(lit(0).as("t"), col("vid").as("a"),
        lit(0L).as("b"), col("v"),
        isNode.as("nd"), isProbe.as("pr"))
      .unionAll(graph.select(lit(1).as("t"),
        col("src").cast("long").as("a"), col("dst").cast("long").as("b"),
        lit(null).cast("array<double>").as("v"),
        lit(false).as("nd"), lit(false).as("pr")))
    val rows = tagged.coalesce(1).rdd.mapPartitions { it =>
      val vb = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Double])]
      val eb = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val nodeIds = new java.util.HashSet[java.lang.Long]()
      val probes = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.foreach { r =>
        if (r.getInt(0) == 0) {
          val id = r.getLong(1)
          vb += ((id, r.getSeq[Double](3).toArray))
          if (r.getBoolean(4)) nodeIds.add(id)
          if (r.getBoolean(5)) probes += id
        } else eb += ((r.getLong(1), r.getLong(2)))
      }
      LocalKnn.beamSearch(vb.toArray, nodeIds, probes.toArray, eb.toArray,
          n, m, beam, steps, seeds)
        .map { case (p, rk, node, c) =>
          org.apache.spark.sql.Row(p, rk, node, c) }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("probe_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(rows, schema).localCheckpoint(eager = true)
  }

  /** Both edge directions of a kNN graph, deduped and materialized —
    * the traversal structure [[beamCore]] expands along. */
  private def symmetrized(graph: DataFrame): DataFrame =
    graph.select(col("src"), col("dst"))
      .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = true) // read once per step

  private def beamTop(scored: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("node"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m).drop("__rn")
  }

  /** The shared beam engine behind [[graphBeamSearch]] (probes live in
    * the indexed corpus) and [[knnGraphInsert]] (probes are NEW
    * vectors, nodes stay the indexed base): `probes` (probe_id) seed
    * from md5(probe:i:beam) mod `n` constrained to `nodeIds` (the seed
    * draw is an id-space lottery — with a non-contiguous node id space
    * a ticket can land off the corpus, and with probes OUTSIDE the
    * corpus it can land on another probe; the semi-join keeps exactly
    * the legal entries, mirroring the oracle's IN filter), then
    * improve for `steps` expand-score-prune rounds along `gsym`
    * (expansion nodes are graph endpoints — legal by construction).
    * Vectors for BOTH sides of the score resolve from `scoreVecs`.
    * Returns the final beam rows (probe_id, node, cos). */
  private def beamCore(scoreVecs: DataFrame, nodeIds: DataFrame,
                       probes: DataFrame, gsym: DataFrame, n: Long,
                       beam: Int, steps: Int, seeds: Int): DataFrame = {
    def score(cand: DataFrame): DataFrame = cand
      .join(scoreVecs.select(col("vid").as("probe_id"), col("v").as("__vp")),
        Seq("probe_id"))
      .join(scoreVecs.select(col("vid").as("node"), col("v").as("__vn")),
        Seq("node"))
      .select(col("probe_id"), col("node"),
        Num.roundLike(cosine(col("__vp"), col("__vn")), 6).as("cos"))
    val entry = probes
      .select(col("probe_id"),
        explode(array((0 until seeds).map(lit): _*)).as("__i"))
      .select(col("probe_id"),
        pmod(conv(substring(md5(concat(col("probe_id").cast("string"),
            lit(":"), col("__i").cast("string"), lit(":beam"))), 1, 12),
          16, 10).cast("long"), lit(n)).as("node"))
      .filter(col("node") =!= col("probe_id"))
      .join(nodeIds.withColumnRenamed("vid", "node"), Seq("node"),
        "left_semi")
      .distinct()
    var c = beamTop(score(entry), beam).localCheckpoint(eager = true)
    for (_ <- 1 to steps) {
      val expand = c
        .join(gsym.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("probe_id"), col("dst").as("node"))
        .unionAll(c.select(col("probe_id"), col("node")))
        .filter(col("node") =!= col("probe_id"))
        .distinct()
      c = beamTop(score(expand), beam).localCheckpoint(eager = true)
    }
    c
  }

  /** Recall certificate for [[graphBeamSearch]] vs brute-force truth —
    * the s2/s7 contract (oracle pins `meets_target = TRUE`). The
    * build/serve knobs default to the gate-replayed constants (the
    * s8_beam_recall oracle macro-expands exactly rounds=4/steps=5);
    * the UNCAPPED certificate lane (s8_beam_recall_full, whose oracle
    * replays nothing) passes stronger ones — on isotropic vectors the
    * descent/beam quality floor drops with corpus size (distance
    * concentration), and more rounds/seeds/steps buy it back for cost
    * still linear in the corpus (rounds·n·cap² pairs) and probe batch
    * (steps·beam·(2k+1) rows). */
  def beamSearchRecall(corpus: DataFrame, probeMax: Long, k: Int = 10,
                       target: Double = 0.5,
                       rounds: Int = 4, beam: Int = 20,
                       steps: Int = 5, seeds: Int = 10,
                       graphK: Int = 10,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val g = knnGraphNNDescent(corpus, k = graphK, rounds = rounds,
        maxNeighborhood = math.max(20, graphK), idCol = idCol,
        vecCol = vecCol)
      .select(col("src"), col("dst"))
    val bs = graphBeamSearch(corpus, g, probeMax, k, beam = beam,
        steps = steps, seeds = seeds, idCol = idCol, vecCol = vecCol)
      .select(col("probe_id"), col("corpus_id"), lit(1).as("__hit"))
    val bf = bruteForceTopK(corpus,
      corpus.filter(col(idCol) < probeMax), k, idCol, vecCol)
    bf.join(bs, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  /** Incremental graph-ANN ingest — the maintenance path that
    * completes the index lifecycle (build [[knnGraphNNDescent]], serve
    * [[graphBeamSearch]], maintain here): a `batch` of NEW vectors
    * joins an existing graph WITHOUT a full NN-Descent rebuild.
    *
    * Semantics (the standard bulk-load shape — every insert runs
    * against the FROZEN input graph, so the batch is order-independent
    * and retry-safe):
    *  1. each new vector beam-searches the old graph for its `k`
    *     nearest indexed neighbors ([[beamCore]] — per-probe cost
    *     bounded by beam·(2k+1)·steps, independent of corpus size);
    *  2. its top-k become its FORWARD edges;
    *  3. every forward edge proposes the REVERSE edge: an affected
    *     base node re-ranks its old neighbor list ∪ the new arrivals
    *     by the same (6-dp cosine, id) order and keeps k — so a new
    *     vector becomes discoverable by later searches that pass its
    *     neighborhood, not just findable itself. Only nodes a forward
    *     edge touches re-rank: ≤ batch·k of them, never the corpus.
    *
    * Untouched nodes' rows pass through BIT-IDENTICAL (spec-pinned),
    * which is what makes this the 100 TB shape: ingest cost scales
    * with the batch, the standing index is never rewritten.
    *
    * @param base  indexed corpus (idCol, vecCol)
    * @param graph its kNN graph — (src, dst, cosine) at minimum
    * @param batch new vectors, ids disjoint from `base`
    * @return the updated graph (src, rank, dst, cosine) covering
    *         base ∪ batch ids */
  /** The per-arrival work of [[knnGraphInsert]] in isolation: each
    * batch vector's beam search against the FROZEN graph, top-k as its
    * forward adjacency rows (src, dst, cos) — a pure function of
    * (vector, base, graph), so it is order- and batch-split-
    * independent. This is what the streaming ingest twin runs per
    * micro-batch (LSM-style: forward edges land at ingest, the
    * reverse merge defers to the periodic batch compaction =
    * [[knnGraphInsert]]). */
  private def forwardCore(base: DataFrame, graph: DataFrame,
                          batch: DataFrame, k: Int, beam: Int,
                          steps: Int, seeds: Int, idCol: String,
                          vecCol: String,
                          localMaxVectors: Long = LocalKnnMaxVectors)
      : DataFrame = {
    def sel(df: DataFrame) = df.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val vecsB = sel(base).localCheckpoint(eager = true)
    val n = vecsB.count() // the seed lottery's id-space modulus
    if (n <= localMaxVectors) {
      // one-task twin (graphBeamSearch's routing): base rows are the
      // legal entry/expansion nodes, batch rows are score-only probes
      return localBeamFrame(
        vecsB.withColumn("__base", lit(true))
          .unionAll(sel(batch).withColumn("__base", lit(false))),
        graph, nodeFilter = Some(col("__base")), probeMax = None,
        n = n, m = k, beam = beam, steps = steps, seeds = seeds,
        probeTag = Some(!col("__base")))
        .select(col("probe_id").as("src"), col("node").as("dst"),
          col("cos"))
    }
    val scoreVecs = vecsB.unionAll(sel(batch))
      .localCheckpoint(eager = true)
    val gsym = symmetrized(graph)
    val beamed = beamCore(scoreVecs, vecsB.select("vid"),
      sel(batch).select(col("vid").as("probe_id")), gsym, n,
      beam, steps, seeds)
    beamTop(beamed, k)
      .select(col("probe_id").as("src"), col("node").as("dst"),
        col("cos"))
  }

  /** Public ranked form of [[forwardCore]] — the streaming-ingest
    * output contract: (src, rank, dst, cosine), rank per src (each new
    * id's rows land in exactly one micro-batch, so per-batch ranking
    * IS global ranking). */
  def knnGraphForwardEdges(base: DataFrame, graph: DataFrame,
                           batch: DataFrame, k: Int = 10, beam: Int = 20,
                           steps: Int = 5, seeds: Int = 10,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val f = forwardCore(base, graph, batch, k, beam, steps, seeds,
      idCol, vecCol)
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    f.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src"), col("rank"), col("dst"), col("cos").as("cosine"))
  }

  def knnGraphInsert(base: DataFrame, graph: DataFrame, batch: DataFrame,
                     k: Int = 10, beam: Int = 20, steps: Int = 5,
                     seeds: Int = 10, idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     localMaxVectors: Long = LocalKnnMaxVectors,
                     localMaxMergeRows: Long = LocalMergeMaxRows)
      : DataFrame =
    mergeForward(graph,
      forwardCore(base, graph, batch, k, beam, steps, seeds,
        idCol, vecCol, localMaxVectors), k, localMaxMergeRows)

  /** The merge stage of [[knnGraphInsert]] from already-landed forward
    * rows: reverse edges propose, affected base nodes re-rank, the
    * rest passes through. */
  /** Row bound for the one-task merge: standing graph + forward rows
    * both fit one task's heap with room to spare (the LocalKnn regime
    * sized by rows, not vectors — a 4096-vector graph is ≤ 82k rows).
    * The routing count on `graph` is column-pruned (a parquet-backed
    * standing index answers it from row-group metadata; the gate
    * lanes pass checkpointed frames where it is a block count). */
  private[ext] val LocalMergeMaxRows = 262144L

  private def mergeForward(graph: DataFrame, forward: DataFrame,
                           k: Int,
                           localMaxRows: Long = LocalMergeMaxRows)
      : DataFrame = {
    // forward: the new ids' own adjacency rows (read 3x below)
    val fwd = forward.localCheckpoint(eager = true)
    val nFwd = fwd.count()
    val oldRows = graph.select(col("src"), col("dst"),
      col("cosine").as("cos"))
    if (nFwd <= localMaxRows && {
        val nOld = oldRows.count(); nOld + nFwd <= localMaxRows }) {
      // one-task twin (the beam/descent routing): rev-propose,
      // re-rank affected, pass the rest through — LocalKnn.mergeForward
      // replays the relational merge bit for bit
      val spark = fwd.sparkSession
      val tagged = oldRows.select(lit(0).as("t"), col("src"), col("dst"),
          col("cos"))
        .unionAll(fwd.select(lit(1).as("t"), col("src"), col("dst"),
          col("cos")))
      val rows = tagged.coalesce(1).rdd.mapPartitions { it =>
        val ob = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        val fb = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        it.foreach { r =>
          val e = (r.getLong(1), r.getLong(2), r.getDouble(3))
          if (r.getInt(0) == 0) ob += e else fb += e
        }
        LocalKnn.mergeForward(ob.toArray, fb.toArray, k)
          .map { case (s, rk, d, c) => org.apache.spark.sql.Row(s, rk, d, c) }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cosine",
          org.apache.spark.sql.types.DoubleType)))
      return spark.createDataFrame(rows, schema)
        .localCheckpoint(eager = true)
    }
    val rev = fwd.select(col("dst").as("src"), col("src").as("dst"),
      col("cos"))
    val aff = rev.select("src").distinct()
    val old = graph.select(col("src"), col("dst"),
      col("cosine").as("cos"))
    def topK(edges: DataFrame): DataFrame = {
      val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
      edges.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
    }
    val upd = topK(old.join(aff, Seq("src"), "left_semi").unionAll(rev))
    val out = old.join(aff, Seq("src"), "left_anti")
      .unionAll(upd).unionAll(fwd)
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    out.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src"), col("rank"), col("dst"), col("cos").as("cosine"))
  }

  /** LSM compaction: fold STREAMED forward edges
    * ([[knnGraphForwardEdges]] rows, e.g. the e12 ingest output) into
    * the standing graph. By construction this is the SAME merge the
    * one-shot [[knnGraphInsert]] runs — so stream-ingest-then-compact
    * reproduces the direct batch insert bit-for-bit (the
    * s9_graph_compact gate entry pins both against the SAME oracle
    * SQL, and KnnGraphSpec asserts row equality). That equivalence is
    * the point: an LSM index that compacts to something other than
    * the batch build drifts under every write. */
  def knnGraphCompact(graph: DataFrame, forward: DataFrame,
                      k: Int = 10): DataFrame =
    mergeForward(graph,
      forward.select(col("src"), col("dst"), col("cosine").as("cos")), k)

  /** Recall certificate for [[knnGraphInsert]]: the inserted ids'
    * graph neighbors vs brute-force truth over the base corpus —
    * pins that incremental ingest yields a USABLE neighborhood, not
    * just any k edges (oracle pins `meets_target = TRUE`). */
  def knnGraphInsertRecall(base: DataFrame, batch: DataFrame,
                           k: Int = 10, target: Double = 0.5,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val g = knnGraphNNDescent(base, idCol = idCol, vecCol = vecCol)
    val batchIds = batch.select(col(idCol).cast("long").as("__bid"))
    val ins = knnGraphInsert(base, g, batch, k,
        idCol = idCol, vecCol = vecCol)
      .join(batchIds.withColumnRenamed("__bid", "src"), Seq("src"),
        "left_semi")
      .select(col("src").as("probe_id"), col("dst").as("corpus_id"),
        lit(1).as("__hit"))
    val bf = bruteForceTopK(base, batch, k, idCol, vecCol)
    bf.join(ins, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
  }

  /** Graph-ANN delete with neighborhood repair — the remaining
    * lifecycle edge (build [[knnGraphNNDescent]], serve
    * [[graphBeamSearch]], insert [[knnGraphInsert]], delete here):
    * removing a vector must not leave dangling edges OR tear holes in
    * the graph's navigability, so every survivor that lost an edge
    * repairs itself through the deleted node (the FreshDiskANN-style
    * delete consolidation — Singh et al. 2021 §4.2):
    *
    *  1. deleted ids' own adjacency rows drop;
    *  2. survivors' edges INTO the deleted set drop;
    *  3. each survivor that lost an edge considers the deleted
    *     neighbor's OWN former neighborhood (both directions) as
    *     repair candidates — "route around the hole" — scores them,
    *     and re-ranks kept ∪ candidates by (6-dp cosine, id), top k.
    *
    * Cost is bounded by the damage: ≤ |lost edges|·k candidate pairs
    * score, only nodes that lost an edge re-rank, and untouched nodes'
    * rows pass through bit-identical — like [[knnGraphInsert]], the
    * standing index is never rewritten. A node whose whole
    * neighborhood was deleted AND whose repair candidates were all
    * deleted too keeps < k (possibly zero) edges — honest damage, not
    * invented neighbors.
    *
    * @param base      the indexed corpus INCLUDING the to-be-deleted
    *                  rows (vectors are needed to score repairs)
    * @param graph     its kNN graph (src, dst, cosine)
    * @param deleteIds one column of ids to remove
    * @return the updated graph (src, rank, dst, cosine) over survivors
    */
  def knnGraphDelete(base: DataFrame, graph: DataFrame,
                     deleteIds: DataFrame, k: Int = 10,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val del = deleteIds.select(col(deleteIds.columns.head).cast("long")
      .as("vid")).localCheckpoint(eager = true) // read 5x below
    val vecs = base.select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint(eager = true)
    val old = graph.select(col("src"), col("dst"),
      col("cosine").as("cos"))
    // survivors' rows, split into kept edges and holes
    val gsur = old.join(del.withColumnRenamed("vid", "src"), Seq("src"),
      "left_anti")
    val kept = gsur.join(del.withColumnRenamed("vid", "dst"), Seq("dst"),
        "left_anti")
      .select(col("src"), col("dst"), col("cos"))
      .localCheckpoint(eager = true) // read 2x (aff semi + anti)
    val lost = gsur.join(del.withColumnRenamed("vid", "dst"), Seq("dst"),
        "left_semi")
      .select(col("src"), col("dst"))
    // the deleted nodes' former neighborhoods (both directions) are
    // the repair routes through the hole
    val dAdj = symmetrized(graph)
      .join(del.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .select(col("src").as("__d"), col("dst").as("cand"))
    val cand = lost.select(col("src"), col("dst").as("__d"))
      .join(dAdj, Seq("__d"))
      .select(col("src"), col("cand").as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(del.withColumnRenamed("vid", "dst"), Seq("dst"), "left_anti")
      .distinct()
    val scored = cand
      .join(vecs.select(col("vid").as("src"), col("v").as("__va")),
        Seq("src"))
      .join(vecs.select(col("vid").as("dst"), col("v").as("__vb")),
        Seq("dst"))
      .select(col("src"), col("dst"),
        Num.roundLike(cosine(col("__va"), col("__vb")), 6).as("cos"))
    val aff = lost.select("src").distinct()
    // a repair candidate can coincide with a kept edge — identical
    // rounded cos, so max() is pure dedup (the NN-Descent precedent)
    val merged = kept.join(aff, Seq("src"), "left_semi")
      .unionAll(scored)
      .groupBy("src", "dst").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    def topK(edges: DataFrame): DataFrame = edges
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
    val out = kept.join(aff, Seq("src"), "left_anti")
      .unionAll(topK(merged))
    out.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src"), col("rank"), col("dst"), col("cos").as("cosine"))
  }

  /** Certificates for [[knnGraphDelete]] in one row: (a) ZERO edges
    * point at a deleted id (structural integrity — dangling edges
    * poison every later beam search), and (b) repaired nodes' recall
    * vs brute-force truth over the survivor corpus stays above
    * `target` (the repair found real routes, not noise). */
  def knnGraphDeleteCert(base: DataFrame, deleteIds: DataFrame,
                         k: Int = 10, target: Double = 0.5,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val g = knnGraphNNDescent(base, idCol = idCol, vecCol = vecCol)
    val del = deleteIds.select(col(deleteIds.columns.head).cast("long")
      .as("vid")).localCheckpoint(eager = true)
    val upd = knnGraphDelete(base, g, del, k, idCol, vecCol)
      .localCheckpoint(eager = true)
    val dangling = upd.join(del.withColumnRenamed("vid", "dst"),
      Seq("dst"), "left_semi")
    // affected = survivors whose OLD rows had a deleted dst
    val aff = g.join(del.withColumnRenamed("vid", "src"), Seq("src"),
        "left_anti")
      .join(del.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
      .select("src").distinct()
    val survivors = base.join(
      del.withColumnRenamed("vid", idCol).select(idCol), Seq(idCol),
      "left_anti")
    val probes = survivors.join(aff.withColumnRenamed("src", idCol)
      .select(idCol), Seq(idCol), "left_semi")
    val bf = bruteForceTopK(survivors, probes, k, idCol, vecCol)
    val got = upd.join(aff, Seq("src"), "left_semi")
      .select(col("src").as("probe_id"), col("dst").as("corpus_id"),
        lit(1).as("__hit"))
    bf.join(got, Seq("probe_id", "corpus_id"), "left")
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_matched"),
        count(lit(1)).as("n_total"))
      .select(col("n_matched"), col("n_total"),
        Num.roundLike(col("n_matched") / col("n_total"), 6).as("recall"),
        (col("n_matched") / col("n_total") >= target).as("meets_target"))
      .crossJoin(dangling.agg(count(lit(1)).as("n_dangling")))
      .select(col("n_dangling"), col("n_matched"), col("n_total"),
        col("recall"), col("meets_target"))
  }

  /** The codebook travels with the index it assigned (k rows — one
    * file). */
  def writeCodebook(cb: DataFrame, path: String): Unit =
    cb.coalesce(1).write.mode("overwrite").parquet(path)

  def readCodebook(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.parquet(path)
}
