package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling, Similarity, TextOps}

/** Dedup + text-analysis extension operators. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (4L, "completely different words entirely unrelated here"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, min id canonical") {
    val out = Dedup.exact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("minhash LSH finds near + exact dup candidates with jaccard") {
    val cands = Dedup.minhashCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cands.contains((1L, 3L)) && cands((1L, 3L)) == 1.0)
    // near-dup shares most 3-shingles; jaccard in (0, 1)
    cands.get((1L, 2L)).foreach(j => assert(j > 0.4 && j < 1.0))
    assert(!cands.keySet.exists { case (a, b) => Set(a, b) == Set(1L, 4L) })
  }

  test("weighted sample: huge weight ranks first, plan is TakeOrdered") {
    val d = (1L to 100L).map(i => (i, "x", 10L)).toDF("doc_id", "text", "n_chars")
      .unionByName(Seq((999L, "x", 1000000000L))
        .toDF("doc_id", "text", "n_chars"))
    val out = Sampling.weightedSample(d, n = 5)
    val rows = out.collect()
    assert(rows.length == 5)
    // the 1e9-weight doc's priority ~1e-9 beats every weight-10 doc
    assert(rows.head.getLong(0) == 999L)
    // priorities ascend and are 9-dp stable
    val ps = rows.map(_.getDouble(2))
    assert(ps.sameElements(ps.sorted))
    // the top-n plans as TakeOrderedAndProject, not a global sort
    assert(out.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("fuzzy rewrite keeps cluster canonicals and unclustered docs only") {
    val d = docs.withColumn("lang", lit("en"))
    val out = Dedup.fuzzyRewrite(d).collect()
    // the exact pair {1,3} clusters (1 canonical, 3 dropped); 2 never
    // shares a full LSH band with 1 in this 4-doc fixture and 4 is
    // unrelated — both pass through
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    // text replaced by its digest, attribute columns carried through
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "text_md5"))
  }

  test("incremental rewrite: standing wins, pure-batch clusters keep min id") {
    val standing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different words entirely unrelated here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),   // dup of standing 1
      (5L, "an entirely fresh batch document with new words"),
      (6L, "an entirely fresh batch document with new words"), // dup of 5
      (7L, "another singleton batch document nothing matches"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalRewrite(standing,
      Dedup.lshBands(standing, "doc_id", "text"), batch).collect()
    // 3 drops to standing 1; {5,6} is a pure-batch cluster keeping 5;
    // 7 is untouched — and the standing side never appears
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(5L, 7L))
  }

  test("incremental dedup == full rebuild restricted to batch-touching pairs") {
    val batch = Seq(
      (5L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (6L, "completely different words entirely unrelated here then"), // near 4
      (7L, "nothing in common with anything else at all"))
      .toDF("doc_id", "text")
    val full = docs.union(batch)
    val inc = Dedup.incrementalCandidates(docs,
        Dedup.lshBands(docs, "doc_id", "text"), batch).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rebuilt = Dedup.minhashCandidates(full).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .filter { case ((a, b), _) => a >= 5L || b >= 5L }
    assert(inc == rebuilt)                    // the equivalence contract
    assert(inc.contains((1L, 5L)) && inc((1L, 5L)) == 1.0) // cross standing×batch
    // standing-internal pairs (e.g. 1-3 exact dups) never re-emitted
    assert(!inc.keySet.exists { case (a, b) => a < 5L && b < 5L })
  }

  test("ngram jaccard: identical 1.0, disjoint 0.0") {
    val out = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1L && col("b.doc_id") === 3L)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    val dis = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1L && col("b.doc_id") === 4L)
      .select(Dedup.ngramJaccard(col("a.text"), col("b.text"))).collect()
    assert(dis(0).getDouble(0) == 0.0)
  }

  test("simhash: equal texts equal prints, near texts small hamming") {
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text"), 32).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L).length == 32 && fp(1L).forall(c => c == '0' || c == '1'))
    val ham = docs.limit(0).sparkSession.range(1).select(
      Dedup.hammingDist(lit(fp(1L)), lit(fp(2L))).as("d"),
      Dedup.hammingDist(lit(fp(1L)), lit(fp(4L))).as("far")).collect()(0)
    assert(ham.getInt(0) < ham.getInt(1))
  }

  test("simhashDF matches the expression form bit-for-bit (incl. empty text)") {
    val withEmpty = docs.unionByName(Seq((5L, "")).toDF("doc_id", "text"))
    val expr = withEmpty.select(col("doc_id"),
        Dedup.simhash(col("text"), 32).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rel = Dedup.simhashDF(withEmpty, nBits = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rel == expr)
    assert(rel(5L) == "1" * 32) // token-less doc keeps the all-ones print
  }

  test("embedding near-dups finds planted duplicate vectors") {
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => 0.1f * i + 0.1f)),
      (2L, Array.tabulate(8)(i => 0.1f * i + 0.1f)),       // identical
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDups(vecs, threshold = 0.95,
        bands = 4, bitsPerBand = 4, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(1L -> 2L))
  }

  test("semDedup drops scaled copies, keeps lowest-id most-central survivor") {
    // 6 base vectors in 2 directions + a 0.5-scaled copy of vec 1 and an
    // unrelated orthogonal vector; codebook = the two direction anchors
    val e1 = Array.tabulate(8)(i => if (i < 4) 1.0 else 0.0)
    val e2 = Array.tabulate(8)(i => if (i >= 4) 1.0 else 0.0)
    val vecs = Seq(
      (1L, e1), (2L, e1.map(_ * 0.5)),            // dup pair, dir 1
      (3L, e2), (4L, e2.map(_ * 2.0)),            // dup pair, dir 2
      (5L, Array.tabulate(8)(i => if (i == 0) 1.0 else if (i == 7) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val cb = Seq((100L, e1), (200L, e2)).toDF("centroid_id", "centv")
    val out = Dedup.semDedup(vecs, cb, tau = 0.9, nReps = 64)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // scaled copies collapse onto the lower id; vec 5 (cos 1/sqrt(2) to
    // both cells) survives whichever cell it lands in
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true))
  }

  test("semDedup nReps caps the comparator set") {
    // three identical vectors: with nReps=1 only rank-1 is a
    // comparator, so ranks 2 and 3 both drop against it
    val v = Array.tabulate(4)(_ => 1.0)
    val vecs = Seq((1L, v), (2L, v), (3L, v)).toDF("vec_id", "embedding")
    val cb = Seq((0L, v)).toDF("centroid_id", "centv")
    val out = Dedup.semDedup(vecs, cb, tau = 0.9, nReps = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.sortBy(_._1).toSeq ==
      Seq((1L, 1L, true), (2L, 2L, false), (3L, 3L, false)))
  }

  test("gopher filter: canonical rules pass clean prose, reject degenerate docs") {
    val clean = (("the data " * 10) + "words have been prepared with care " +
      "and that makes a document of fifty plus tokens to clear every rule " +
      "in this composite quality gate for corpus filtering work today " +
      "plus a few more honest english words to be safe").trim
    val docs = Seq(
      (1L, clean),
      (2L, "short text"),                                  // word count < 50
      (3L, ("#### " * 60).trim),                           // symbols, no alpha
      (4L, (1 to 60).map(i => s"- bullet $i").mkString("\n")), // 100% bullets
      (5L, (1 to 60).map(i => s"line number $i goes on...").mkString("\n")))
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8))
    assert(!out(2L).getBoolean(8))
    assert(!out(3L).getBoolean(8) &&
      out(3L).getDouble(6) == 0.0)                         // alpha_frac
    assert(!out(4L).getBoolean(8) &&
      out(4L).getDouble(4) == 1.0)                         // bullet_frac
    assert(!out(5L).getBoolean(8) &&
      out(5L).getDouble(5) == 1.0)                         // ellipsis_frac
  }

  test("leak-safe split routes a whole near-dup cluster to one side") {
    // docs 1/3 are exact dups (jaccard 1.0 ≥ 0.5 → one cluster);
    // 2 and 4 stay unclustered
    val out = Sampling.leakSafeSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // the cluster hashes its canonical id = min member id
    assert(Set(1L, 3L).map(out(_)._1) == Set(1L))
    assert(Set(1L, 3L).map(out(_)._2).size == 1) // one side for both
    assert(out(2L)._1 == 2L && out(4L)._1 == 4L) // unclustered: own id
    // the side is the pure hash rule, recomputable from the key alone
    val u = spark.range(1).select(
      org.apache.spark.sql.functions.conv(substring(
        md5(lit("1:p5")), 1, 12), 16, 10).cast("long").cast("double")
        / lit(281474976710656.0)).collect()(0).getDouble(0)
    val expect = if (u < 0.1) "test" else if (u < 0.2) "val" else "train"
    assert(out(1L)._2 == expect)
  }

  test("DSIR weights: target-like docs outscore off-domain, exact + partition-independent") {
    val corpus = Seq(
      (1L, "spark shuffle join agg spark shuffle join agg", "src0"),
      (2L, "spark shuffle join agg spark shuffle join scan", "src1"),
      (3L, "violets daisies tulips roses violets daisies tulips roses", "src1"),
      (4L, "spark shuffle join agg scan filter sort window", "src0"),
      (5L, "one", "src1")) // <2 tokens: no bigram features, excluded
      .toDF("doc_id", "text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirWeights(df).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val out = run(corpus)
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // src1 doc built from the target (src0) vocabulary beats the
    // off-domain src1 doc (whose grams the target model never saw);
    // keep is exactly the sign of the exact fixed-point sum
    assert(out(2L)._2 > out(3L)._2)
    assert(!out(3L)._3)
    assert(out.values.forall { case (_, w, k) => k == (w > 0.0) })
    // pure function of the corpus: any partitioning, same bits
    assert(run(corpus.repartition(7)) == out)
    assert(run(corpus.repartition(1)) == out)
  }

  test("bloom decontamination: flags exact overlap, never under-flags, tiny filter over-flags safely") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different words entirely unrelated here today"),
      (3L, "tiny"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon something else entirely"))
      .toDF("doc_id", "text")
    val out = TextOps.bloomDecontaminate(train, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2 == 1L && out(1L)._4) // the shared 5-gram, flagged
    assert(out(2L)._2 == 0L)
    assert(out.values.forall(_._5))        // a Bloom filter never under-flags
    // at m=2^20 this corpus is FP-free: the filter equals the exact set
    assert(out.values.forall(v => v._3 == v._2))
    // a deliberately tiny filter may over-flag but still never under-flags
    val small = TextOps.bloomDecontaminate(train, bench, mBits = 32, k = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getBoolean(5)))
    assert(small.forall(t => t._2 >= t._1 && t._3))
  }

  test("block dedup: first occurrence survives, later exact blocks are removed, reassembly keeps order") {
    val docs = Seq(
      (1L, "a b c d e f"),          // blocks: "a b c", "d e f"
      (2L, "x y z a b c"),          // "a b c" repeats doc 1's block → dropped
      (3L, "d e f d e f g"),        // first "d e f" is doc 1's → both dropped; "g" kept
      (4L, "h i"))                  // sub-block doc: one partial block
      .toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, blockTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "x y z")))
    assert(out(3L) == ((3L, 1L, "g")))
    assert(out(4L) == ((1L, 1L, "h i")))
    // partition-invariant: corpus order is (doc_id, blk), not row order
    val re = Dedup.blockDedup(docs.repartition(7), blockTokens = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(re == out.view.mapValues(_._3).toMap)
  }

  test("intra-doc dedup: removes self-repeats only, never cross-doc, map-only plan") {
    val docs = Seq(
      (1L, "a b c d e f a b c g h i"),  // "a b c" repeats within doc 1
      (2L, "a b c x y z"))              // doc 2's "a b c" is untouched
      .toDF("doc_id", "text")
    val out = Dedup.intraDocDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((4L, 3L, "a b c d e f g h i")))
    assert(out(2L) == ((2L, 2L, "a b c x y z")))     // cross-doc dup kept
    // the whole plan is map-only: no exchange anywhere
    val plan = Dedup.intraDocDedup(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("CDC dedup: lossless solo reassembly, full dup removal, cut points survive a prefix shift") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val solo = Dedup.cdcDedup(Seq((1L, base)).toDF("doc_id", "text"))
      .collect()(0)
    // a corpus with no repeats reassembles losslessly
    assert(solo.getString(3) == base && solo.getLong(1) == solo.getLong(2))
    val docs = Seq(
      (1L, base),
      (2L, base),                   // verbatim dup: every chunk removed
      (3L, "zzz qqq " + base))      // shifted copy: chunks re-sync
      .toDF("doc_id", "text")
    val out = Dedup.cdcDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L)._3 == base)
    assert(out(2L) == ((out(1L)._1, 0L, "")))
    // content-defined boundaries re-align after the 2-token prefix:
    // most of doc 3's chunks match doc 1's and are removed — the
    // aligned-block scheme would keep every shifted block
    assert(out(3L)._2 < out(3L)._1,
      s"no chunk of the shifted copy deduped: ${out(3L)}")
    assert(out(3L)._3.startsWith("zzz qqq"))
    val blockOut = Dedup.blockDedup(docs, blockTokens = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the CDC removal on the shifted doc strictly beats block alignment
    assert(out(3L)._2 < blockOut(3L),
      s"CDC kept ${out(3L)._2}, blocks kept ${blockOut(3L)}")
    // partition invariance
    val re = Dedup.cdcDedup(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(re == out.view.mapValues(_._3).toMap)
  }

  test("shard shuffle: dense per-shard positions, total preserved, salt changes order") {
    val d = spark.range(0, 200).toDF("doc_id")
    val out = Sampling.shardShuffle(d, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 200)
    assert(out.map(_._1).toSet == (0L until 200L).toSet, "every doc placed once")
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        "positions dense 0..n-1 within each shard") }
    val again = Sampling.shardShuffle(d, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet, "deterministic across runs")
    val salted = Sampling.shardShuffle(d, nShards = 4, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSet != out.toSet, "salt reshuffles")
  }

  test("epoch upsample: integer weights copy exactly, fractional in expectation, zero drops") {
    val d = spark.range(0, 300)
      .select(col("id").as("doc_id"),
        when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
          .otherwise("c").as("source"))
    val w = Seq(("a", 2.0), ("b", 0.5), ("c", 0.0)).toDF("source", "weight")
    val out = Sampling.epochUpsample(d, w).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byGroup = out.groupBy(_._2)
    assert(byGroup("a").length == 200, "w=2.0 -> exactly two copies of each")
    assert(byGroup("a").forall(_._4 == 2L))
    assert(byGroup("a").count(_._3 == 1L) == 100, "copy_idx identifies copies")
    val b = byGroup("b")
    assert(b.forall(r => r._3 == 0L && r._4 == 1L), "w=0.5 -> at most one copy")
    assert(b.length > 20 && b.length < 80, s"~half of 100 kept, got ${b.length}")
    assert(!byGroup.contains("c"), "w=0 drops the group")
  }

  test("corpus diff: added/removed/changed classified, unchanged suppressed") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val nw = Seq((2L, "beta"), (3L, "gamma CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val out = graft.ext.Versioning.corpusDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("index refresh from a diff == rebuild over the new snapshot") {
    val old = Seq((1L, "alpha bravo charlie delta"),
      (2L, "echo foxtrot golf hotel"), (3L, "india juliet kilo lima"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha bravo charlie delta"),          // unchanged
      (2L, "echo foxtrot golf hotel CHANGED"),               // changed
      (4L, "mike november oscar papa"))                      // added; 3 removed
      .toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap   // multiset
    val refreshed = graft.ext.Versioning.refreshBandIndex(
      Dedup.lshBands(old, "doc_id", "text"),
      graft.ext.Versioning.corpusDiff(old, nw), nw)
    assert(canon(refreshed) == canon(Dedup.lshBands(nw, "doc_id", "text")),
      "refresh == rebuild, as a band-row multiset")
  }

  test("cluster mixture: per-centroid counts, exact shares, √-temperature weights") {
    val cb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("centroid_id", "centv")
    val emb = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.95f, 0.0f)), (13L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Sampling.clusterMixture(emb, cb).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((3L, 0.75, 1.0)))
    assert(out(1L)._1 == 1L && out(1L)._2 == 0.25)
    assert(math.abs(out(1L)._3 - 0.57735) < 1e-5) // sqrt(1)/sqrt(3)
  }

  test("perplexity buckets: tiers are ordered by cross-entropy, quarters at the ends") {
    // 8 docs over a shared vocabulary. NB the LM is self-trained, so
    // the 'zz qq' docs — whose rare words have near-unique
    // continuations — are the PREDICTABLE head; the 'the …' docs pay
    // for 'the' fanning out to many continuations
    val corpus = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "the cat sat on the mat the cat sat on the rug"),
      (3L, "the cat sat on the mat and the dog sat too"),
      (4L, "the dog sat on the mat the dog sat on the mat"),
      (5L, "the cat ran on the mat the dog ran on it"),
      (6L, "zz qq ww ee rr tt yy uu ii oo pp aa"),
      (7L, "qq zz ee ww tt rr uu yy oo ii aa pp"),
      (8L, "the mat sat on the cat the rug sat on a dog"))
      .toDF("doc_id", "text")
    val out = TextOps.perplexityBuckets(corpus).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.length == 8)
    val byB = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    // quarter cuts: 2 head, 4 middle, 2 tail on 8 docs
    assert(byB("head").length == 2 && byB("tail").length == 2)
    assert(byB("middle").length == 4)
    // tiers are a partition of the score axis
    assert(byB("head").max <= byB("middle").min)
    assert(byB("middle").max <= byB("tail").min)
    // most-repetitive transition structure = head; the docs whose
    // bigrams fight 'the'/'sat'/'on' fan-out the hardest = tail
    // (hand-replicated fixed-point arithmetic: CE 0.5289/0.6218 head,
    // 0.9965/1.0058 tail)
    assert(out.filter(_._3 == "head").map(_._1).toSet == Set(1L, 4L))
    assert(out.filter(_._3 == "tail").map(_._1).toSet == Set(5L, 8L))
  }

  test("token counting: whitespace and bpe-ish boundaries") {
    val r = spark.range(1).select(
      TextOps.tokenCount(lit(" a  b\tc ")).as("n"),
      TextOps.bpeishTokenCount(lit("abc123 def, x")).as("b")).collect()(0)
    assert(r.getInt(0) == 3)
    // abc|123, def|,| x -> abc,123,def,",",x = 5
    assert(r.getInt(1) == 5)
  }

  test("quality score stays in [0,1]; english beats noise") {
    val out = docs.select(TextOps.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    val noise = spark.range(1).select(
      TextOps.qualityScore(lit("$$$$ #### !!!! 1234")).as("q")).collect()(0)
    assert(out.head > noise.getDouble(0))
  }

  test("lang id picks the dominant stopword language, und on none") {
    val r = Seq(
      "the cat is on the mat and it is happy",
      "der Hund ist nicht das Problem und das ist gut",
      "zzz qqq xxx").toDF("t")
      .select(TextOps.langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(r.sameElements(Array("en", "de", "und")))
  }

  test("fingerprints: whitespace-insensitive; rolling survives suffix edits") {
    val fp = Seq("a  b   c", "a b c").toDF("t")
      .select(TextOps.fingerprint(col("t"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1))
    val long = (1 to 20).map("w" + _).mkString(" ")
    val rolled = Seq(long, long + " tail extra").toDF("t")
      .select(TextOps.rollingFingerprint(col("t"), 8)).collect()
      .map(_.getString(0))
    // min-over-windows usually unchanged by a suffix append
    assert(rolled(0) == rolled(1))
  }

  test("duplicate ids with different texts keep per-row signatures") {
    // ids are not guaranteed unique in a real corpus: the grouped
    // (tokenize-once) forms must key on (id, text), not id, or two
    // rows sharing an id merge into one chimera signature
    val dup = Seq((7L, "alpha beta gamma delta"), (7L, "zeta eta theta iota"),
      (8L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val perRow = dup.select(col("doc_id"),
        Dedup.simhash(col("text"), 16).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val grouped = Dedup.simhashDF(dup, "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(grouped.sameElements(perRow))
    assert(grouped.distinct.length == 3) // both id-7 prints survive
    // lshBands: id 7 must carry TWO band-key sets (one per text) — the
    // second text's bands equal those of a unique-id row with the same
    // text, and id 8's bands match id 7's first text
    val bands = Dedup.lshBands(dup, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val only7 = bands.filter(_._1 == 7L).map { case (_, b, h) => (b, h) }
    val only8 = bands.filter(_._1 == 8L).map { case (_, b, h) => (b, h) }
    assert(only8.subsetOf(only7) && only7.size == 2 * only8.size)
  }

  test("tfidf: ubiquitous terms weigh 0, rarer terms more; tf counts repeats") {
    val w = TextOps.tfidf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // "the" appears twice in doc 1 and in 3 of 4 docs
    assert(w((1L, "the"))._1 == 2L && w((1L, "the"))._2 == 3L)
    // df = N ("fox" is in docs 1-3 only; "the" in 1,2,3) — terms in
    // every doc would weigh exactly 0; here check monotonicity instead:
    // a 1-of-4 term outweighs a 3-of-4 term at equal tf
    assert(w((4L, "entirely"))._3 > w((1L, "fox"))._3)
    // exact value: tf=1, N=4, df=1 → ln(4) rounded at 4 dp
    assert(w((4L, "entirely"))._3 == math.floor(math.log(4.0) * 1e4 + 0.5) / 1e4)
    // absent pairs stay absent (no zero-padding — the frame is sparse)
    assert(!w.contains((4L, "fox")))
  }

  test("embedding LSH recall >= 0.9 on planted near-dups (cos ~0.99)") {
    // 150 random vectors + 20 planted near-duplicate pairs; default
    // banding (8 x 4 over dim 64) is parameterized for near-dup
    // thresholds: recall = 1-(1-p^bits)^bands with p = 1 - theta/pi
    // (~0.96 at cos 0.9). The earlier sf-corpus probe at threshold 0.3
    // sits far off the design point by construction.
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 150).map(i => (i.toLong, vec()))
    val planted = (0 until 20).map { i =>
      val (id, v) = base(i)
      (1000L + id, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val found = Dedup.embeddingNearDups(df, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (0 until 20).count(i => found.contains((i.toLong, 1000L + i)))
    assert(hits >= 18, s"recall ${hits / 20.0} below 0.9")
  }

  test("repetition: duplicated-shingle ratio, sub-k doc ratio 0") {
    val d = Seq(
      (1L, "a b c a b c a b c"),    // 7 shingles, 3 unique -> 4/7
      (2L, "one two"),              // sub-k: one whole-text shingle
      (3L, "all distinct words here now"))
      .toDF("doc_id", "text")
    val out = TextOps.repetition(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((7L, 3L, math.floor((1.0 - 3.0 / 7) * 10000 + 0.5) / 10000)))
    assert(out(2L) == ((1L, 1L, 0.0)))
    assert(out(3L) == ((3L, 3L, 0.0)))
  }

  test("shared substring: verbatim w-token window pairs, df cap bans") {
    val run = (0 until 20).map(i => s"w$i").mkString(" ")  // 20 tokens
    val d = Seq(
      (1L, run + " tail one"),
      (2L, run + " other words"),      // shares 20-16+1=5 windows with 1
      (3L, "short doc below window"),  // <16 tokens: no windows
      (4L, (0 until 16).map(i => s"u$i").mkString(" ")))   // unique
      .toDF("doc_id", "text")
    val out = Dedup.sharedSubstring(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 5L))
    // a boilerplate window present in > maxDf docs pairs nobody
    val boiler = (1 to 4).map(i => (i.toLong, run)).toDF("doc_id", "text")
    assert(Dedup.sharedSubstring(boiler, maxDf = 2L).isEmpty)
    // duplicate input ROWS of one id: no self-pairs, no double counts
    val dup = Seq((7L, run), (7L, run), (8L, run)).toDF("doc_id", "text")
    val dout = Dedup.sharedSubstring(dup).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dout == Map((7L, 8L) -> 5L))
  }

  test("dedup clusters: pairs union transitively, min id canonical") {
    // exact dups always band-collide: {7,9,10} one cluster, canonical
    // 7 (min id), unrelated 4 not emitted
    val tri = Seq((10L, "x y z w v"), (7L, "x y z w v"), (9L, "x y z w v"),
      (4L, "other words entirely")).toDF("doc_id", "text")
    val out = Dedup.dedupClusters(tri).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out == Map(
      7L -> ((7L, 3L, true)),
      9L -> ((7L, 3L, false)),
      10L -> ((7L, 3L, false))))
    // the shared docs fixture: 1/3 exact dups cluster; 2 (jaccard 0.75
    // to both) joins only if its LSH bands collide — either way the
    // canonical is 1 and membership is a single cluster
    val base = Dedup.dedupClusters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(base(1L) == ((1L, true)) && base(3L) == ((1L, false)))
    assert(base.keySet.subsetOf(Set(1L, 2L, 3L)))
  }

  test("stratified sample: deterministic, per-stratum rates honored") {
    val mk = (n: Int, len: Int, off: Long) =>
      (0 until n).map(i => (off + i, (0 until len).map(j => s"t$j").mkString(" ")))
    val d = (mk(400, 10, 0) ++ mk(400, 40, 1000) ++ mk(400, 60, 2000))
      .toDF("doc_id", "text")
    val out = Sampling.stratifiedSample(d).collect()
      .map(r => (r.getLong(0), r.getString(2))).toList
    val byStratum = out.groupBy(_._2).view.mapValues(_.size).toMap
    // long stratum: rate 1.0 keeps everything
    assert(byStratum("long") == 400)
    // short/medium: binomial(400, rate) within 5 sigma
    assert(math.abs(byStratum("short") - 100) < 45)
    assert(math.abs(byStratum("medium") - 200) < 50)
    // pure function of doc_id: re-run identical
    val again = Sampling.stratifiedSample(d).collect()
      .map(r => (r.getLong(0), r.getString(2))).toList
    assert(out.toSet == again.toSet)
  }

  test("length quartiles: exact cut points bucket the corpus evenly") {
    // lengths 1..8, one doc each: q1={1,2}, q2={3,4}, q3={5,6}, q4={7,8}
    val d = (1 to 8).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.lengthQuartiles(d).collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(out == Map(1L -> "q1", 2L -> "q1", 3L -> "q2", 4L -> "q2",
      5L -> "q3", 6L -> "q3", 7L -> "q4", 8L -> "q4"))
  }

  test("pii scrub: counts and redacts email/ip/phone, in that order") {
    val d = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or boss@corp.io now"),
      (2L, "server 10.0.255.3 and 192.168.1.1 up, call 555-123-4567"),
      (3L, "no pii here at all"),
      (4L, "not-an-ip 1.2.3.4.5 and half-phone 12-345-6789"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == (2L, 0L, 0L, "mail me at <EMAIL> or <EMAIL> now"))
    assert(out(2L) ==
      (0L, 2L, 1L, "server <IP> and <IP> up, call <PHONE>"))
    assert(out(3L) == (0L, 0L, 0L, "no pii here at all"))
    // 1.2.3.4.5: \b…\b still matches the leading 1.2.3.4 run? No —
    // the trailing ".5" keeps a digit boundary INSIDE the token, so the
    // first four octets DO match; pin the actual regex semantics.
    assert(out(4L)._2 == 1L && out(4L)._3 == 0L)
  }

  test("decontaminate: flags only docs sharing 5-gram runs with bench") {
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (10L, run),                                   // bench-overlapping
      (11L, "one two three four five six seven"),   // clean
      (12L, "tiny doc"),                            // sub-5-token, clean
      (37L * 2, run + " iota kappa"))               // bench member (74)
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(
        d.filter(col("doc_id") % 37 =!= 0), d.filter(col("doc_id") % 37 === 0))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // doc 10's four 5-grams all appear inside the bench doc's run
    assert(out(10L) == (4L, 4L, true))
    assert(out(11L) == (3L, 0L, false))
    assert(out(12L) == (1L, 0L, false)) // whole-text gram, still a row
    assert(!out.contains(74L))          // bench side is not re-emitted
  }

  test("bigram LM: counts repeats, conditional probs sum to 1 per w1") {
    val d = Seq(
      (1L, "a b a b c"),   // bigrams: (a,b) (b,a) (b,c) — (a,b) ×2 w/ doc 2
      (2L, "a b"),
      (3L, "solo"))        // sub-2-token doc contributes nothing
      .toDF("doc_id", "text")
    val out = TextOps.bigramCounts(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("a", "b") -> (3L, 1.0),
      ("b", "a") -> (1L, 0.5), ("b", "c") -> (1L, 0.5)))
    // minCount cutoff drops the tail
    val cut = TextOps.bigramCounts(d, minCount = 2L).collect()
    assert(cut.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
  }

  test("LM cross-entropy: fixed-point nll means, rare transitions score high") {
    val d = Seq(
      (1L, "x y x y"),  // bigrams (x,y)x2 (y,x): common transitions
      (2L, "x z"),      // the one rare transition
      (3L, "solo"))     // sub-2-token doc emits no row
      .toDF("doc_id", "text")
    val out = TextOps.lmCrossEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // model: n(x,y)=2 n(y,x)=1 n(x,z)=1; n(x,·)=3 n(y,·)=1
    def nll(n: Long, np: Long): Long =
      math.floor(-math.log(n.toDouble / np) * 1e6 + 0.5).toLong
    def ce(terms: Seq[Long]): Double =
      math.floor(terms.sum.toDouble / (terms.size * 1e6) * 1e4 + 0.5) / 1e4
    assert(out == Map(
      1L -> (3L, ce(Seq(nll(2, 3), nll(1, 1), nll(2, 3)))),
      2L -> (1L, ce(Seq(nll(1, 3))))))
    // the document made of rare transitions is the "surprising" one
    assert(out(2L)._2 > out(1L)._2)
  }

  test("pack sequences: shard-local exact offsets, budget-512 cuts") {
    // one shard (ids ≡ 0 mod 8): lengths 300, 300, 100 → starts 0,
    // 300, 600 → packs 0, 0, 1; offsets 0, 300, 88
    val mk = (id: Long, n: Int) =>
      (id, (1 to n).map(i => s"t$i").mkString(" "))
    val d = Seq(mk(0L, 300), mk(8L, 300), mk(16L, 100), mk(3L, 700))
      .toDF("doc_id", "text")
    val out = Sampling.packSequences(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(0L) == (0L, 0L, 0L))
    assert(out(8L) == (0L, 0L, 300L))
    assert(out(16L) == (0L, 1L, 88L))
    // a different shard starts its own offset stream
    assert(out(3L) == (3L, 0L, 0L))
  }

  test("mixture weights: exact shares, sqrt temperature vs largest") {
    val d = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s1"),       // 8 tokens
      (3L, "a b", "s2"))                                  // 2 tokens
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixtureWeights(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("s1") == (2L, 8L, 0.8, 1.0))
    // share 2/10 = 0.2; temp sqrt(2)/sqrt(8) = 0.5 exactly
    assert(out("s2") == (1L, 2L, 0.2, 0.5))
  }

  test("chunking: stride windows, overlap continuity, kept tail, " +
      "empty doc yields nothing") {
    val words = (0 until 300).map(i => s"w$i")
    val d = Seq((1L, words.mkString(" ")), (2L, ""), (3L, "one two"))
      .toDF("doc_id", "text")
    val out = Sampling.chunkDocs(d, chunkTokens = 128, overlap = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(!out.exists(_._1 == 2L), "empty doc yields no chunks")
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 0L, 2L, "one two")), "sub-chunk doc is one whole chunk")
    val c1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,96,192,288 -> sizes 128,128,108,12
    assert(c1.map(_._3).toSeq == Seq(128L, 128L, 108L, 12L),
      s"window sizes: ${c1.map(_._3).toSeq}")
    // overlap continuity: chunk i's last 32 tokens open chunk i+1
    val t0 = c1(0)._4.split(" "); val t1 = c1(1)._4.split(" ")
    assert(t0.takeRight(32).toSeq == t1.take(32).toSeq)
    // stride-prefix concatenation reconstructs the document
    val rebuilt = c1.dropRight(1).flatMap(_._4.split(" ").take(96)) ++
      c1.last._4.split(" ")
    assert(rebuilt.toSeq == words, "chunks cover the doc losslessly")
  }

  test("chunking is partitioning-independent") {
    val d = (0 until 25).map(i =>
      (i.toLong, (0 until (i * 17 % 200)).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sampling.chunkDocs(d).collect().toSet
    val b = Sampling.chunkDocs(d.repartition(7)).collect().toSet
    assert(a == b)
  }

  test("hash embed: 64 dims, unit norm, zero vector for short docs, " +
      "identical text identical vector") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark engines"),
      (4L, "single")).toDF("doc_id", "text")
    val out = TextOps.hashEmbed(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.values.forall(_.length == 64))
    assert(out(1L) == out(2L), "same text, same vector")
    assert(out(1L) != out(3L), "different text, different vector")
    assert(out(4L).forall(_ == 0.0f), "bigram-less doc embeds as zero")
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x * x.toDouble).sum)
    assert(math.abs(norm(out(1L)) - 1.0) < 1e-3, "L2-normalized")
    assert(math.abs(norm(out(3L)) - 1.0) < 1e-3)
  }

  test("hash embed is partitioning-independent") {
    val d = (0 until 40).map(i =>
      (i.toLong, s"token$i shared words appear in doc $i repeatedly"))
      .toDF("doc_id", "text")
    val a = TextOps.hashEmbed(d).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    val b = TextOps.hashEmbed(d.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    assert(a == b)
  }

  test("hash embed feeds the ANN stack: duplicates are mutual top-1") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"),
      (4L, "one two three four five seven")).toDF("doc_id", "text")
    val emb = TextOps.hashEmbed(d)
    val top = Similarity.bruteForceTopK(emb, emb, k = 1,
        idCol = "doc_id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(1L) == 2L && top(2L) == 1L, "exact dup pair is mutual top-1")
    assert(top(3L) == 4L && top(4L) == 3L, "near dup pair is mutual top-1")
  }

  test("BPE train: frequency-weighted merges, lexicographic ties, end-of-word units") {
    // the Sennrich et al. worked example shape: low:3 lower:1 lowest:1
    val d = Seq((1L, "low lower lowest"), (2L, "low low"))
      .toDF("doc_id", "text")
    val m = TextOps.bpeTrain(d, rounds = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    assert(m === Seq(
      (1L, "l", "o", "lo", 5L),          // tie with (o,w) broken by lhs
      (2L, "lo", "w", "low", 5L),
      (3L, "low", "</w>", "low</w>", 3L), // end-of-word unit learned
      (4L, "low", "e", "lowe", 2L),
      (5L, "lowe", "r", "lower", 1L)))    // 5-way cnt=1 tie: min (lhs, rhs)
  }

  test("BPE train: same-symbol run parity, vocab exhaustion, tokenize under the merges") {
    val d = Seq((1L, "aaa")).toDF("doc_id", "text")
    // run of 3 a's: greedy left-to-right merges floor(2/2)=1 pair
    val m = TextOps.bpeTrain(d, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4))).sortBy(_._1)
    assert(m === Seq((1L, "aa", 2L), (2L, "a</w>", 1L),
      (3L, "aaa</w>", 1L)), s"got ${m.toSeq}")
    // round 4 found no pair left: training stops at 3 rows (above)
    val tok = TextOps.bpeTokenize(d, rounds = 4).collect()
    assert(tok.length == 1 &&
      tok(0).getLong(1) == 1L && tok(0).getLong(2) == 1L,
      "fully merged word tokenizes to one unit")
    val tok1 = TextOps.bpeTokenize(d, rounds = 1).collect()
    assert(tok1(0).getLong(2) == 3L, "after one merge: [aa, a, </w>]")
    // the delimiter contract: '|'-bearing words drop from both sides
    val bar = Seq((7L, "ab a|b ab")).toDF("doc_id", "text")
    val tb = TextOps.bpeTokenize(bar, rounds = 0).collect()
    assert(tb(0).getLong(1) == 2L, "a|b excluded from training and counting")
    // serving snapshot roundtrip: persisted vocab tokenizes identically
    val dir = java.nio.file.Files.createTempDirectory("bpespec").toString
    TextOps.writeBpeVocab(d, dir, rounds = 4)
    val served = TextOps.bpeTokenizeServed(d, TextOps.openBpeVocab(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cold = TextOps.bpeTokenize(d, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == cold, "snapshot-served tokenize == cold tokenize")
  }

  test("exact-span dedup: repeated regions found, canonical kept, " +
      "maximal merge, rewrite cuts only duplicates") {
    import graft.ext.Dedup
    // a 48-char region shared verbatim by docs 1 and 2 (doc 1 owns the
    // canonical first occurrence), fenced by DISTINCT join characters
    // so no gram straddles a boundary; doc 3 repeats a region WITHIN
    // itself (intra-doc span); doc 4 has no 40-gram at all
    val shared = "the exact same forty eight character sentence ok" // 49?
    val sh = shared.take(48)
    assert(sh.length == 48)
    val d = Seq(
      (1L, "q" * 10 + sh + "r" * 10), // shared at 11..58 (canonical)
      (2L, "v" * 15 + sh + "wwww"),   // shared at 16..63
      (3L, "z" * 60 + "y"),
      (4L, "no repeats here at all just short text"))
      .toDF("doc_id", "text")
    val spans = Dedup.exactSpans(d, minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    // doc 1's copy is canonical -> only doc 2 and doc 3 report spans
    assert(spans.map(_._1).distinct.toSeq == Seq(2L, 3L), s"got ${spans.toSeq}")
    // doc 2: every 40-gram inside the shared region duplicates doc
    // 1's -> one maximal span covering exactly the 48 shared chars
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 16L, 63L)))
    // doc 3: "z"*60: 40-grams at 1..21 identical; position 1 is
    // canonical, 2..21 duplicated -> span [2, 60]
    assert(spans.filter(_._1 == 3L).toSeq == Seq((3L, 2L, 60L)))
    // rewrite: docs 1/4 untouched, doc 2 loses exactly the shared 48
    // chars, doc 3 keeps its canonical first char + the tail 'y'
    val rw = Dedup.exactSpanRewrite(d, minLen = 40)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rw(1L) == "q" * 10 + sh + "r" * 10)
    assert(rw(4L) == "no repeats here at all just short text")
    assert(rw(2L) == "v" * 15 + "wwww")
    assert(rw(3L) == "zy")
    // power-of-two path (minLen = 32, no two-anchor combine): the
    // same shared region reports as one span again
    val spans32 = Dedup.exactSpans(d, minLen = 32)
      .filter(col("doc_id") === 2L).collect()
    assert(spans32.length == 1)
  }

  test("incremental exact-span ingest: batch-vs-standing spans, " +
      "rebuild equivalence under id order, first-ingested wins") {
    import graft.ext.Dedup
    val sh = "the exact same forty eight character sentence ok".take(48)
    val standing = Seq(
      (1L, "q" * 10 + sh + "r" * 10),
      (2L, "unrelated standing content with no repeats at all either"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "v" * 15 + sh + "wwww"),   // dups standing doc 1
      (11L, "z" * 60 + "y"),           // pure-batch intra-doc run
      (12L, "nothing shared here and far too short"))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalSpans(standing, batch, minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // standing ids all < batch ids -> ingest == full rebuild
    // restricted to batch docs
    val full = Dedup.exactSpans(standing.unionByName(batch), minLen = 40)
      .filter(col("doc_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full, s"inc=$inc vs rebuild=$full")
    assert(inc == Set((10L, 16L, 63L), (11L, 2L, 60L)))
    // first-ingested wins: a batch doc with a SMALLER id than the
    // standing owner still defers to the standing copy (a full
    // rebuild would crown the batch doc canonical instead)
    val late = Seq((0L, "m" * 12 + sh + "nnnn")).toDF("doc_id", "text")
    val inc2 = Dedup.incrementalSpans(standing, late, minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc2 == Set((0L, 13L, 60L)),
      s"batch doc 0 must defer to standing doc 1: $inc2")
  }

  test("exact-span at-scale regime: groupBy+join-back ≡ window on a " +
      "deliberately hot gram, and no gram-key window in its plan") {
    import graft.ext.Dedup
    // HOT gram: one 44-char boilerplate repeated in every doc (the
    // r12 verdict's skew scenario — a window over the gram key would
    // colocate all of it in ONE task; the dist regime must not have
    // such a window at all)
    val boiler = "this exact boilerplate footer repeats a lot!"
    assert(boiler.length == 44)
    val d = (1L to 50L).map(i =>
        (i, s"doc$i%04d unique lead-in ${"u" * i.toInt} " + boiler))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val win = rows(Dedup.exactSpans(d, minLen = 40))
    val dist = Dedup.exactSpansDist(d, minLen = 40)
    assert(rows(dist) == win && win.nonEmpty)
    // the plan proof: every Window in the dist plan partitions by
    // doc_id (mergeRuns' run grouping) — none by the gram key h
    def windowKeys(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      }
    assert(windowKeys(dist).forall(_ == Set("doc_id")),
      s"dist plan windows: ${windowKeys(dist)}")
    // ...and the sanity leg: the detector DOES see the default
    // regime's gram-key window (otherwise the assertion above is vacuous)
    assert(windowKeys(Dedup.exactSpans(d, minLen = 40))
      .exists(_ == Set("h")))
    // same split for the ingest probe: batch-internal stats via
    // groupBy+join-back, identical output
    val standing = d.filter(col("doc_id") <= 40L)
    val batch = d.filter(col("doc_id") > 40L)
    val idx = Dedup.gramSegment(standing, minLen = 40)
    val incWin = rows(Dedup.incrementalSpansIndexed(idx, batch, minLen = 40))
    val incDist = Dedup.incrementalSpansIndexedDist(idx, batch, minLen = 40)
    assert(rows(incDist) == incWin && incWin.nonEmpty)
    assert(windowKeys(incDist).forall(_ == Set("doc_id")),
      s"incDist plan windows: ${windowKeys(incDist)}")
    // regime DISPATCH (r13 verdict #2): the default entry points route
    // themselves on the input's size estimate — under a 1-byte
    // crossover the returned plan must be the dist shape (no gram-key
    // window) with the same rows, and 0 forces dist (the _dist pin
    // convention); the tiny spec frame stays under the real default
    // crossover, which the sanity leg above already proves (the
    // default call's plan HAS the gram-key window)
    val routed = Dedup.exactSpans(d, minLen = 40, windowMaxBytes = 1L)
    assert(rows(routed) == win)
    assert(windowKeys(routed).forall(_ == Set("doc_id")),
      s"routed plan kept a gram-key window: ${windowKeys(routed)}")
    assert(windowKeys(Dedup.exactSpans(d, minLen = 40,
      windowMaxBytes = 0L)).forall(_ == Set("doc_id")))
    val routedInc = Dedup.incrementalSpansIndexed(idx, batch,
      minLen = 40, windowMaxBytes = 1L)
    assert(rows(routedInc) == incWin)
    assert(windowKeys(routedInc).forall(_ == Set("doc_id")),
      s"routed inc plan kept a gram-key window: ${windowKeys(routedInc)}")
  }

  test("exactSpanRewrite cuts the union of OVERLAPPING spans via the " +
      "cursor fold (no per-character explode in the plan)") {
    import graft.ext.Dedup
    val g1 = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 distinct chars
    assert(g1.length == 40)
    val y = g1 + "EF" // grams at pos 1 and pos 3 duplicate d1/d2 below
    val d = Seq(
      (1L, "(" + g1 + ")"),            // canonical owner of y's pos-1 gram
      (2L, "[" + g1.drop(2) + "EF]"),  // canonical owner of y's pos-3 gram
      (5L, y))
      .toDF("doc_id", "text")
    val spans = Dedup.exactSpans(d, minLen = 40).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 5: duplicated gram positions {1, 3} (pos 2's gram is unique)
    // -> two runs whose spans OVERLAP: [1,40] and [3,42]
    assert(spans == Set((5L, 1L, 40L), (5L, 3L, 42L)), s"got $spans")
    val rw = Dedup.exactSpanRewrite(d, minLen = 40).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the union of the overlapping spans covers every char of doc 5
    assert(rw(5L) == "")
    assert(rw(1L) == "(" + g1 + ")" && rw(2L) == "[" + g1.drop(2) + "EF]")
    // plan proof of the r12 fix: the rewrite must NOT explode the
    // corpus into characters — no posexplode/sequence fan-out of the
    // text side, only the span-list aggregation and the fold
    val plan = Dedup.exactSpanRewrite(d, minLen = 40)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"), "per-char explode is back")
  }

  test("trigramDocs derives the w·w₊₁·w₊₂ corpus and BPE regime " +
      "identity holds over it") {
    val d = Seq(
      (1L, "  The fast Key order  "), // mixed case + ragged whitespace
      (2L, "a b"),                    // < 3 tokens -> empty derived doc
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val tri = TextOps.trigramDocs(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tri(1L) == "thefastkey fastkeyorder")
    assert(tri(2L) == "")
    assert(tri(3L) == "xyz yzw")
    // regime identity at a beyond-gate round count on the derived
    // corpus: the one-task heap trainer == the relational rounds
    val big = (0 until 30).map(i =>
        (i.toLong, s"alpha beta gamma delta w$i beta gamma alpha"))
      .toDF("doc_id", "text")
    val dd = TextOps.trigramDocs(big).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(rows(TextOps.bpeTrain(dd, rounds = 40)) ==
      rows(TextOps.bpeTrainDist(dd, rounds = 40)))
  }

  test("BPE one-task trainer is bit-identical to the relational rounds") {
    // deterministic word soup with heavy tie pressure: repeated
    // fragments, same-symbol runs, shared prefixes/suffixes — enough
    // rounds that early merges feed later pair counts in both regimes
    val docs = (0 until 40).map { i =>
      val w1 = "ab" * (1 + i % 3)
      val w2 = "ba" + ("c" * (i % 4))
      val w3 = if (i % 2 == 0) "aaa" else "aab"
      (i.toLong, s"$w1 $w2 $w3 $w1 zz${i % 5}")
    }.toDF("doc_id", "text")
    def canon(rs: Array[org.apache.spark.sql.Row]) = rs.map { r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))
    }.sortBy(_._1).toSeq
    val local = canon(TextOps.bpeTrain(docs, rounds = 30).collect())
    val dist = canon(TextOps.bpeTrainDist(docs, rounds = 30).collect())
    assert(local == dist, s"regimes diverge:\n$local\nvs\n$dist")
    assert(local.nonEmpty)
  }

  test("BPE pack: learned-vocab token counts drive the packing window") {
    // rounds=5 on the low-corpus: low→[low</w>]=1, lower→[lower,</w>]=2,
    // lowest→[lowe,s,t,</w>]=4; one shard, budget 3
    val d = Seq((1L, "low lower lowest"), (2L, "low low"))
      .toDF("doc_id", "text")
    val out = Sampling.bpePack(d, rounds = 5, nShards = 1, budget = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out === Seq(
      (1L, 0L, 7L, 0L, 0L),   // starts at 0
      (2L, 0L, 2L, 2L, 1L)))  // starts at 7 = pack 2, offset 1
  }

  test("novelty: unique-shingle fraction, dups score 0, fresh docs 1") {
    val d = Seq(
      (1L, "a b c d"),       // dup pair: every shingle shared
      (2L, "a b c d"),
      (3L, "x y z w"),       // all shingles unique
      (4L, "a b c q r"))     // "a b c" shared, 2 of 3 novel
      .toDF("doc_id", "text")
    val out = TextOps.noveltyScore(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)) && out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
    assert(out(4L) == ((3L, 2L, 0.6667)))
  }

  test("curate corpus: composed pipeline == stages run in sequence, with every stage active") {
    // pos-shaped docs share a boilerplate prefix (df>=4); neg-shaped
    // docs are junk the NB filter should drop
    val pos = (0 to 7).map(i =>
      (i.toLong * 2, s"the cats sat upon a mat and the dogs ran c$i here"))
    val neg = (0 to 5).map(i => (i.toLong * 2 + 1, s"zz$i " * 6))
    // post-scrub EXACT dups: identical content after the shared
    // boilerplate prefix is removed — stage 3 must keep only id 100
    val dup = Seq(
      (100L, "the cats sat upon a mat and the dogs ran twin pair here"),
      (102L, "the cats sat upon a mat and the dogs ran twin pair here"))
    val d = (pos ++ neg ++ dup).toDF("doc_id", "text")
    val composed = Sampling.curateCorpus(d, rounds = 3, nShards = 1,
      budget = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // manual staging with the same knobs
    val kept = d.join(TextOps.nbQualityClassifier(d)
        .filter(col("nb_label") === "pos").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val cleaned = Dedup.boilerplateDedup(kept)
      .select(col("doc_id"), col("text_clean").as("text"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val manual = Sampling.bpePack(cleaned, rounds = 3, nShards = 1,
      budget = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(composed == manual, "composition introduces no seam")
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && keptIds.size < 16, "NB filter was active")
    val outIds = composed.map(_._1)
    assert(outIds.contains(100L) && !outIds.contains(102L),
      "exact-dedup stage keeps the first post-scrub copy only")
    // the shared 9-token prefix (df = 10 kept docs >= 4) was scrubbed:
    // every surviving doc's curated text is shorter than its original
    val orig = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cur = cleaned.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur.nonEmpty &&
      cur.forall { case (id, t) => t.length < orig(id).length },
      "boilerplate scrub was active")
  }

  test("boilerplate dedup: df>=minDf blocks vanish from every doc, intra-doc repeats don't count") {
    val d = Seq(
      (1L, "aa bb cc dd ee ff"),       // boilerplate + own content
      (2L, "aa bb cc gg hh ii"),       // boilerplate + own content
      (3L, "xx yy zz"),                // untouched
      (4L, "aa bb cc"),                // reduced to nothing
      (5L, "pp qq rr pp qq rr"),       // SAME block twice in ONE doc: df=1
      (6L, ""))                        // zero tokens: no output row
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateDedup(d, minDf = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L) == ((2L, 1L, "dd ee ff")), "first copy dropped too")
    assert(out(2L) == ((2L, 1L, "gg hh ii")))
    assert(out(3L) == ((1L, 1L, "xx yy zz")), "rare blocks survive verbatim")
    assert(out(4L) == ((1L, 0L, "")), "all-boilerplate doc still emits a row")
    assert(out(5L) == ((2L, 2L, "pp qq rr pp qq rr")),
      "df counts DISTINCT docs, not occurrences")
    val again = Dedup.boilerplateDedup(d.repartition(7), minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(again == out.map { case (k, (a, b, c)) => (k, a, b, c) }.toSet)
  }

  test("NB quality classifier: token evidence labels the unseeded docs") {
    // ids % 3 == 0 are the seed; 0/6 score ≥ 0.7 on the heuristic
    // (stopword-rich, varied), 3/9/12 below it (repetitive, no
    // stopwords) — so the learned token classes are known exactly
    val d = Seq(
      (0L, "the cats sat upon a mat and the dogs sat down"),
      (3L, "zz zz zz zz zz zz zz zz"),
      (6L, "the foxes run to a dens and the birds flew in"),
      (9L, "qq qq qq qq qq qq qq qq"),
      (12L, ""),
      (1L, "the cats and dogs sat on a mat"), // pos-class tokens only
      (2L, "zz qq zz qq zz qq"))              // neg-class tokens only
      .toDF("doc_id", "text")
    val out = TextOps.nbQualityClassifier(d, threshold = 0.7)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(4), r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L)._1 == "pos", "pos-token doc follows the evidence")
    assert(out(2L)._1 == "neg", "neg-token doc follows the evidence")
    // zero-token doc scores are the Laplace priors alone — exact
    // fixed-point longs: pos {0,6}, neg {3,9,12} of 5 seed docs, so
    // score_pos = floor(−ln(3/7)·1e6 + 0.5), score_neg = −ln(4/7)
    assert(out(12L) == (("neg", 0L, 847298L, 559616L)))
    // determinism across partitionings: exact integer sums
    val b = TextOps.nbQualityClassifier(d.repartition(13), threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val a = TextOps.nbQualityClassifier(d, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(a == b)
  }
}
