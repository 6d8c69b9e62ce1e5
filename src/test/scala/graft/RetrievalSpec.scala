package graft

import org.apache.spark.sql.functions._
import graft.ext.Retrieval

/** BM25 + RRF hybrid retrieval semantics on hand-checkable fixtures. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, vocabulary engineered so the scores are hand-derivable:
  // "rare" appears only in doc 1, "common" in all docs.
  private def docs = Seq(
    (0L, "common rare alpha"),
    (1L, "common rare rare beta"),
    (2L, "common beta beta gamma"),
    (3L, "common gamma")
  ).toDF("doc_id", "text")

  test("bm25 ranks the rare-term doc above common-term-only docs") {
    val q = Seq((0L, "rare gamma")).toDF("query_id", "text")
    val r = Retrieval.bm25(docs, q).collect()
      .map(x => (x.getLong(1), x.getLong(2))).toMap // rank -> doc_id
    // doc 1 has tf(rare)=2 of an idf-heavy term; docs 2/3 match only
    // "gamma" (df=2); doc 0 is the query itself and must not appear
    assert(r(1L) == 1L, s"rare-doc first: $r")
    assert(!r.values.toSet.contains(0L), "self-match excluded")
    // "common" alone contributes ln(1 + 0.5/4.5) > 0 — still, docs
    // matching gamma must outrank nothing-but-common (none here: all
    // candidate docs match a query term)
    assert(r.values.toSet == Set(1L, 2L, 3L))
  }

  test("bm25 idf uses the non-negative Lucene form") {
    // a term in EVERY doc: idf = ln(1 + 0.5/(4+0.5)) > 0, so an
    // all-docs term still contributes (classic Okapi idf would go
    // negative and flip rankings)
    val q = Seq((9L, "common")).toDF("query_id", "text")
    val r = Retrieval.bm25(docs, q).collect()
    assert(r.length == 4)
    assert(r.forall(_.getDouble(3) > 0), "scores positive")
    // shorter docs score higher for equal tf (length normalization):
    // doc 3 (2 tokens) > doc 0/1 (3/4 tokens)
    val byDoc = r.map(x => x.getLong(2) -> x.getDouble(3)).toMap
    assert(byDoc(3L) > byDoc(0L) && byDoc(0L) > byDoc(1L))
  }

  test("hybridRrf fuses legs and keeps one-leg docs") {
    val d = "/root/testdata/sf0.001"
    val docsT = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val r = Retrieval.hybridRrf(docsT, emb, probeMax = 3)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // every probe contributes; rrf of a two-leg doc equals the exact
    // rational sum of its leg terms
    val twoLeg = rows.filter(x => !x.isNullAt(4) && !x.isNullAt(5))
    twoLeg.foreach { x =>
      val expect = BigDecimal(
        1.0 / (60 + x.getLong(4)) + 1.0 / (60 + x.getLong(5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(x.getDouble(3) - expect) < 1e-9)
    }
    val oneLeg = rows.filter(x => x.isNullAt(4) ^ x.isNullAt(5))
    assert(oneLeg.nonEmpty, "no single-leg doc survived fusion")
  }

  test("mmr skips the near-duplicate of the first pick") {
    // probe 0; ids 1,2 near-duplicates of EACH OTHER on one side of
    // the probe, id 3 equally relevant on the OPPOSITE side (sim to
    // pick 1 far below its relevance). Pure relevance ranks (1,2,3);
    // MMR's second pick must trade the duplicate 2 for the diverse 3.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.44f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.44f, 0.01f, 0.0f)),
      (3L, Seq(0.9f, -0.44f, 0.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val sel = graft.ext.Retrieval.mmrRerank(df, probeMax = 1, poolN = 3,
        k = 3)
      .orderBy("rank").collect()
    assert(sel.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L), "ranks 1..3")
    assert(sel(0).getLong(2) == 1L, s"first pick is the most relevant")
    assert(sel(1).getLong(2) == 3L,
      s"second pick diversifies away from the near-duplicate: " +
        sel.map(_.getLong(2)).toSeq)
    assert(sel(2).getLong(2) == 2L)
  }

  test("mmr picks k distinct pool members per probe") {
    val rows = (0 until 30).map { i =>
      val v = Array.fill(6)(0.1f); v(i % 6) = 1.0f + 0.01f * i
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val sel = graft.ext.Retrieval.mmrRerank(df, probeMax = 3,
      poolN = 10, k = 5).collect()
    val byProbe = sel.groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(0L, 1L, 2L))
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.map(_.getLong(2)).distinct.length == 5)
    }
  }

  test("mmr is partitioning-independent") {
    val rows = (0 until 30).map { i =>
      val v = Array.fill(6)(0.1f); v(i % 6) = 1.0f + 0.01f * i
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = graft.ext.Retrieval.mmrRerank(df, probeMax = 3, poolN = 10,
      k = 5).collect().toSet
    val b = graft.ext.Retrieval.mmrRerank(df.repartition(11),
      probeMax = 3, poolN = 10, k = 5).collect().toSet
    assert(a == b)
  }

  test("prf expansion bridges vocabulary mismatch") {
    // probe 0 says "car road"; docs 1-3 are feedback bridges that
    // co-mention "automobile"; doc 5 says ONLY "automobile" — plain
    // bm25 can never match it, the expanded query must
    val d = Seq(
      (0L, "car road"),
      (1L, "car road automobile"),
      (2L, "car road automobile"),
      (3L, "car automobile road"),
      (5L, "automobile automobile parked"),
      (6L, "unrelated text about nothing")).toDF("doc_id", "text")
    val plain = graft.ext.Retrieval.bm25(d,
        d.filter(col("doc_id") === 0)
          .select(col("doc_id").as("query_id"), col("text")))
      .filter(col("probe_id") === 0).collect().map(_.getLong(2)).toSet
    val prf = graft.ext.Retrieval.prfExpand(d, probeMax = 1,
        fbDocs = 3, fbTerms = 2)
      .filter(col("probe_id") === 0).collect().map(_.getLong(2)).toSet
    assert(!plain.contains(5L), "plain bm25 cannot see the synonym doc")
    assert(prf.contains(5L), s"expanded query reaches it: $prf")
    assert(!prf.contains(6L), "unrelated doc stays unmatched")
  }

  test("prf expansion is partitioning-independent") {
    val d = (0 until 30).map(i =>
      (i.toLong, s"w${i % 7} shared${i % 3} filler$i common words here"))
      .toDF("doc_id", "text")
    val a = graft.ext.Retrieval.prfExpand(d, probeMax = 3).collect().toSet
    val b = graft.ext.Retrieval.prfExpand(d.repartition(11), probeMax = 3)
      .collect().toSet
    assert(a == b)
  }

  test("hard negatives exclude near-dup positives but keep " +
      "embedding-close non-dups") {
    // doc 1 is a lexical near-dup of anchor 0 (and embedding-closest);
    // doc 2 is unrelated text whose embedding is also close — the
    // mined negatives must skip 1 and keep 2 (that is the point:
    // high-ranked non-matches train the margin)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again today"),
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely unrelated prose about database engines"),
      (3L, "another different text on astronomy and stars"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.98f, 0.15f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val neg = graft.ext.Retrieval.hardNegatives(docs, emb, probeMax = 1,
        k = 2, pool = 3)
      .filter(col("probe_id") === 0).orderBy("rank").collect()
      .map(_.getLong(2)).toSeq
    assert(!neg.contains(1L), s"near-dup excluded from negatives: $neg")
    assert(neg.head == 2L, s"embedding-close non-dup is the top negative: $neg")
  }

  test("bm25 is partitioning-independent") {
    val q = Seq((0L, "rare gamma"), (2L, "beta common")).toDF("query_id", "text")
    val a = Retrieval.bm25(docs, q).collect().toSet
    val b = Retrieval.bm25(docs.repartition(7), q.repartition(3))
      .collect().toSet
    assert(a == b)
  }

  test("served bm25 over a written+reopened index equals the cold path") {
    val q = Seq((0L, "rare gamma"), (2L, "beta common")).toDF("query_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    Retrieval.writeBm25Index(docs, dir)
    val served = Retrieval.bm25Served(Retrieval.openBm25Index(spark, dir), q)
      .collect().toSet
    assert(served == Retrieval.bm25(docs, q).collect().toSet)
  }

  test("bm25 excludeSelf=false keeps the colliding document eligible") {
    // external query-id space colliding with a doc id: by default the
    // collision silently excludes doc 0 for probe 0; the flag keeps it
    val q = Seq((0L, "rare gamma")).toDF("query_id", "text")
    val byDefault = Retrieval.bm25(docs, q).collect()
      .map(_.getLong(2)).toSet
    val inclusive = Retrieval.bm25(docs, q, excludeSelf = false)
      .collect().map(_.getLong(2)).toSet
    assert(!byDefault.contains(0L))
    // doc 0 contains "rare": it must surface once the exclusion lifts
    assert(inclusive.contains(0L))
    assert(inclusive -- byDefault == Set(0L))
  }

  test("mmrFromPool over an explicit pool diversifies like mmrRerank") {
    // 0/1 near-identical, 2 orthogonal-ish: with pool = brute-force
    // top-3 the explicit-pool engine must match the wrapper exactly
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.14f, 0.0f)),
      (2L, Seq(0.4f, 0.0f, 0.9f)),
      (3L, Seq(0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val pool = graft.ext.Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 1), 3)
      .select(col("probe_id"), col("corpus_id"), col("cosine").as("rel"))
    val vecs = emb.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val a = Retrieval.mmrFromPool(vecs, pool, k = 3).collect().toSet
    val b = Retrieval.mmrRerank(emb, probeMax = 1, poolN = 3, k = 3)
      .collect().toSet
    assert(a == b)
  }

  test("mmr one-task regime is bit-identical to the relational twin") {
    // deterministic pseudo-random vectors (hash-mixed, no RNG state):
    // enough probes/pool members to exercise tie-breaks, running-max
    // updates and the full k greedy steps in both regimes
    val rows = (0 until 60).map { i =>
      val v = Array.tabulate(8) { d =>
        val h = (i * 1000003 + d * 97) % 17
        ((h - 8).toFloat / 8.0f)
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val local = graft.ext.Retrieval.mmrRerank(df, probeMax = 5,
      poolN = 12, k = 7).collect()
    val dist = graft.ext.Retrieval.mmrRerankDist(df, probeMax = 5,
      poolN = 12, k = 7).collect()
    // bit-for-bit: compare raw doubles via their bit patterns
    def keyed(rs: Array[org.apache.spark.sql.Row]) = rs.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        if (r.isNullAt(4)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(4)))
    }.toSet
    assert(keyed(local) == keyed(dist))
    assert(local.length == 5 * 7)
  }

  test("mmr regime dispatch: poolN above the one-task bound routes the " +
      "default entry through the relational rounds, same rows") {
    val rows = (0 until 40).map { i =>
      val v = Array.tabulate(8) { d =>
        val h = (i * 1000003 + d * 97) % 17
        ((h - 8).toFloat / 8.0f)
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    def keyed(rs: Array[org.apache.spark.sql.Row]) = rs.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        if (r.isNullAt(4)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(4)))
    }.toSet
    // the one-task branch plans a typed MapGroups; the relational
    // branch never does — the marker that proves the routing
    def hasMapGroups(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.optimizedPlan.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.MapGroups =>
          true
      }.nonEmpty
    val byDefault = graft.ext.Retrieval.mmrRerank(df, probeMax = 4,
      poolN = 9, k = 5)
    assert(hasMapGroups(byDefault), "default (small pool) must be one-task")
    // poolN over the bound → relational rounds; 0 forces it too
    val routed = graft.ext.Retrieval.mmrRerank(df, probeMax = 4,
      poolN = 9, k = 5, oneTaskMaxPool = 8)
    val forced = graft.ext.Retrieval.mmrRerank(df, probeMax = 4,
      poolN = 9, k = 5, oneTaskMaxPool = 0)
    assert(!hasMapGroups(routed) && !hasMapGroups(forced),
      "routed pools must take the relational branch")
    assert(keyed(routed.collect()) == keyed(byDefault.collect()))
    assert(keyed(forced.collect()) == keyed(byDefault.collect()))
  }
}
