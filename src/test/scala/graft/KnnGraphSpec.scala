package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** NN-Descent kNN-graph construction: convergence on clusterable
  * fixtures, determinism, and the hub cap. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  /** 3 tight clusters of 12 vectors in 8 dims: cluster c centers on
    * axis c with ±0.01 deterministic jitter — true neighbors are
    * exactly the cluster mates. */
  private def clustered = {
    val rows = for {
      c <- 0 until 3
      j <- 0 until 12
    } yield {
      val base = Array.fill(8)(0.05f)
      base(c) = 1.0f
      base((c + j) % 8) = base((c + j) % 8) + 0.01f * (j + 1)
      (c * 12L + j, base.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("clustered fixture converges to in-cluster neighbors") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 5, rounds = 2)
    val joined = g
      .join(clustered.select(col("vec_id").as("src"), col("label").as("ls")),
        Seq("src"))
      .join(clustered.select(col("vec_id").as("dst"), col("label").as("ld")),
        Seq("dst"))
    val n = joined.count()
    val inCluster = joined.filter(col("ls") === col("ld")).count()
    assert(n == 36 * 5, s"every node carries k edges: $n")
    // random init starts ~1/3 in-cluster; two rounds must push the
    // graph to (almost) pure in-cluster neighborhoods
    assert(inCluster >= (n * 0.95).toLong, s"$inCluster / $n in-cluster")
  }

  test("graph is partitioning-independent and repeatable") {
    val a = Similarity.knnGraphNNDescent(clustered, k = 4, rounds = 1)
      .collect().toSet
    val b = Similarity.knnGraphNNDescent(clustered.repartition(13),
      k = 4, rounds = 1).collect().toSet
    assert(a == b)
  }

  test("recall certificate is exact 1.0 on an easy fixture") {
    val r = Similarity.knnGraphRecall(clustered, probeMax = 6, k = 5,
      rounds = 2, target = 0.9).collect().head
    assert(r.getLong(1) == 30, "6 probes x 5 truth rows")
    assert(r.getBoolean(3), s"meets 0.9 on clustered data: $r")
  }

  test("beam search over the graph recovers brute-force truth on " +
      "clustered data") {
    val r = Similarity.beamSearchRecall(clustered, probeMax = 6, k = 5,
      target = 0.9).collect().head
    assert(r.getLong(1) == 30)
    assert(r.getBoolean(3), s"beam recall >= 0.9 on clustered data: $r")
  }

  test("beam search is partitioning-independent") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 4, rounds = 1)
      .select(col("src"), col("dst"))
    val a = Similarity.graphBeamSearch(clustered, g, probeMax = 4, k = 5)
      .collect().toSet
    val b = Similarity.graphBeamSearch(clustered.repartition(11),
      g.repartition(5), probeMax = 4, k = 5).collect().toSet
    assert(a == b)
  }

  test("incremental insert finds in-cluster neighbors for new vectors") {
    // hold out two vectors per cluster as the "new" batch
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val r = Similarity.knnGraphInsertRecall(base, batch, k = 5,
      target = 0.9).collect().head
    assert(r.getLong(1) == 30, "6 new ids x 5 truth rows")
    assert(r.getBoolean(3), s"insert recall >= 0.9 on clustered data: $r")
  }

  test("insert leaves untouched nodes' rows bit-identical") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 5, rounds = 2)
    val ins = Similarity.knnGraphInsert(base, g, batch, k = 5)
    val batchIds = batch.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val touched = ins.filter(col("src").isin(batchIds.toSeq: _*))
      .select("dst").collect().map(_.getLong(0)).toSet
    val before = g.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filterNot(t => touched.contains(t._1)).toSet
    val after = ins.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filter(t => !touched.contains(t._1) && !batchIds.contains(t._1))
      .toSet
    assert(before == after, "non-affected base rows pass through")
  }

  test("insert re-ranks affected nodes monotonically (kth best " +
      "never drops)") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 5, rounds = 2)
    val ins = Similarity.knnGraphInsert(base, g, batch, k = 5)
    def kthBest(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("src").agg(min(col("cosine")).as("kth"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val before = kthBest(g)
    val after = kthBest(ins)
    before.foreach { case (src, b) =>
      assert(after(src) >= b, s"node $src kth-best regressed: $b -> ${after(src)}")
    }
  }

  test("insert is partitioning-independent") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 4, rounds = 1)
    val a = Similarity.knnGraphInsert(base, g, batch, k = 4)
      .collect().toSet
    val b = Similarity.knnGraphInsert(base.repartition(11),
      g.repartition(5), batch.repartition(3), k = 4).collect().toSet
    assert(a == b)
  }

  test("stream-ingest-then-compact reproduces the batch insert " +
      "bit-for-bit") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 5, rounds = 2)
    val direct = Similarity.knnGraphInsert(base, g, batch, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val compacted = Similarity.knnGraphCompact(g,
        Similarity.knnGraphForwardEdges(base, g, batch, k = 5), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(direct == compacted)
  }

  test("refine after insert connects batch siblings (full-truth " +
      "recall monotone)") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val r = Similarity.knnGraphRefineRecall(base, batch, k = 5)
      .collect().head
    assert(r.getLong(2) == 30, "6 new ids x 5 full-truth rows")
    assert(r.getBoolean(5),
      s"refine never drops full-truth recall: $r")
    // on the clustered fixture the insert is blind to each new id's
    // same-batch cluster sibling; the refine round must find it
    assert(r.getLong(1) > r.getLong(0),
      s"refine strictly improves here (sibling edges): $r")
  }

  test("refine keeps per-node kth-best monotone and ranks 1..k") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 5, rounds = 1)
    val ins = Similarity.knnGraphInsert(base, g, batch, k = 5)
    val ref = Similarity.knnGraphRefine(clustered, ins, k = 5)
    def kth(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("src").agg(min(col("cosine")).as("kth"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val before = kth(ins); val after = kth(ref)
    before.foreach { case (s, b) => assert(after(s) >= b, s"node $s") }
    val ranks = ref.groupBy("src")
      .agg(collect_list(col("rank")).as("rs")).collect()
    ranks.foreach(r => assert(
      r.getSeq[Long](1).sorted == (1L to r.getSeq[Long](1).length),
      s"ranks dense for ${r.getLong(0)}"))
  }

  test("refine is partitioning-independent") {
    val batch = clustered.filter(col("vec_id") % 12 < 2)
    val base = clustered.filter(col("vec_id") % 12 >= 2)
    val g = Similarity.knnGraphNNDescent(base, k = 4, rounds = 1)
    val ins = Similarity.knnGraphInsert(base, g, batch, k = 4)
    val a = Similarity.knnGraphRefine(clustered, ins, k = 4)
      .collect().toSet
    val b = Similarity.knnGraphRefine(clustered.repartition(9),
      ins.repartition(4), k = 4).collect().toSet
    assert(a == b)
  }

  test("delete repairs through the hole and leaves no dangling edges") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 5, rounds = 2)
    val del = clustered.filter(col("vec_id") % 12 === 0)
      .select("vec_id") // one per cluster
    val upd = Similarity.knnGraphDelete(clustered, g, del, k = 5)
    val delIds = Set(0L, 12L, 24L)
    val rows = upd.collect()
    assert(rows.forall(r => !delIds.contains(r.getLong(0))),
      "deleted ids keep no adjacency rows")
    assert(rows.forall(r => !delIds.contains(r.getLong(2))),
      "no edge points at a deleted id")
    // survivors that lost their cluster-mate edge must refill to k
    // from the deleted node's former neighborhood (pure in-cluster)
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.size == 33 && bySrc.values.forall(_.length == 5),
      "every survivor still carries k edges")
  }

  test("delete certificate: zero dangling, high repair recall") {
    val del = clustered.filter(col("vec_id") % 12 === 0).select("vec_id")
    val r = Similarity.knnGraphDeleteCert(clustered, del, k = 5,
      target = 0.9).collect().head
    assert(r.getLong(0) == 0L, s"dangling: $r")
    assert(r.getBoolean(4), s"repair recall >= 0.9 on clustered data: $r")
  }

  test("delete leaves unaffected nodes' rows bit-identical") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 5, rounds = 2)
    val del = clustered.filter(col("vec_id") % 12 === 0).select("vec_id")
    val delIds = Set(0L, 12L, 24L)
    val affected = g.filter(col("dst").isin(delIds.toSeq: _*) &&
        !col("src").isin(delIds.toSeq: _*))
      .select("src").collect().map(_.getLong(0)).toSet
    val upd = Similarity.knnGraphDelete(clustered, g, del, k = 5)
    val untouched = (r: org.apache.spark.sql.Row) =>
      !affected.contains(r.getLong(0)) && !delIds.contains(r.getLong(0))
    val before = g.collect().filter(untouched).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val after = upd.collect().filter(untouched).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(before == after)
  }

  test("delete is partitioning-independent") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 4, rounds = 1)
    val del = clustered.filter(col("vec_id") % 12 === 0).select("vec_id")
    val a = Similarity.knnGraphDelete(clustered, g, del, k = 4)
      .collect().toSet
    val b = Similarity.knnGraphDelete(clustered.repartition(7),
      g.repartition(3), del.repartition(2), k = 4).collect().toSet
    assert(a == b)
  }

  test("beam/insert one-task twins are bit-identical to the " +
      "relational regimes") {
    // r14 optimization: graphBeamSearch / knnGraphInsert route bounded
    // corpora through LocalKnn one-task twins — force the relational
    // regime (localMax* = 0) and assert row-set equality, the
    // a6/g6/g9 regime-twin pattern
    val g = Similarity.knnGraphNNDescent(clustered, k = 5, rounds = 2)
      .select(col("src"), col("dst"), col("cosine"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val bLocal = Similarity.graphBeamSearch(clustered,
      g.select("src", "dst"), probeMax = 7)
    val bDist = Similarity.graphBeamSearch(clustered,
      g.select("src", "dst"), probeMax = 7, localMaxVectors = 0L)
    assert(rows(bLocal) == rows(bDist))
    val base = clustered.filter(col("vec_id") % 7 =!= 0)
    val batch = clustered.filter(col("vec_id") % 7 === 0)
    val gb = Similarity.knnGraphNNDescent(base, k = 5, rounds = 2)
    val iLocal = Similarity.knnGraphInsert(base, gb, batch, k = 5)
    val iDist = Similarity.knnGraphInsert(base, gb, batch, k = 5,
      localMaxVectors = 0L, localMaxMergeRows = 0L)
    assert(rows(iLocal) == rows(iDist))
  }

  test("ranks are 1..k per source with descending rounded cosine") {
    val g = Similarity.knnGraphNNDescent(clustered, k = 5, rounds = 1)
      .collect().groupBy(_.getLong(0))
    g.foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to rows.length))
      val cos = byRank.map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse, "cosine non-increasing in rank")
    }
  }
}
