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
