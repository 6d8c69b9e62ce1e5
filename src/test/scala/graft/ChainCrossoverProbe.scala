package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (not a test): measures the swap-chain regime
  * crossover — one-task-per-replica LocalChain vs the distributed
  * windowed rounds — at several per-replica edge counts, to set
  * Chas.LocalMaxChainRows from data instead of instinct.
  *
  * Edges are synthetic fragment-id pairs (chr_start_end strings, the
  * shape the chain's bins/audits sort), deduped undirected, with a
  * ~10 mean degree. Each regime is timed on the SAME cached input
  * (count() first), nReplicates=3, rounds=Chas.DefaultRounds; best of
  * `reps` runs per cell.
  *
  *   sbt "Test/runMain graft.ChainCrossoverProbe"
  */
object ChainCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1250000L, 2500000L, 5000000L, 10000000L)
    val reps = 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edgesOfSize(e: Long) = {
      val v = e / 5 // mean degree ~10 after symmetrization
      spark.range(e).select(
          concat(lit((e % 97).toString), lit("_"),
            (col("id") % v) * 1000L, lit("_"),
            (col("id") % v) * 1000L + 999L).as("src"),
          concat(lit((e % 97).toString), lit("_"),
            ((col("id") * 2654435761L + col("id") % 7919L + 1L) % v) * 1000L,
            lit("_"),
            ((col("id") * 2654435761L + col("id") % 7919L + 1L) % v) * 1000L
              + 999L).as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    println("per_replica_edges  local_s  distributed_s")
    for (size <- sizes) {
      val edges = edgesOfSize(size)
      val n = edges.count()
      def time(localMax: Long): Double = {
        (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          graft.core.Chas.randomize(edges, nReplicates = 3, seed = 42L,
              localMaxChainRows = localMax)
            .groupBy("replica").agg(count(lit(1)))
            .collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val tLocal = time(Long.MaxValue)
      val tDist = time(0L)
      println(f"$n%17d  $tLocal%7.1f  $tDist%13.1f")
      edges.unpersist()
    }
    spark.stop()
  }
}
