package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (not a test): measures the CoSE repulsion regime
  * crossover — exact one-task-per-component (coseLocal, O(n²·iters))
  * vs grid-binned far-field (coseBarnesHut, O(n·levels·iters) plus
  * fixed per-round stage overhead) — at several single-component node
  * counts, to set Layout.BhMinNodes from data instead of instinct.
  *
  * The graph is a single ring component of n nodes (worst case for
  * the one-task regime: nothing to parallelize across components),
  * iters=12 / levels=3 for both regimes.
  *
  *   sbt "Test/runMain graft.BhProbe"
  */
object BhProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(1000, 2000, 4000, 8000, 16000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val p = graft.core.Layout.CoseParams(iters = 12)
    println("component_nodes  exact_s  bh_s  bh_local_s")
    for (n <- sizes) {
      val ids = (0 until n).map(i => f"n$i%06d")
      val nodes = ids.toDF("id")
      val edges = ids.zip(ids.tail :+ ids.head).toDF("src", "dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val exactS =
        if (n <= 16000) time(graft.core.Layout.cose(nodes, edges, p).count())
        else Double.NaN // quadratic: measured through 16k, then runaway
      val bhS = time(graft.core.Layout.coseBarnesHut(nodes, edges, p).count())
      val bhLocalS =
        time(graft.core.Layout.coseLocalBarnesHut(nodes, edges, p).count())
      println(f"$n%15d  $exactS%7.1f  $bhS%5.1f  $bhLocalS%10.1f")
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }
}
