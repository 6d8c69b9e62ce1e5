package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** One-JVM A/B of the fused native cosine vs the composed
  * zip_with/aggregate form it replaced: a brute-force scan (every
  * corpus vector against a 20-probe broadcast) at sf0.1, alternating
  * reps so JIT/cache effects land on both sides. Run:
  *   sbt "Test/runMain graft.CosineBenchProbe [sfDir]"
  */
object CosineBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val n = emb.count()
    val probes = broadcast(emb.orderBy("vec_id").limit(20)
      .select(col("vec_id").as("pid"), col("v").as("pv")))

    def scan(form: String): Double = {
      val c = form match {
        case "fused" => Similarity.cosine(col("v"), col("pv"))
        case _ => Similarity.cosineComposed(col("v"), col("pv"))
      }
      val t0 = System.nanoTime()
      emb.crossJoin(probes).select(sum(c).as("s")).collect()
      (System.nanoTime() - t0) / 1e9
    }

    scan("fused"); scan("composed") // warm both codepaths
    val reps = 5
    val times = (0 until reps).flatMap { _ =>
      Seq("fused" -> scan("fused"), "composed" -> scan("composed"))
    }
    def med(k: String) = {
      val xs = times.collect { case (`k`, t) => t }.sorted
      xs(xs.length / 2)
    }
    println(f"rows=$n fused=${med("fused")}%.3fs composed=${med("composed")}%.3fs " +
      f"speedup=${med("composed") / med("fused")}%.2fx")
    spark.stop()
  }
}
