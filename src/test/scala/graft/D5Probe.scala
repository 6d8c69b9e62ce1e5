package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Stage timing for d5_embedding_neardups: keying (band-key lambdas)
  * vs the bucket join vs cosine verification.
  *   sbt "Test/runMain graft.D5Probe [sfDir]"
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val bits = math.max(4, math.ceil(math.log(n / 125.0) / math.log(2)).toInt)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d5probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$r")
    }

    for (_ <- 0 until 2) {
      time("keys (cast inlined)") {
        emb.select(col("vec_id"),
          posexplode(Dedup.signBandKeys(col("embedding").cast("array<double>"),
            4, bits, 64)).as(Seq("band", "key"))).count()
      }
      time("keys (cast bound)") {
        emb.select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
          .select(col("vec_id"),
            posexplode(Dedup.signBandKeys(col("__v"), 4, bits, 64))
              .as(Seq("band", "key"))).count()
      }
      time("full embeddingNearDups") {
        Dedup.embeddingNearDups(emb, threshold = 0.3,
          bands = 4, bitsPerBand = bits, dim = 64).count()
      }
    }
    spark.stop()
  }
}
