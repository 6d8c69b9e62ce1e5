package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** One-off: trained-vs-sampled PQ recall at sf1 (/tmp/graft_sf1), to
  * pin the s3 trained-codebook certificate target on the largest
  * local data.  sbt "Test/runMain graft.PqSf1Probe" */
object PqSf1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/tmp/graft_sf1/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 20)
    val scb = Similarity.pqCodebook(emb, m = 8, ks = 16, dim = 64)
    val sr = Similarity.pqRecall(emb, scb, probes, k = 10, target = 0.1)
      .collect()(0)
    println(s"sf1 sampled recall@10 = ${sr.getDouble(2)}")
    val tcb = Similarity.pqCodebookKMeans(emb, m = 8, ks = 16, dim = 64,
      iters = 2)
    val tr = Similarity.pqRecall(emb, tcb, probes, k = 10, target = 0.1)
      .collect()(0)
    println(s"sf1 trained recall@10 = ${tr.getDouble(2)}")
    spark.stop()
  }
}
