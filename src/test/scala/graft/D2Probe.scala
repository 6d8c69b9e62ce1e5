package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Stage timing for d2_minhash_lsh at a given SF: where do the seconds
  * go — banding (shingle+md5+minima), the bucket self-join, or the
  * pair verification (second shingle pass + array intersect/union)?
  *   sbt "Test/runMain graft.D2Probe [sfDir]"
  */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d2probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    for (_ <- 0 until 2) {
      time("shingles (inlined tokenizer)") {
        docs.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 3))).as("__s"))
          .count()
      }
      time("shingles (bound tokens)") {
        docs.select(col("doc_id"),
            graft.ext.TextOps.tokens(lower(col("text"))).as("__toks"))
          .select(col("doc_id"),
            explode(array_distinct(Dedup.shinglesOfTokens(col("__toks"), 3))).as("__s"))
          .count()
      }
      time("shingles + 2 md5 + conv") {
        docs.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 3))).as("__s"))
          .select(col("doc_id"),
            conv(substring(md5(concat(col("__s"), lit(":a"))), 1, 15), 16, 10)
              .cast("long").as("n1"),
            (conv(substring(md5(concat(col("__s"), lit(":b"))), 1, 15), 16, 10)
              .cast("long") % 140737488355327L).as("n2"))
          .agg(sum((col("n1") % 1000L) + (col("n2") % 1000L))).collect()
        1L
      }
      time("bands") {
        Dedup.lshBands(docs, "doc_id", "text").count()
      }
      time("pairs (join+distinct)") {
        val b = Dedup.lshBands(docs, "doc_id", "text")
        b.as("l").join(b.as("r"),
            col("l.band") === col("r.band") &&
            col("l.band_hash") === col("r.band_hash") &&
            col("l.doc") < col("r.doc"))
          .select(col("l.doc"), col("r.doc")).distinct().count()
      }
      time("full minhashCandidates") {
        Dedup.minhashCandidates(docs).count()
      }
    }
    spark.stop()
  }
}
