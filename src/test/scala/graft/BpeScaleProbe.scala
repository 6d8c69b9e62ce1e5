package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe for the r11 verdict's BPE scale question: is a
  * REALISTIC merge count (≥1k, en route to 32k–100k) tractable?
  *
  *   sbt "Test/runMain graft.BpeScaleProbe [sfDir] [rounds...]"
  *
  * The relational trainer pays one Spark job per merge (gate-sized at
  * 12 rounds, a 100k-job non-plan at vocab scale); the BpeLocal
  * one-task regime pays ONE word-count shuffle + one task running the
  * incremental-heap loop. This probe times bpeTrain (routed local) at
  * increasing round counts over the sf documents table and prints
  * merges/sec — the evidence line COVERAGE.md cites. */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(200, 1000, 4000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // the synthetic documents table has a ~31-word vocabulary — BPE
    // exhausts it after ~107 merges, which measures nothing. Derive a
    // REALISTIC vocabulary deterministically from the same data:
    // each position becomes the concatenation of its word trigram
    // (w_i·w_{i+1}·w_{i+2}), giving tens of thousands of distinct
    // 10–20 char words with a Zipf-ish frequency profile — the shape
    // a real tokenizer trains on.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val docs = base
      .select(col("doc_id"), posexplode(split(lower(col("text")), "\\s+")))
      .withColumn("nw", concat(col("col"),
        lead("col", 1).over(w), lead("col", 2).over(w)))
      .filter(col("nw").isNotNull)
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list("nw")).as("text"))
      .localCheckpoint()
    val nWords = docs.selectExpr("explode(split(lower(text), '\\\\s+'))")
      .distinct().count()
    println(s"[bpeprobe] sf=$sfDir distinct trigram-words = $nWords")
    rounds.foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.ext.TextOps.bpeTrain(docs, rounds = r).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] rounds=$r%6d merges=$n%6d  $sec%8.1fs  " +
        f"${n / sec}%8.1f merges/s")
    }
    spark.stop()
  }
}
