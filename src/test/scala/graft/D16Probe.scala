package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for the d16 exact-span pipeline. */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d16probe] $name%-28s rows=$n%9d  ${(System.nanoTime()-t0)/1e9}%7.2fs")
    }
    val grams = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("text").as("__t"))
      .filter(length(col("__t")) >= 40)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")) - lit(39))).as("pos"),
        col("__t"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("__t").substr(col("pos"), lit(40))).as("h"))
    t("grams")(grams.count())
    val grp = grams.groupBy("h").agg(count(lit(1)).as("__n"),
      min(col("doc_id") * lit(4294967296L) + col("pos")).as("__canon"))
    t("grp")(grp.count())
    val dups = grams.join(grp, Seq("h"))
      .filter(col("__n") >= 2 &&
        (col("doc_id") * lit(4294967296L) + col("pos")) =!= col("__canon"))
      .select(col("doc_id"), col("pos"))
    t("dups")(dups.count())
    t("spans full")(graft.ext.Dedup.exactSpans(docs).count())
    t("rewrite full")(graft.ext.Dedup.exactSpanRewrite(docs).count())
    spark.stop()
  }
}
