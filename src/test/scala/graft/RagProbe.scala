package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-timing probe for the rag_retrieve bench lane (round 11: the
  * composed lane benches ~12 s at sf0.1 while its stages bench far
  * less individually; this isolates which seam pays).
  * Run: sbt "Test/runMain graft.RagProbe [sfDir]" */
object RagProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime; val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime - s) / 1e9}%8.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 400)
    t("docs.count")(docs.count())
    val chunks = graft.ext.Sampling.chunkDocs(docs, chunkTokens = 16,
      overlap = 4)
    t("chunkDocs")(chunks.count())
    val cid = chunks.withColumn("vec_id",
        (row_number().over(Window.orderBy(col("doc_id"),
          col("chunk_idx"))) - 1).cast("long"))
      .localCheckpoint(eager = true)
    t("cid checkpoint")(cid.count())
    val vecs = graft.ext.TextOps.hashEmbed(cid, idCol = "vec_id",
        textCol = "chunk_text")
      .withColumnRenamed("doc_id", "vec_id")
      .localCheckpoint(eager = true)
      .filter(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")) > 0)
    t("hashEmbed+ckpt")(vecs.count())
    var g: org.apache.spark.sql.DataFrame = null
    t("knnGraphNNDescent")({
      g = graft.ext.Similarity.knnGraphNNDescent(vecs); g.count() })
    var pool: org.apache.spark.sql.DataFrame = null
    t("graphBeamSearch")({
      pool = graft.ext.Similarity.graphBeamSearch(vecs,
          g.select(col("src"), col("dst")), probeMax = 5, k = 20)
        .select(col("probe_id"), col("corpus_id"),
          col("cosine").as("rel"))
      pool.count() })
    var sel: org.apache.spark.sql.DataFrame = null
    t("mmrFromPool")({
      sel = graft.ext.Retrieval.mmrFromPool(
        vecs.select(col("vec_id").as("vid"),
          col("embedding").cast("array<double>").as("v")), pool, k = 10)
      sel.count() })
    t("final join")(
      sel.join(cid.select(col("vec_id").as("corpus_id"), col("doc_id"),
          col("chunk_idx")), Seq("corpus_id")).count())
    spark.stop()
  }
}
