package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextOps}

/** Diagnostic main (not a test): measures PQ ADC recall@10 vs the
  * exact L2 scan, clustered precision, and IVF-PQ precision at each of
  * the three /root/testdata SFs (fixed loop, no arguments), to pin the
  * s3/s4 certificate targets on data.
  *
  *   sbt "Test/runMain graft.PqProbe"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val pcb = Similarity.pqCodebook(emb, m = 8, ks = 16, dim = 64)
      val r = Similarity.pqRecall(emb, pcb, emb.filter(col("vec_id") < 20),
        k = 10, target = 0.5, m = 8, ks = 16, dim = 64).collect()(0)
      println(s"$sf  n=${emb.count()}  recall=${r.getDouble(2)}")
      val top = Similarity.pqTopK(
        Similarity.pqAssign(emb, pcb), pcb,
        emb.filter(col("vec_id") < 5), k = 10)
      top.show(5, truncate = false)
      val ce = TextOps.lmCrossEntropy(
        spark.read.parquet(s"$dir/documents.parquet"))
      ce.orderBy("doc_id").show(5, truncate = false)
      println(s"$sf ce rows=${ce.count()}")
      // clustered variant: same-cluster precision@10 of the ADC search
      val cl = TestMapping.clusteredEmbeddings(spark, dir)
      val ccb = Similarity.pqCodebook(cl, m = 8, ks = 16, dim = 64)
      val ctop = Similarity.pqTopK(
        Similarity.pqAssign(cl, ccb), ccb,
        cl.filter(col("vec_id") < 20), k = 10)
      val prec = ctop.agg(count(lit(1)).as("n_total"),
        sum(when(col("probe_id") % 16 === col("corpus_id") % 16, 1)
          .otherwise(0)).as("n_same")).collect()(0)
      println(s"$sf clustered precision@10 = " +
        s"${prec.getLong(1)}/${prec.getLong(0)}")
      // and clustered plain recall vs exact L2, for reference
      val crec = Similarity.pqRecall(cl, ccb, cl.filter(col("vec_id") < 20),
        k = 10, target = 0.5).collect()(0)
      println(s"$sf clustered recall@10 = ${crec.getDouble(2)}")
      // IVF-PQ on the same clustered corpus (kmeans coarse, nProbe=2)
      val cb2 = Similarity.codebookKMeans(cl, 16, iters = 2)
      val itop = Similarity.ivfPqTopK(
        Similarity.buildIvfPqIndex(cl, cb2, ccb), cb2, ccb,
        cl.filter(col("vec_id") < 20), k = 10, nProbe = 2)
      val ip = itop.agg(count(lit(1)).as("n"),
        sum(when(col("probe_id") % 16 === col("corpus_id") % 16, 1)
          .otherwise(0)).as("same")).collect()(0)
      println(s"$sf ivfpq precision@10 = ${ip.getLong(1)}/${ip.getLong(0)}")
      // trained sub-codebooks: isotropic recall + clustered precision
      val tcb = Similarity.pqCodebookKMeans(emb, m = 8, ks = 16, dim = 64,
        iters = 2)
      val tr = Similarity.pqRecall(emb, tcb, emb.filter(col("vec_id") < 20),
        k = 10, target = 0.1).collect()(0)
      println(s"$sf trained-pq isotropic recall@10 = ${tr.getDouble(2)}")
      val tccb = Similarity.pqCodebookKMeans(cl, m = 8, ks = 16, dim = 64,
        iters = 2)
      val ttop = Similarity.pqTopK(Similarity.pqAssign(cl, tccb), tccb,
        cl.filter(col("vec_id") < 20), k = 10)
      val tp = ttop.agg(count(lit(1)).as("n"),
        sum(when(col("probe_id") % 16 === col("corpus_id") % 16, 1)
          .otherwise(0)).as("same")).collect()(0)
      println(s"$sf trained-pq clustered precision@10 = " +
        s"${tp.getLong(1)}/${tp.getLong(0)}")
      val tcrec = Similarity.pqRecall(cl, tccb, cl.filter(col("vec_id") < 20),
        k = 10, target = 0.5).collect()(0)
      println(s"$sf trained-pq clustered recall@10 = ${tcrec.getDouble(2)}")
    }
    spark.stop()
  }
}
