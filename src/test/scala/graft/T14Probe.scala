package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for the t14_embed_knn bench lane (round 11: the
  * lane benched 13-15 s at sf0.1 on 2000 ~50-token docs — pathological
  * for ~100k bigram rows; this isolates which stage pays).
  * Run: sbt "Test/runMain graft.T14Probe [sfDir]" */
object T14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 2000)
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime; val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime - s) / 1e9}%8.2f s  rows=$n")
    }
    t("docs.count")(docs.count())
    val emb = graft.ext.TextOps.hashEmbed(docs)
    t("hashEmbed.count")(emb.count())
    t("hashEmbed.count rep2")(emb.count())
    // stage-internal replication (mirrors TextOps.hashEmbed)
    locally {
      val dim = 64
      val toks = graft.ext.TextOps.tokens(lower(col("text")))
      val bgs = when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat(element_at(toks, i), lit(" "),
              element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
      val exploded = docs
        .select(col("doc_id"), explode(bgs).as("__bg"))
      t("stage explode bigrams")(exploded.count())
      val hashed = exploded.select(col("doc_id"),
        pmod(conv(substring(md5(col("__bg")), 1, 12), 16, 10)
          .cast("long"), lit(dim)).as("__b"),
        when(conv(substring(md5(col("__bg")), 32, 1), 16, 10)
          .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
          .as("__s"))
      t("stage hash")(hashed.agg(sum(col("__b"))).collect().length.toLong)
      val agg1 = hashed.groupBy("doc_id", "__b")
        .agg(sum(col("__s")).as("__v"))
      t("stage agg1")(agg1.count())
      val agg2 = agg1.groupBy("doc_id")
        .agg(array((0 until dim).map(i =>
            coalesce(sum(when(col("__b") === i, col("__v"))), lit(0L))): _*)
            .as("__raw"),
          sqrt(sum(col("__v") * col("__v")).cast("double")).as("__n"))
      t("stage agg2")(agg2.agg(sum(col("__n"))).collect().length.toLong)
      val fin = docs.select(col("doc_id"))
        .join(agg2, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__n") > 0,
            transform(col("__raw"), x =>
              graft.ext.Num.roundLike(x.cast("double") / col("__n"), 6)
                .cast("float")))
            .otherwise(array_repeat(lit(0.0f), dim)).as("embedding"))
      t("stage final project")(
        fin.select(posexplode(col("embedding"))).count())
    }
    val expl = emb.select(col("doc_id"), posexplode(col("embedding")))
      .select(col("doc_id"), col("pos").cast("long").as("dim_i"),
        col("col").cast("double").as("val"))
    t("posexplode.count")(expl.count())
    t("posexplode collect-ish")(
      expl.agg(sum(col("val"))).collect().length.toLong)
    val emb2 = emb.localCheckpoint(eager = true)
    t("posexplode over ckpt")(
      emb2.select(col("doc_id"), posexplode(col("embedding"))).count())
    val embF = emb.filter(aggregate(col("embedding"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")) > 0)
    t("filtered.count")(embF.count())
    val knn = graft.ext.Similarity.bruteForceTopK(embF,
      embF.filter(col("doc_id") < 5), k = 5,
      idCol = "doc_id", vecCol = "embedding")
    t("bruteForceTopK.count")(knn.count())
    t("bruteForceTopK rep2")(knn.count())
    val embC = embF.localCheckpoint(eager = true)
    val knn2 = graft.ext.Similarity.bruteForceTopK(embC,
      embC.filter(col("doc_id") < 5), k = 5,
      idCol = "doc_id", vecCol = "embedding")
    t("topK over checkpointed")(knn2.count())
    spark.stop()
  }
}
