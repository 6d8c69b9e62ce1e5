package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (not a test): measures how fast the seeded swap
  * chain mixes, to size Chas.DefaultRounds on data instead of instinct.
  * For rounds r = 1..6 prints the overlap of the randomized edge set
  * with the ORIGINAL edge set (per replica min/mean/max) and the ChAs
  * envelope the tree would embed. Mixing has saturated once both stop
  * moving with r.
  *
  *   sbt "Test/runMain graft.MixingProbe /root/testdata/sf0.1"
  */
object MixingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = TestMapping.simplified(spark, dir)
      .select(col("src"), col("dst"))
      .persist()
    val nE = edges.count()
    val orig = edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
    val feats = TestMapping.features(spark, dir)
    println(s"[mixing] $dir edges=$nE")
    (1 to 6).foreach { r =>
      val rand = graft.core.Chas.randomize(edges, nReplicates = 3,
        seed = 42L, rounds = r)
      val ov = rand.select(col("replica"),
          least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .join(orig, Seq("u", "v"), "left_semi")
        .groupBy("replica").agg(count(lit(1)).as("kept"))
        .collect().map(x => x.getLong(1) * 100.0 / nE).sorted
      // the tree-embedded statistic: ChAs envelope per feature
      val env = graft.core.Chas.randomChasEnvelope(edges, feats, 3, 42L,
        rounds = r)
        .collect().map(x => (x.getString(0),
          f"${x.getDouble(1)}%.4f..${x.getDouble(2)}%.4f")).sortBy(_._1)
      println(f"[mixing] rounds=$r overlap%%: min=${ov.head}%.2f " +
        f"mean=${ov.sum / ov.length}%.2f max=${ov.last}%.2f  env=" +
        env.map { case (f, e) => s"$f:$e" }.mkString(" "))
    }
    spark.stop()
  }
}
