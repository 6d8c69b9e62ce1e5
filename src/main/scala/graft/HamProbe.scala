package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Multimodal
/** Round-9 evidence probe: the non-planted pair count by hamming
  * distance for the m6_phash_neardup fixture corpus — run at sf1 to
  * measure the random-pair margin under the correlated-gradient-bit
  * reality (iid estimates are optimistic). Measured at sf1:
  * 5:2, 6:1, 7:5, 8:10 and nothing below 5 -> gate threshold 2. */
object HamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_sf1") + "/documents.parquet")
    val base = Multimodal.synthesizeCellImages(docs, "doc_id")
    val planted = Multimodal.perturbImages(
      base.filter(col("media_id") % 7 === 0), shiftId = 100000L)
    val pairs = Multimodal.phashNearDup(base.unionByName(planted),
      maxHamming = 8)
    val nonPlanted = pairs.filter(col("media_b") =!= col("media_a") + 100000)
      .groupBy("hamming").count().orderBy("hamming").collect()
    println("[probe] non-planted pairs by hamming: " +
      nonPlanted.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", "))
    spark.stop()
  }
}
