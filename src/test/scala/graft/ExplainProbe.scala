package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection probe: print `.explain("formatted")` for any
  * registered lane — the iterate-until-it's-the-plan-you-want loop.
  *   sbt "Test/runMain graft.ExplainProbe <lane> [sfDir]" */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val lane = args.headOption.getOrElse("d16_exact_spans")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(lane)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
