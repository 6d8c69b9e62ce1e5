package graft

import org.apache.spark.sql.SparkSession

/** Bench-honesty audit: the bench forces lanes with count(), and
  * Catalyst may legally DELETE work under a bare count (e.g. a left
  * join whose unique-keyed right side is unreferenced — the d16
  * rewrite initially lost its entire pipeline this way). For every
  * benched lane, compare the optimized full plan against the
  * optimized count() plan: a lane whose count plan has fewer
  * joins/aggregates/generates than its full plan is being
  * under-measured. */
object CountPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def shape(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : (Int, Int, Int) = {
      var joins = 0; var aggs = 0; var gens = 0
      p.foreach {
        case _: org.apache.spark.sql.catalyst.plans.logical.Join => joins += 1
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => aggs += 1
        case _: org.apache.spark.sql.catalyst.plans.logical.Generate => gens += 1
        case _ => ()
      }
      (joins, aggs, gens)
    }
    QueryDefs.benchNames.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val full = shape(df.queryExecution.optimizedPlan)
        val cnt = shape(df.groupBy().count().queryExecution.optimizedPlan)
        if (cnt._1 < full._1)
          println(s"[prune] $name: joins ${full._1} -> ${cnt._1} " +
            s"(aggs ${full._2} -> ${cnt._2}, generates ${full._3} -> ${cnt._3})")
      } catch { case e: Throwable =>
        println(s"[prune] $name ERR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
