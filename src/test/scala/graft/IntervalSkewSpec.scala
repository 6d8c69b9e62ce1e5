package graft

import org.apache.spark.sql.functions._
import graft.core.Intervals

/** SURVEY §4 names chromosome skew (chr1 ~10× chrY) as the hazard for
  * the J3/J5 interval joins. The bucketed interval join is an EQUI-join
  * on (chr, bucket), which is exactly the shape AQE's skew-join
  * splitting handles: this spec builds a fixture where one (chr,
  * bucket) key holds ~99% of the rows, lowers the AQE skew thresholds
  * to fixture scale, and asserts from the FINAL adaptive plan that the
  * skewed partition was actually split (skew=true on the join) — plan
  * evidence, not an assumption, that the join's scale hazard is handled
  * by runtime re-planning rather than by luck of the data. */
class IntervalSkewSpec extends SparkSpec {

  test("AQE splits the skewed (chr, bucket) partition of the overlap join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force sort-merge (skew splitting targets SMJ) and thresholds
      // proportionate to the fixture (defaults are 256MB-scale)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // left: 200k fragments, ALL in (chr1, bucket 0) — the hotspot —
      // plus a sprinkle of chr2 rows across buckets for contrast
      val hot = spark.range(200000).select(lit("1").as("chr"),
        (col("id") % 900000L).as("start"),
        (col("id") % 900000L + 50L).as("end"))
      val cold = spark.range(1000).select(lit("2").as("chr"),
        (col("id") * 1000000L).as("start"),
        (col("id") * 1000000L + 50L).as("end"))
      val left = hot.unionAll(cold)
      // right: features concentrated on the same hotspot key
      val right = spark.range(500).select(lit("1").as("chr"),
        (col("id") * 1500L).as("start"), (col("id") * 1500L + 200L).as("end"),
        concat(lit("f"), col("id") % 3).as("feature"))

      val joined = Intervals.overlapJoin(left, right)
      // execute THIS query execution (count() would plan a fresh one
      // whose adaptive plan never finalizes)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "expected a skew-split sort-merge join in the final adaptive " +
          "plan; got:\n" + finalPlan.take(2000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
