package graft

import org.apache.spark.sql.functions._
import graft.core.Intervals

/** Bucketed interval join ≡ brute-force range join (including
  * bucket-straddling intervals), nearest join, probe search. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", "1", 100L, 250L), ("b", "1", 900L, 1100L), // b straddles 1k bucket
    ("c", "2", 100L, 199L), ("d", "1", 5000L, 5999L))
    .toDF("id", "chr", "start", "end")
    .select(col("id"), col("chr"), col("start"), col("end"))

  private def right = Seq(
    ("1", 200L, 300L, "r1"), ("1", 950L, 2050L, "r2"), // r2 spans 3 buckets
    ("2", 150L, 160L, "r3"), ("1", 7000L, 7100L, "r4"))
    .toDF("chr", "start", "end", "name")

  test("overlapJoin matches brute force with small buckets") {
    val bucketed = Intervals.overlapJoin(left, right, rightPrefix = "r_",
        bucketWidth = 1000L)
      .select("id", "r_name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = left.as("l").join(right.as("r"),
        col("l.chr") === col("r.chr") &&
        col("l.start") <= col("r.end") && col("l.end") >= col("r.start"))
      .select(col("l.id"), col("r.name")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(bucketed == brute)
    assert(brute == Set("a" -> "r1", "b" -> "r2", "c" -> "r3"))
  }

  test("overlapJoin emits each overlapping pair exactly once") {
    // b [900,1100] x r2 [950,2050] share buckets 0 and 1 at width 1000
    val rows = Intervals.overlapJoin(left, right, rightPrefix = "r_",
        bucketWidth = 1000L)
      .filter(col("id") === "b").collect()
    assert(rows.length == 1)
  }

  test("overlapJoin left keeps unmatched rows with nulls") {
    val out = Intervals.overlapJoin(left, right, rightPrefix = "r_",
      joinType = "left", bucketWidth = 1000L)
    assert(out.count() == 4)
    val d = out.filter(col("id") === "d").collect()(0)
    assert(d.isNullAt(d.fieldIndex("r_name")))
  }

  test("nearestJoin picks the closest right interval per left row") {
    val probes = Seq(("p", "1", 400L, 500L)).toDF("probe_id", "chr", "start", "end")
      .select(col("probe_id"), col("chr"), col("start"), col("end"))
    val out = Intervals.nearestJoin(probes, right, rightPrefix = "r_",
      maxDistance = 10000L, bucketWidth = 1000L).collect()(0)
    // distances: r1 [200,300] -> 100; r2 [950,2050] -> 450; r4 -> 6500
    assert(out.getString(out.fieldIndex("r_name")) == "r1")
    assert(out.getLong(out.fieldIndex("__dist")) == 100L)
  }

  test("nearestJoin distance 0 for overlaps; ties break on start") {
    val probes = Seq(("p", "1", 250L, 960L)).toDF("probe_id", "chr", "start", "end")
      .select(col("probe_id"), col("chr"), col("start"), col("end"))
    val out = Intervals.nearestJoin(probes, right, rightPrefix = "r_",
      maxDistance = 10000L, bucketWidth = 1000L).collect()
    assert(out.length == 1) // one nearest per left row
    val r = out(0)
    assert(r.getLong(r.fieldIndex("__dist")) == 0L)
    assert(r.getString(r.fieldIndex("r_name")) == "r1") // start 200 < 950
  }

  test("probeOverlap expands the query range symmetrically") {
    val frags = left.withColumnRenamed("id", "fragment")
    assert(Intervals.probeOverlap(frags, "1", 300L, 400L).count() == 0)
    assert(Intervals.probeOverlap(frags, "1", 300L, 400L, expand = 100L)
      .collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("probeNearest returns exactly the closest fragment") {
    val frags = left.withColumnRenamed("id", "fragment")
    val hit = Intervals.probeNearest(frags, "1", 2000L, 2100L).collect()
    assert(hit.length == 1 && hit(0).getString(0) == "b") // 900 away vs d 2900
  }
}
