package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ext.Sketches
import graft.streaming.EventStreams

/** w-family semantics on hand-checkable fixtures: as-of join tie and
  * no-match rules, and the three sketch certificates' exact sides and
  * bound checks. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id, event_type, value)
  private def events = Seq(
    // user 1: purchase at 10:00, probes before/at/after
    (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0),
    (2L, ts("2024-01-01 10:00:00"), 1L, "purchase", 50.0),
    (3L, ts("2024-01-01 10:00:00"), 1L, "click", 2.0), // equal-ts: sees #2
    (4L, ts("2024-01-01 11:00:00"), 1L, "view", 3.0),
    // equal-ts purchases: larger event_id wins the tie
    (5L, ts("2024-01-01 12:00:00"), 1L, "purchase", 60.0),
    (6L, ts("2024-01-01 12:00:00"), 1L, "purchase", 70.0),
    (7L, ts("2024-01-01 13:00:00"), 1L, "click", 4.0),
    // user 2: no purchases at all
    (8L, ts("2024-01-01 09:30:00"), 2L, "view", 5.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("asofJoinBatch pairs each probe with the latest at-or-before reference") {
    val r = EventStreams.asofJoinBatch(events).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(r(1L).isEmpty, "probe before any purchase gets NULL")
    assert(r(3L).contains(2L), "equal-ts purchase is visible (at-or-before)")
    assert(r(4L).contains(2L))
    assert(r(7L).contains(6L), "equal-ts purchases tie-break to larger id")
    assert(r(8L).isEmpty, "user with no references keeps NULL")
    assert(!r.contains(2L) && !r.contains(5L), "reference rows are not probes")
  }

  test("hllDistinctCert: exact side right, HLL within tolerance") {
    val r = Sketches.hllDistinctCert(events).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r("view") == ((2L, true)))
    assert(r("purchase") == ((1L, true)))
    assert(r("click") == ((1L, true)))
  }

  test("quantileCert: exact interpolated quantiles and in-bracket approx") {
    // values 1..100 → exact q-quantile is 1 + 99q (linear interpolation)
    val df = spark.range(1, 101).select(col("id").cast("double").as("v"))
    val r = Sketches.quantileCert(df, "v", Seq(0.25, 0.5, 0.9)).collect()
      .map(x => x.getDouble(0) -> (x.getDouble(1), x.getLong(2), x.getBoolean(3)))
      .toMap
    assert(r(0.25) == ((25.75, 100L, true)))
    assert(r(0.5) == ((50.5, 100L, true)))
    assert(r(0.9) == ((90.1, 100L, true)))
  }

  test("quantileCert bracket survives a discrete column's tie mass") {
    // 60% of the mass is the single value 1.0 — any CDF-at-value check
    // would blow a 1% rank tolerance at q=0.5; the bracket must not
    val df = (Seq.fill(60)(1.0) ++ Seq.fill(40)(2.0)).toDF("v")
    val r = Sketches.quantileCert(df, "v", Seq(0.5)).collect().head
    assert(r.getDouble(1) == 1.0 && r.getBoolean(3))
  }

  test("cmsHeavyHitters: exact top-k with count-min estimates in bound") {
    val docs = Seq(
      (0L, "apple apple apple banana"),
      (1L, "apple banana cherry"),
      (2L, "Apple cherry cherry date")
    ).toDF("doc_id", "text")
    val r = Sketches.cmsHeavyHitters(docs, topN = 3).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getBoolean(3)))
    // lowercase fold: apple=5, cherry=3, banana=2 (date=1 below cut)
    assert(r.toSeq == Seq((1L, "apple", 5L, true), (2L, "cherry", 3L, true),
      (3L, "banana", 2L, true)))
  }
}
