package graft

import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Serving}

/** Pins the co-located-join property of the bucketed edge snapshot
  * (Serving.writeBucketedEdges): src-keyed aggregations and
  * bucketed⋈bucketed equi-joins over the standing edges must plan
  * with ZERO Exchange — the layout, not the optimizer, supplies the
  * distribution. A regression here silently reintroduces a full edge
  * shuffle per query at cluster scale. */
class BucketedJoinSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("bucketed edges: src-keyed agg and self-join plan with zero Exchange") {
    val edges = edgesOf(for (i <- 0 until 200) yield
      (s"n${i % 37}", s"n${(i * 7 + 3) % 41}")).filter(col("src") =!= col("dst"))
    val sym = GraphOps.symmetrize(edges)
    Serving.writeBucketedEdges(sym, "bjs_edges")
    val t = spark.table("bjs_edges")

    // degree: the bucketed scan's HashPartitioning(src) satisfies the
    // aggregation's required distribution — no shuffle
    val deg = t.groupBy("src").agg(count(lit(1)).as("degree"))
    val degPlan = planOf(deg)
    assert(!degPlan.contains("Exchange"), s"degree plan shuffled:\n$degPlan")

    // bucketed ⋈ bucketed on the bucket key: sort-merge join straight
    // off the pre-sorted buckets, no Exchange of ANY kind on either
    // side (broadcast disabled — the fixture is small enough that AQE
    // would otherwise broadcast, which hides the co-location property
    // this spec exists to pin)
    val other = t.select(col("src"), col("dst").as("dst2"))
    val j = t.join(other, Seq("src"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val jPlan =
      try planOf(t.join(other, Seq("src")))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!jPlan.contains("Exchange"), s"self-join plan shuffled:\n$jPlan")

    // layout changes nothing semantically: degree == unbucketed degree
    val expect = sym.groupBy("src").agg(count(lit(1)).as("degree"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = deg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // and the join row count matches the unbucketed join
    assert(j.count() ==
      sym.join(sym.select(col("src"), col("dst").as("dst2")), Seq("src")).count())
  }
}
