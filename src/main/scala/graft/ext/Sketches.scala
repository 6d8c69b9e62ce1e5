package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch analytics: the approximate operators a 100 TB
  * pipeline substitutes for their exact (shuffle-heavy or
  * memory-unbounded) forms, each shipped WITH the exact form as a
  * one-shot certificate so the gate pins the approximation's error
  * bound, not just its plumbing.
  *
  * Why sketches at scale: `count(DISTINCT x)` needs a full shuffle of
  * the distinct key set and O(distinct) state; exact quantiles need a
  * global sort; exact heavy hitters need a full groupBy. The sketch
  * forms (HyperLogLog++, Greenwald-Khanna-style quantile digest,
  * count-min) are constant-or-log memory, single-pass, and MERGEABLE —
  * partial sketches combine associatively across partitions, so the
  * plan is one map-side pass plus a tiny reduce, no wide shuffle of the
  * data itself. Spark's builtin `approx_count_distinct` /
  * `percentile_approx` aggregates are exactly these sketches run inside
  * whole-stage codegen.
  *
  * Certificate pattern (same as [[Similarity.ivfRecall]]): the lane
  * computes approx AND exact, emits the exact value plus a boolean
  * `within_*` that the DuckDB oracle pins as literal TRUE — the oracle
  * reproduces the exact side only (the sketch internals are
  * implementation-specific), so a drifting approximation fails the
  * hash compare.
  */
object Sketches {

  /** Distinct-cardinality certificate: per group, exact
    * `count(DISTINCT)` next to HyperLogLog++ (`approx_count_distinct`,
    * relative sd `rsd`), with `within_tol` = relative error ≤ `tol`.
    * Production form at 100 TB is the HLL column alone: one pass,
    * ~1.5 KB of mergeable state per group at rsd=2%, versus the exact
    * form's shuffle of every distinct (group, key) pair. */
  def hllDistinctCert(events: DataFrame, groupCol: String = "event_type",
                      keyCol: String = "user_id", rsd: Double = 0.02,
                      tol: Double = 0.05): DataFrame =
    events.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"),
        approx_count_distinct(col(keyCol), rsd).as("n_approx"))
      .select(col(groupCol),
        col("n_exact").cast("long").as("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          lit(tol) * col("n_exact")).as("within_tol"))

  /** Per-segment mergeable HLL state: one Datasketches-HLL binary
    * column per group over the given slice — the pure per-batch unit
    * an LSM-style ingest appends (e12/e13/e15 precedent applied to
    * SKETCH state). Segments from disjoint slices union losslessly:
    * HLL registers merge by per-register max, which is associative
    * and commutative, so any batch split of the data reaches the
    * same merged register state as a one-shot aggregation. */
  def hllSegments(events: DataFrame, groupCol: String = "event_type",
                  keyCol: String = "user_id", lgK: Int = 14): DataFrame =
    events.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("hll"))

  /** The w2 certificate driven from MERGED segment state instead of a
    * one-shot aggregate: per group, union the accumulated segment
    * sketches (`hll_union_agg` — a tiny reduce over sketch binaries,
    * the 100 TB serving path reads NO raw data), estimate, and check
    * against the exact count. Emits w2's exact columns, so w2's
    * oracle pins it verbatim. */
  def hllMergedCert(segments: DataFrame, events: DataFrame,
                    groupCol: String = "event_type",
                    keyCol: String = "user_id",
                    tol: Double = 0.05): DataFrame = {
    val merged = segments.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("n_approx"))
    events.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
      .join(merged, Seq(groupCol))
      .select(col(groupCol),
        col("n_exact").cast("long").as("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          lit(tol) * col("n_exact")).as("within_tol"))
  }

  /** Quantile-sketch certificate: exact interpolated percentiles
    * (`percentile` — global sort, the form that does NOT scale) next to
    * `percentile_approx` (Greenwald-Khanna-style digest, rank error ≤
    * 1/`accuracy`), certified by a rank BRACKET stated in values:
    * `within_tol` = exact(q−rankTol) ≤ approx ≤ exact(q+rankTol). The
    * bracket is the honest form of the sketch's rank-error guarantee —
    * a direct `count(x ≤ approx)/n` check misfires on discrete columns,
    * where the tie mass at one value can exceed any rank tolerance.
    *
    * Plan shape: ONE aggregate pass computes both digests and all
    * 3·|qs| exact cut points (q, q−tol, q+tol share the sort), then a
    * per-q explode of the single result row. */
  def quantileCert(df: DataFrame, valueCol: String, qs: Seq[Double],
                   accuracy: Int = 10000, rankTol: Double = 0.01): DataFrame = {
    val v = col(valueCol)
    val k = qs.size
    val allQ = qs ++ qs.map(q => math.max(0.0, q - rankTol)) ++
      qs.map(q => math.min(1.0, q + rankTol))
    val agg = df.agg(
      percentile_approx(v, array(qs.map(lit): _*), lit(accuracy)).as("ap"),
      percentile(v, array(allQ.map(lit): _*)).as("ex"),
      count(v).as("n_total"))
    agg.select(col("n_total"),
        posexplode(col("ap")).as(Seq("pos", "approx")), col("ex"))
      .select(element_at(array(qs.map(lit): _*), col("pos") + 1).as("q"),
        round(element_at(col("ex"), col("pos") + 1), 4).as("q_exact"),
        col("n_total"),
        (col("approx") >= element_at(col("ex"), col("pos") + 1 + k) &&
          col("approx") <= element_at(col("ex"), col("pos") + 1 + 2 * k))
          .as("within_tol"))
  }

  /** Count-min heavy-hitter certificate over the lowercase whitespace
    * token stream: the exact top-`topN` tokens (count desc, token asc)
    * each checked against the count-min sketch's estimate —
    * `within_bound` = exact ≤ estimate ≤ exact + `slack`·N (count-min
    * never undercounts; its overcount is bounded by e/width·N, and the
    * lane's slack leaves a ~6× margin over that bound).
    *
    * Scale shape: the sketch is a depth×width integer grid aggregated
    * in one pass and merged across partitions — heavy-hitter queries at
    * 100 TB read the grid, not the corpus. The exact side (groupBy +
    * global top-N) exists here as the certificate's truth; the driver
    * materializes only the bounded top-N rows (collect of `topN` rows,
    * same bounded-fixture policy as the recall certificates). */
  def cmsHeavyHitters(docs: DataFrame, topN: Int = 20, depth: Int = 5,
                      width: Int = 16384, seed: Int = 42,
                      slack: Double = 0.001): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(
      explode(TextOps.tokens(lower(col("text")))).as("token"))
    val sketch = tok.stat.countMinSketch("token", depth, width, seed)
    val nTokens = sketch.totalCount()
    // sort+limit plans as TakeOrderedAndProject (per-partition top-N,
    // merged on the driver) — NOT a global window, which would funnel
    // the whole vocabulary through one task
    val top = tok.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
      .limit(topN)
      .select(col("token"), col("n_exact").cast("long"))
      .as[(String, Long)].collect()
    val bound = math.max(1L, math.ceil(slack * nTokens).toLong)
    top.toSeq.zipWithIndex.map { case ((token, exact), i) =>
      val est = sketch.estimateCount(token)
      (i + 1L, token, exact, est >= exact && est <= exact + bound)
    }.toDF("rank", "token", "n_exact", "within_bound")
  }
}
