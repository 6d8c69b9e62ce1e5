package graft

import org.apache.spark.sql.functions._
import graft.core.Interactions

/** F1/F2/F4, A1 vertex derivation (incl. the reference's gene-name
  * normalization), G2 simplify, J9 typing — exact counts and tuples on
  * the synthetic fixture, mirroring the reference's golden style
  * (tests/test_network_generator.R:47-85). */
class InteractionsSpec extends SparkSpec {

  private def working = Interactions.dropMT(
    Interactions.filterByThreshold(pchicFixture, 5.0))

  test("F1 threshold is strict > on positional column 12") {
    assert(Interactions.filterByThreshold(pchicFixture, 5.0).count() == 6)
    // 4.9 and 5.0 dropped, everything else (incl. MT row at 10.0) kept
  }

  test("F4 MT drop removes rows touching MT on either side") {
    assert(working.count() == 5)
  }

  test("F2 chromosome filter keeps edges touching the chromosome") {
    assert(Interactions.filterByChromosome(working, "2").count() == 4)
  }

  test("A1 vertices: P-wins, dedup, and reference name normalization") {
    val v = Interactions.vertices(working).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(5))).toMap
    // bait+oe fragment: P wins, names from the bait side, "-N" suffix
    // stripped, split+unique+collapse (sorted)
    assert(v("1_1000_1999") == ("Extra Hoxa1", "P"))
    // bait-only fragment; "." on the oe side of another row must not leak
    assert(v("2_3000_3999") == ("Bx", "P"))
    // plain other ends keep their names
    assert(v("1_5000_5999") == ("P5", "O"))
    assert(v.size == 3) // 1_1000, 2_3000, 1_5000 (self-loop frag = 2_3000)
  }

  test("normalizeNames drops '.' and NA, strips -N, dedups, sorts") {
    import spark.implicits._
    val out = Seq("Hoxa1-1 Hoxa1-2 . Extra Hoxa1-1", ".", "", "A B A")
      .toDF("bag")
      .select(Interactions.normalizeNames(col("bag")).as("n"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("Extra Hoxa1", "", "", "A B")))
  }

  test("G2 simplify drops self-loops and keeps first-wins by order") {
    val edges = Interactions.edges(working, Some("score"))
      .select("src", "dst", "score")
    val simple = Interactions.simplifyBy(edges,
      Seq(col("score"), col("src"), col("dst"))).collect()
    // self-loop 2_3000<->2_3000 gone; the 1_1000<->2_3000 triplicate
    // (7.0 + 8.0 reversed + 5.5) keeps min-order 5.5
    assert(simple.length == 2)
    val dup = simple.filter(r =>
      Set(r.getString(0), r.getString(1)) ==
        Set("1_1000_1999", "2_3000_3999"))
    assert(dup.length == 1 && dup(0).getDouble(2) == 5.5)
  }

  test("G2 simplify is idempotent") {
    val edges = Interactions.edges(working, Some("score"))
      .select("src", "dst", "score")
    val once = Interactions.simplifyBy(edges,
      Seq(col("score"), col("src"), col("dst")))
    val twice = Interactions.simplifyBy(once,
      Seq(col("score"), col("src"), col("dst")))
    assert(once.count() == twice.count())
  }

  test("J9 addTypes: P-P iff the other end is some bait") {
    val edges = Interactions.edges(working, Some("score"))
      .select("src", "dst", "score")
    val typed = Interactions.addTypes(
        Interactions.simplifyBy(edges, Seq(col("score"), col("src"), col("dst"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(3))
      .toMap
    // bait set derives from the edge list itself: after simplify,
    // 2_3000_3999 no longer appears as a src, so BOTH edges are P-O
    assert(typed(("1_1000_1999", "1_5000_5999")) == "P-O")
    assert(typed(("1_1000_1999", "2_3000_3999")) == "P-O")

    // explicit chain p1->p2->p3: p2 is a bait somewhere => p1-p2 is P-P
    import spark.implicits._
    val chain = Seq(("p1", "p2"), ("p2", "p3")).toDF("src", "dst")
    val t2 = Interactions.addTypes(chain).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(t2(("p1", "p2")) == "P-P")
    assert(t2(("p2", "p3")) == "P-O")
  }

  test("F7 scrubNonAscii drops non-ASCII aliases from array columns") {
    import spark.implicits._
    val df = Seq((1, Seq("ok", "café", "fine"))).toDF("id", "alias")
    val out = Interactions.scrubNonAscii(df, "alias")
      .collect()(0).getSeq[String](1)
    assert(out == Seq("ok", "fine"))
  }

  test("F7 string form composes with annotatePromoters' collapsed alias") {
    import spark.implicits._
    val df = Seq((1, "ok café fine")).toDF("id", "alias")
    val out = Interactions.scrubNonAsciiString(df, "alias")
      .collect()(0).getString(1)
    assert(out == "ok fine")
  }
}
