package graft

import graft.io.CytoscapeJson

/** S10 sink: element shape, `searched` string form, `~` edge ids,
  * empty-result guard (reference network_generator_lib.R:242-275,
  * network_generator.R:88-92). */
class CytoscapeJsonSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(
    ("1_100_199", "EZH2", "1", 100L, 199L, "P", true, 2L),
    ("1_500_599", null.asInstanceOf[String], "1", 500L, 599L, "O", false, 1L))
    .toDF("fragment", "gene_names", "chr", "start", "end", "type",
      "searched", "degree")

  private def edges = Seq(("1_100_199", "1_500_599", "P-O"))
    .toDF("src", "dst", "type")

  test("node elements nest data + group, searched as string bool") {
    val els = CytoscapeJson.nodeElements(nodes).collect().map(_.getString(0))
    assert(els.length == 2)
    val seed = els.find(_.contains("\"id\":\"1_100_199\"")).get
    assert(seed.contains("\"group\":\"nodes\""))
    assert(seed.contains("\"searched\":\"true\""))
    assert(seed.contains("\"degree\":2"))
    // null names -> empty string, numbers unquoted (no sed hack needed)
    val oe = els.find(_.contains("1_500_599")).get
    assert(oe.contains("\"names\":\"\""))
    assert(oe.contains("\"start\":500"))
  }

  test("edge elements use source~target ids") {
    val el = CytoscapeJson.edgeElements(edges).collect()(0).getString(0)
    assert(el.contains("\"id\":\"1_100_199~1_500_599\""))
    assert(el.contains("\"group\":\"edges\""))
  }

  test("empty / single-node guard renders {}") {
    assert(CytoscapeJson.render(nodes.limit(1), edges.limit(0)) == "{}")
    assert(CytoscapeJson.render(nodes.limit(0), edges.limit(0)) == "{}")
    assert(CytoscapeJson.render(nodes, edges).startsWith("["))
  }
}
