package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10 Cytoscape.js JSON sink: nodes + edges nested under `data` with a
  * `group` tag; edge id = "source~target"; `searched` emitted as the
  * string "true"/"false"; NA→""; no scientific notation (typed longs
  * make the reference's sed fix-up obsolete).
  * Reference: generate_cytoscape_json, network_generator_lib.R:242-275;
  * sed hack backend.py:83-85.
  */
object CytoscapeJson {

  /** Node elements: one JSON string per node. Extra columns (features,
    * degree, …) are carried into `data` automatically. */
  def nodeElements(nodes: DataFrame): DataFrame = {
    val base = Seq("fragment", "gene_names", "chr", "start", "end", "type")
    val extras = nodes.columns.filterNot(base.contains)
    val searched =
      if (nodes.columns.contains("searched"))
        Seq(when(col("searched"), lit("true")).otherwise(lit("false"))
          .as("searched"))
      else Nil
    val extraCols = extras.filterNot(_ == "searched").map(c => col(c).as(c))
    val data = struct(
      Seq(col("fragment").as("id"),
        coalesce(col("gene_names"), lit("")).as("names"),
        col("chr"), col("start"), col("end"), col("type")) ++
      searched ++ extraCols: _*)
    nodes.select(to_json(struct(data.as("data"), lit("nodes").as("group")))
      .as("element"))
  }

  /** Edge elements: id = "source~target". */
  def edgeElements(edges: DataFrame): DataFrame = {
    val typeCol =
      if (edges.columns.contains("type")) Seq(col("type").as("type")) else Nil
    val data = struct(
      Seq(col("src").as("source"), col("dst").as("target")) ++ typeCol ++
      Seq(concat_ws("~", col("src"), col("dst")).as("id")): _*)
    edges.select(to_json(struct(data.as("data"), lit("edges").as("group")))
      .as("element"))
  }

  /** Full document: "[" ++ elements ++ "]" — or the literal "{}" for an
    * empty / single-node subnet (reference empty-result guard,
    * network_generator.R:88-92; search_query.R:29-30).
    * Collects to the driver: the output is a per-query visualization
    * payload (bounded by the subnet size), not a data-plane artifact —
    * large exports should use `nodeElements`/`edgeElements` with
    * DataFrameWriter.text instead. */
  def render(nodes: DataFrame, edges: DataFrame): String = {
    val nodeEls = nodeElements(nodes).collect().map(_.getString(0))
    if (nodeEls.length <= 1) "{}"
    else {
      val edgeEls = edgeElements(edges).collect().map(_.getString(0))
      (nodeEls ++ edgeEls).mkString("[", ",", "]")
    }
  }
}
