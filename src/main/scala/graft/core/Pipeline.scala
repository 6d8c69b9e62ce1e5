package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end dataset-build composition mirroring the reference's main
  * flow (network_generator.R:40-290): load → threshold filter (F1) →
  * edge typing (J9) → chromosome / P-P slicing (F2/F3) → vertex build
  * (A1) → annotations (J2/J3/J4/J6) → simplify (G2) → degree (A4) →
  * metadata (A5/A9/A10) → snapshots (S9) / Cytoscape JSON (S10).
  *
  * One declarative plan per output — the reference's per-chromosome
  * process fan-out (pipeline.sh GNU parallel) collapses into Spark
  * partitioning; the chr1-task special-casing (whole-genome stats
  * computed only there) disappears because the full-DF aggregates are
  * computed once.
  */
object Pipeline {

  /** Everything the reference materializes per (organism, cell type)
    * dataset. All members are lazy plans — callers pay only for what
    * they write. */
  case class BuiltDataset(
      interactions: DataFrame, // post-threshold working set
      nodes: DataFrame,        // annotated vertex table
      edges: DataFrame,        // simplified, typed edge list with score
      degrees: DataFrame,      // A4 per-vertex degree
      graphMetadata: DataFrame,
      suggestions: DataFrame,
      chromosomes: DataFrame)

  /** Optional annotation inputs (each `None` skips that join, like the
    * reference's organism-specific branches). */
  case class Annotations(
      baitNames: Option[DataFrame] = None,     // J2  (Chr,Start,End,gene_id)
      aliasRanges: Option[DataFrame] = None,   // J3  (chr,start,end,gene_name)
      aliasNames: Option[DataFrame] = None,    // J4  (gene_name,ensembl_gene_id,alias)
      intronic: Option[DataFrame] = None)      // J6  (chr,start,end)

  /** Build one dataset from a raw interaction table (PCHiC/HiC shaped,
    * see Interactions). `chromosome` = Some("7") slices F2-style;
    * Some("PP") is the pseudo-chromosome (P-P edges only, F3). */
  def build(raw: DataFrame,
            threshold: Double = 5.0,
            annotations: Annotations = Annotations(),
            chromosome: Option[String] = None,
            hasNames: Boolean = true): BuiltDataset = {
    // F1 + F4: score threshold, MT drop — pushed to the scan by Catalyst.
    val working0 = Interactions.dropMT(
      Interactions.filterByThreshold(raw, threshold))
    // F2 chromosome slice (keeps inter-chromosomal edges touching chr).
    val working = chromosome match {
      case Some(c) if c != "PP" => Interactions.filterByChromosome(working0, c)
      case _                    => working0
    }

    // G1/G2 + J9: edges → simplify (first-wins by score then key — a
    // total order, deterministic under any partitioning) → bait typing.
    val rawEdges = Interactions.edges(working, Some(working.columns(11)))
      .select(col("src"), col("dst"), col("score"))
    val simplified = Interactions.simplifyBy(rawEdges,
      Seq(col("score"), col("src"), col("dst")))
    val typed0 = Interactions.addTypes(simplified)
    // F3: the PP pseudo-chromosome keeps only promoter-promoter edges.
    val typed = if (chromosome.contains("PP"))
      Interactions.filterPPOnly(typed0) else typed0

    // A1 vertex derivation + the annotation joins the reference applies
    // in network_generator.R:98-122 order: J2 bait names, J3 other-end
    // alias ranges, J4 promoter alias names, J6 intronic flags.
    val v0 = Interactions.vertices(working, hasNames)
    val v1 = annotations.baitNames.fold(v0)(Annotate.overwriteBaitNames(v0, _))
    val v2 = annotations.aliasRanges.fold(v1)(Annotate.annotateOtherEnds(v1, _))
    val v3 = annotations.aliasNames.fold(v2)(Annotate.annotatePromoters(v2, _))
    val nodes = annotations.intronic.fold(v3)(Annotate.flagIntronic(v3, _))

    val deg = GraphOps.degrees(typed)
    BuiltDataset(
      interactions = working,
      nodes = nodes,
      edges = typed,
      degrees = deg,
      graphMetadata = GraphOps.graphMetadata(nodes, typed),
      suggestions = Metadata.suggestions(nodes),
      chromosomes = Metadata.chromosomes(nodes))
  }

  /** Interactive-search entry (reference §3.1): search the built
    * dataset, return the subnet nodes+edges ready for the JSON sink. */
  def searchDataset(ds: BuiltDataset, query: String,
                    ensembl2name: Option[DataFrame] = None,
                    expand: Long = 0L,
                    nearest: Boolean = false): Search.Subnet =
    Search.search(ds.nodes, ds.edges, ensembl2name, query, expand, nearest)
}
