package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** S9-backed interactive serving — the reference's hot search path is
  * served from a pre-built per-dataset cache (search_query.R:14 loads
  * a saved .Rdata network per request; network_generator.R:282-284
  * writes it at build time). Here the snapshot is columnar parquet
  * ([[graft.io.Readers.snapshot]]) of the annotated nodes + simplified
  * edges PLUS the Q2/Q4 token inverted index ([[Search.buildNameIndex]]),
  * opened once and pinned in executor memory: an interactive gene
  * search is then an index equi-lookup + bounded ego joins over cached
  * frames — no re-run of the TSV scan / annotation / simplify
  * pipeline per request. At 100 TB the same layout holds: the
  * snapshot is partition-prunable parquet, the index is bucketable by
  * token, and nothing in the serve path scans the raw input.
  */
object Serving {

  /** An opened snapshot: all three frames persisted and materialized
    * (the open cost is paid once, not on the first query). */
  case class ServedDataset(nodes: DataFrame, edges: DataFrame,
                           index: DataFrame)

  /** Build-time: write the serving snapshot (nodes, edges, name index)
    * under `dir`. One-off cost per dataset build, amortized over every
    * interactive query served from it. */
  def buildSnapshot(vertices: DataFrame, edges: DataFrame,
                    dir: String): Unit = {
    graft.io.Readers.snapshot(vertices, s"$dir/nodes")
    graft.io.Readers.snapshot(edges, s"$dir/edges")
    graft.io.Readers.snapshot(Search.buildNameIndex(vertices),
      s"$dir/name_index")
  }

  /** Serve-time: open a snapshot, pin all three frames, and force
    * materialization so the first user query is already warm. */
  def open(spark: SparkSession, dir: String): ServedDataset = {
    def pin(path: String) = {
      val df = graft.io.Readers.loadSnapshot(spark, path)
        .persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
    ServedDataset(pin(s"$dir/nodes"), pin(s"$dir/edges"),
      pin(s"$dir/name_index"))
  }

  /** The interactive Q2→J10→Q6 path over an opened snapshot: indexed
    * gene-name lookup, ego expansion, per-subnet degree recompute —
    * row-identical to the rebuild-everything path
    * ([[Search.subnetFromSeeds]] over freshly derived frames), which
    * the q6_search_served gate entry pins against the same oracle as
    * q6_search_subnet. */
  def geneSearch(sd: ServedDataset, term: String): Search.Subnet =
    Search.subnetFromSeeds(sd.nodes, sd.edges,
      Search.byGeneNameIndexed(sd.index, sd.nodes, term), ego = true)

  /** The FULL reference dispatcher served from a snapshot: fragment-id
    * / ensembl / range / gene-list / gene-name forms all route over
    * the pinned frames ([[Search.search]] semantics verbatim); the
    * single-term name form additionally takes the inverted-index fast
    * path. One entry point = the reference's per-request API
    * (search_query.R:19-27) minus the rebuild. */
  def search(sd: ServedDataset, query: String,
             ensembl2name: Option[DataFrame] = None,
             expand: Long = 0L, nearest: Boolean = false): Search.Subnet = {
    val q = query.trim
    val isPlainName = !q.matches(Search.FragmentIdRe) &&
      !q.toLowerCase.matches(Search.EnsemblRe) &&
      !q.matches(Search.RangeRe) &&
      q.split(Search.ListSplitRe).length == 1
    if (isPlainName) geneSearch(sd, q)
    else Search.search(sd.nodes, sd.edges, ensembl2name, q, expand, nearest)
  }
}
