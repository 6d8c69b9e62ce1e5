package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Pipeline
import graft.io.CytoscapeJson

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` holds one entry per implemented operator (QueryDefs);
  * `oracleSql` the matching DuckDB SQL (OracleSql). Every entry carries
  * an oracle — including the seeded randomization chain (replayed as
  * SQL CTEs), the streaming queries (batch twin + watermark cutoff),
  * and the certified diameter (unrolled semi-naive BFS). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows > 0): the full reference §3.1 interactive-search path —
    * dataset build (F1→J9→G2→A1→J2/J3/J4/J6→A4) → gene search (Q2) →
    * 1-hop ego subnet (J10) → Cytoscape JSON elements (S10). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ds = Pipeline.build(
      TestMapping.interactions(spark, dir),
      threshold = TestMapping.Threshold,
      annotations = Pipeline.Annotations(
        baitNames = Some(TestMapping.baitNamesTable(spark, dir)),
        aliasRanges = Some(TestMapping.aliasRanges(spark, dir)),
        aliasNames = Some(TestMapping.aliasTable(spark, dir)),
        intronic = Some(TestMapping.intronicRegions(spark, dir))))
    // "BN7": the J2 bait-name overwrite renames promoter 7 from its raw
    // "S7" to the HindIII annotation id — search the annotated name,
    // like the reference searches post-annotation gene_names.
    val subnet = Pipeline.searchDataset(ds, "BN7")
    CytoscapeJson.nodeElements(subnet.nodes)
      .unionAll(CytoscapeJson.edgeElements(subnet.edges))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDefs.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
