package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11 metadata JSON sinks: metadata.json, suggestions.json,
  * chromosomes.json, features.json, features_metadata.json —
  * the per-dataset documents the reference assembles at
  * network_generator.R:181-280 and merge_features.R:124-136.
  *
  * Small aggregates (metadata, chromosomes, features_metadata) are
  * driver-side strings: they are O(#features)/O(#chromosomes) by
  * construction. Node-scale payloads (features.json, suggestions at
  * genome scale) get DISTRIBUTED writers too — `featuresJsonLines`
  * writes one JSON object per line via DataFrameWriter, never
  * collecting a 100 TB table to the driver.
  */
object MetadataJson {

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def num(v: Any): String = v match {
    case null => "null"
    case d: Double => d.toString // values pre-rounded; typed JSON needs no sed
    case x => x.toString
  }

  /** metadata.json: the A5-A8 graph summary in the reference's field
    * order (network_generator.R:181-188). `graphMeta` = one-row DF from
    * GraphOps.graphMetadata; component/diameter/transitivity supplied by
    * the caller (iterative algorithms, computed once). */
  def metadataJson(graphMeta: DataFrame, components: Long,
                   maxComponentPct: String, diameter: Long,
                   transitivity: Double): String =
    metadataJson(graphMeta.collect()(0), components, maxComponentPct,
      diameter, transitivity)

  /** Row overload: callers that collected the A5 aggregate on their own
    * schedule (e.g. a concurrent tree-write lane) assemble the document
    * without a second Spark action. */
  def metadataJson(m: org.apache.spark.sql.Row, components: Long,
                   maxComponentPct: String, diameter: Long,
                   transitivity: Double): String = {
    def g(n: String): Any = m.get(m.fieldIndex(n))
    s"""{"nodes":${num(g("nodes"))},"edges":${num(g("edges"))},""" +
    s""""mean_degree":${num(g("mean_degree"))},""" +
    s""""components":$components,"max_component_pct":${esc(maxComponentPct)},""" +
    s""""diameter":$diameter,"transitivity":${num(transitivity)},""" +
    s""""promoters":${num(g("promoters"))},"other_ends":${num(g("other_ends"))},""" +
    s""""pp_edges":${num(g("pp_edges"))},"po_edges":${num(g("po_edges"))},""" +
    s""""interchromosomal":${num(g("interchromosomal"))}}"""
  }

  /** suggestions.json / chromosomes.json: JSON string arrays (order
    * preserved from the input DataFrame). */
  def stringArrayJson(df: DataFrame): String =
    stringArrayJson(df.collect().map(_.getString(0)).toSeq)

  /** Pre-collected overload (one Spark action can feed both this and a
    * caller that needs the values themselves). */
  def stringArrayJson(values: Seq[String]): String =
    values.map(esc).mkString("[", ",", "]")

  /** features.json (driver-side variant for interactive payloads):
    * { fragment: { feature: value } } with 2-dp display rounding (A17).
    * Bounded use only — see featuresJsonLines for the data-plane path. */
  def featuresJson(longFeatures: DataFrame): String = {
    val rows = longFeatures
      .select(col("fragment"), col("feature"),
        round(col("value"), 2).as("value"))
      .collect()
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (frag, fs) =>
      esc(frag) + ":" + fs.sortBy(_.getString(1))
        .map(r => esc(r.getString(1)) + ":" +
          (if (r.isNullAt(2)) "null" else num(r.getDouble(2))))
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
  }

  /** Distributed features sink: one JSON object per fragment per line
    * ({"fragment":...,"features":{f:v,...}}) — the scale path. */
  def featuresJsonLines(longFeatures: DataFrame, outPath: String): Unit =
    longFeatures
      .select(col("fragment"), col("feature"),
        round(col("value"), 2).as("value"))
      .groupBy(col("fragment"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("feature"), col("value"))))).as("features"))
      .select(to_json(struct(col("fragment"), col("features"))).as("line"))
      .write.mode("overwrite").text(outPath)

  /** features_metadata.json:
    * { feature: { subnet: {Abundance, ChAs, "Random ChAs interval",
    * "Mean degree"} } } from Chas.featuresMetadataSubnets (6 rows per
    * feature-triple — driver-side by construction).
    * Reference: generate_features_metadata,
    * network_generator_lib.R:533-576. */
  def featuresMetadataJson(subnetStats: DataFrame): String = {
    val rows = subnetStats.collect()
    rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).map { case (feat, rs) =>
      esc(feat) + ":" + rs.sortBy(_.getString(0)).map { r =>
        def d(i: Int): String = if (r.isNullAt(i)) "null" else num(r.get(i))
        esc(r.getString(0)) + ":{" +
          s""""Abundance":${d(2)},"ChAs":${d(3)},""" +
          s""""Random ChAs interval":${if (r.isNullAt(4)) "null" else esc(r.getString(4))},""" +
          s""""Mean degree":${d(5)}}"""
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
  }

  def write(path: String, content: String): Unit =
    Files.writeString(Paths.get(path), content)
}
