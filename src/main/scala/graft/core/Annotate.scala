package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vertex annotation joins J1-J4, J6 (SURVEY §2.4): features onto
  * vertices, bait-name overwrite, alias interval/name joins with the
  * collapse aggregations A2/A3, intronic-region flagging.
  * Annotation tables are dimension-sized (≪ fragments) → every equi
  * join here is broadcast; the interval joins go through
  * Intervals.overlapJoin (bucketed, shuffle-safe).
  */
object Annotate {

  /** J1 features → vertices: left join long features, leaving the long
    * form (fragment, feature, value) joined to node attrs. The
    * reference sniffs a legacy "chr_start" key form (first feature row
    * regex) and falls back — we accept either via `keyForm`.
    * Reference: merge_features, network_generator_lib.R:369-380. */
  def joinFeatures(vertices: DataFrame, features: DataFrame,
                   keyForm: String = "fragment"): DataFrame = {
    val keyed = keyForm match {
      case "fragment" => features
      case "chr_start" =>
        // features keyed chr_start: re-key vertices accordingly
        features.withColumnRenamed("fragment", "__short")
      case other => throw new IllegalArgumentException(other)
    }
    if (keyForm == "fragment")
      vertices.join(keyed, Seq("fragment"), "left")
    else
      vertices
        .withColumn("__short", concat_ws("_", col("chr"), col("start")))
        .join(keyed, Seq("__short"), "left")
        .drop("__short")
  }

  /** Sniff the feature key form from one row: "chr_start_end" vs legacy
    * "chr_start". Reference regex sniff: network_generator_lib.R:370-372. */
  def sniffKeyForm(features: DataFrame): String = {
    val sample = features.select(col("fragment")).limit(1).collect()
    if (sample.isEmpty) "fragment"
    else if (sample(0).getString(0).matches("^[0-9XYxy]+_\\d+_\\d+$")) "fragment"
    else "chr_start"
  }

  /** J2 bait-names → vertices: HindIII annotation joined on fragment;
    * gene_names overwritten ONLY where type == "P".
    * Reference: generate_real_bait_names, network_generator_lib.R:869-884. */
  def overwriteBaitNames(vertices: DataFrame, baitNames: DataFrame): DataFrame = {
    val ann = baitNames.select(
        concat_ws("_", col("Chr"), col("Start"), col("End")).as("fragment"),
        col("gene_id").as("__bait_names"))
      // one name per fragment (min = deterministic): duplicate
      // annotation rows must not duplicate vertex rows on the join
      .groupBy("fragment").agg(min("__bait_names").as("__bait_names"))
    vertices.join(broadcast(ann), Seq("fragment"), "left")
      .withColumn("gene_names",
        when(col("type") === "P" && col("__bait_names").isNotNull,
          col("__bait_names")).otherwise(col("gene_names")))
      .drop("__bait_names")
  }

  /** A2-style collapse: space-joined sorted-distinct non-null values per
    * group (NA→"NA" like the reference's str_replace_na).
    * sort_array makes the collapse deterministic — the reference relies
    * on input order, which a distributed shuffle cannot honor. */
  private def collapse(c: String) =
    concat_ws(" ", array_sort(array_distinct(
      collect_list(coalesce(col(c), lit("NA"))))))

  /** J3 alias (other-ends) → vertices: interval-join O-type vertices
    * against the gene-annotation ranges, collapse multi-hits per
    * fragment, overwrite gene_names.
    * Reference: homo network_generator_lib.R:640-674 / mus :747-781. */
  def annotateOtherEnds(vertices: DataFrame, alias: DataFrame): DataFrame = {
    val oes = vertices.filter(col("type") === "O")
      .select("fragment", "chr", "start", "end")
    val hits = Intervals.overlapJoin(oes, alias, rightPrefix = "a_",
      joinType = "inner")
    val collapsed = hits.groupBy(col("fragment"))
      .agg(collapse("a_gene_name").as("__oe_names"))
    vertices.join(collapsed, Seq("fragment"), "left")
      .withColumn("gene_names",
        when(col("type") === "O" && col("__oe_names").isNotNull,
          col("__oe_names")).otherwise(col("gene_names")))
      .drop("__oe_names")
  }

  /** J4 alias (promoters) → vertices: normalize promoter gene_names
    * (upper-case, strip transcript suffix -N), explode the name bag,
    * join the alias table on gene name, re-collapse ensembl ids +
    * aliases per fragment (A3). Returns vertices with added
    * `ensembl_ids` and `alias` columns.
    *
    * organism = "mus_musculus" adds the reference's mouse-specific
    * variants: the `MGI:` prefix is stripped from alias/xref values
    * (network_generator_lib.R:777,831) and promoter gene_names are
    * re-cased to sentence case for display after the upper-cased join
    * (str_to_sentence, :821).
    * Reference: homo network_generator_lib.R:675-726 / mus :782-836. */
  def annotatePromoters(vertices: DataFrame, alias: DataFrame,
                        organism: String = "homo_sapiens"): DataFrame = {
    val mouse = organism == "mus_musculus"
    val promoters = vertices.filter(col("type") === "P")
      .select(col("fragment"),
        explode(split(
          regexp_replace(upper(trim(col("gene_names"))), "-\\d+\\b", ""),
          "[;, ]+")).as("__name"))
      .filter(col("__name") =!= "")
    val aliasVal =
      if (mouse) regexp_replace(col("alias"), "^MGI:", "") else col("alias")
    val aliasNorm = alias.select(
      upper(col("gene_name")).as("__name"),
      col("ensembl_gene_id"), aliasVal.as("alias"))
    val hits = promoters.join(broadcast(aliasNorm), Seq("__name"), "left")
      .groupBy(col("fragment"))
      .agg(collapse("ensembl_gene_id").as("ensembl_ids"),
           collapse("alias").as("alias"))
    val joined = vertices.join(hits, Seq("fragment"), "left")
      .withColumn("ensembl_ids", coalesce(col("ensembl_ids"), lit("")))
      .withColumn("alias", coalesce(col("alias"), lit("")))
    if (!mouse) joined
    else joined.withColumn("gene_names",
      when(col("type") === "P" && length(col("gene_names")) > 0,
        concat(upper(substring(col("gene_names"), 1, 1)),
          lower(substring(col("gene_names"), 2, 1000000))))
        .otherwise(col("gene_names")))
  }

  /** J6 intronic regions → vertices: semi interval join → boolean flag,
    * true only for O-type vertices overlapping an intronic region.
    * Reference: generate_intronics_regions, network_generator_lib.R:853-862. */
  def flagIntronic(vertices: DataFrame, intronic: DataFrame): DataFrame = {
    val oes = vertices.filter(col("type") === "O")
      .select("fragment", "chr", "start", "end")
    val flagged = Intervals.overlapJoin(oes, intronic, rightPrefix = "i_",
        joinType = "inner")
      .select(col("fragment")).distinct()
      .withColumn("__intr", lit(true))
    vertices.join(flagged, Seq("fragment"), "left")
      .withColumn("intronic_regions",
        coalesce(col("__intr"), lit(false)) && col("type") === "O")
      .drop("__intr")
  }

  /** ensembl2name lookup map used by Q3 searches.
    * Reference: built at network_generator.R:214-215. */
  def ensembl2name(alias: DataFrame): DataFrame =
    alias.select(lower(col("ensembl_gene_id")).as("ensembl_id"),
        col("gene_name"))
      .filter(col("ensembl_id").isNotNull && col("gene_name").isNotNull)
      .dropDuplicates("ensembl_id")
}
