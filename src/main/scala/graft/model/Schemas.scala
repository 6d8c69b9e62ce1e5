package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for every input format the reference consumes.
  *
  * The reference's schema system is fixed-by-convention with light
  * sniffing (reference: network_generator.R:50-55, backend.py:127-195);
  * here every format gets a declared schema — chromosome columns are
  * always StringType (a naive reader would infer int and corrupt X/Y/MT;
  * reference: network_generator_lib.R:284-285), coordinates are LongType
  * (100 TB-scale mandates long), scores/features DoubleType.
  */
object Schemas {

  /** PCHiC interaction table: fixed 11-column prefix + one CHiCAGO score
    * column per cell type (dynamic tail). Reference:
    * network_generator_lib.R:281-286 (load_PCHiC) and the column contract
    * at tests/test_network_generator.R:48-49.
    *
    * The score tail is dynamic, so this is the *prefix*; Readers binds the
    * full schema after sniffing the header.
    */
  val pchicPrefix: StructType = StructType(Seq(
    StructField("baitChr", StringType, nullable = false),
    StructField("baitStart", LongType, nullable = false),
    StructField("baitEnd", LongType, nullable = false),
    StructField("baitID", LongType, nullable = true),
    StructField("baitName", StringType, nullable = true),
    StructField("oeChr", StringType, nullable = false),
    StructField("oeStart", LongType, nullable = false),
    StructField("oeEnd", LongType, nullable = false),
    StructField("oeID", LongType, nullable = true),
    StructField("oeName", StringType, nullable = true),
    StructField("dist", DoubleType, nullable = true),
  ))

  def pchicSchema(scoreCols: Seq[String]): StructType =
    StructType(pchicPrefix.fields ++ scoreCols.map(c =>
      StructField(c, DoubleType, nullable = true)))

  /** Hi-C 6-column table (anonymous cols renamed positionally).
    * Reference: network_generator_lib.R:292-299 (load_HiC). */
  val hicSchema: StructType = StructType(Seq(
    StructField("baitChr", StringType, nullable = false),
    StructField("baitStart", LongType, nullable = false),
    StructField("baitEnd", LongType, nullable = false),
    StructField("oeChr", StringType, nullable = false),
    StructField("oeStart", LongType, nullable = false),
    StructField("oeEnd", LongType, nullable = false),
  ))

  /** Canonical vertex/fragment table (derived, not read): the engine's
    * node DataFrame. `fragment` = "chr_start_end". Reference:
    * network_generator_lib.R:323-362 (generate_vertex). */
  val vertexSchema: StructType = StructType(Seq(
    StructField("fragment", StringType, nullable = false),
    StructField("gene_names", StringType, nullable = true),
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("type", StringType, nullable = false), // "P" | "O"
  ))

  /** features_on_nodes matrix: fragment key + one double column per
    * feature (dynamic). Reference: network_generator.R:127-134. */
  val featuresKeyCol = "fragment"

  /** bed3 feature file: chr,start,end,value. Reference chaser 'bed3'
    * format (merge_features.R:68; golden tests test_network_generator.R:287). */
  val bed3Schema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true),
  ))

  /** bed6: chr,start,end,name,score,strand (score is the feature value). */
  val bed6Schema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("strand", StringType, nullable = true),
  ))

  /** macs2 narrowPeak/broadPeak (9-10 cols); signalValue (col 7) is the
    * feature value. */
  val macs2Schema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("strand", StringType, nullable = true),
    StructField("signalValue", DoubleType, nullable = true),
    StructField("pValue", DoubleType, nullable = true),
    StructField("qValue", DoubleType, nullable = true),
    StructField("peak", LongType, nullable = true),
  ))

  /** chromhmm segmentation: chr,start,end,state — pivots to one 0/1
    * column per state downstream. */
  val chromhmmSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("state", StringType, nullable = false),
  ))

  /** Gene alias DB (per organism): reference network_generator.R:107,
    * consumed at network_generator_lib.R:650-654 (homo) / :757-760 (mus).
    * Last column is "HGNC ID" for human, "MGI ID" for mouse — normalized
    * to `xref_id` here. */
  val aliasSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("ensembl_gene_id", StringType, nullable = true),
    StructField("gene_name", StringType, nullable = true),
    StructField("gene_type", StringType, nullable = true),
    StructField("alias", StringType, nullable = true),
    StructField("xref_id", StringType, nullable = true),
  ))

  /** Bait-name (HindIII fragment) annotation. Reference:
    * network_generator_lib.R:869-881. */
  val baitNamesSchema: StructType = StructType(Seq(
    StructField("Chr", StringType, nullable = false),
    StructField("Start", LongType, nullable = false),
    StructField("End", LongType, nullable = false),
    StructField("gene_id", StringType, nullable = true),
    StructField("ensembl_id", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
  ))

  /** Intronic regions: chr,start,end. Reference:
    * network_generator_lib.R:854-855. */
  val intronicSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
  ))

  /** Canonical long-form feature table every feature reader normalizes
    * to: one row per (interval, feature) with a numeric value. */
  val canonicalFeatureSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("feature", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
  ))
}
