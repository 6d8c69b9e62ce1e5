package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Schemas

/** Sources S1-S9 from SURVEY.md §2.1 — declared-schema TSV/bed readers
  * plus the header sniffer. All readers are plain `spark.read.csv` with
  * an explicit StructType (never inferred: chromosome columns must stay
  * strings; reference network_generator_lib.R:284-285). Gzip is
  * transparent to Spark's text/csv source.
  */
object Readers {

  /** Feature-name sanitization at the upload boundary. Cytoscape
    * attribute names forbid `- ,()[]`, so the reference scrubs every
    * user-supplied feature name before it reaches the graph:
    * `str_remove_all(feature, "[- ,\\(\\)\\[\\]]")`
    * (merge_features.R:131). Applied by every S4/S8 reader to the
    * feature-name column/literal, so a hostile name can never reach a
    * downstream sink. */
  def sanitizeFeatureName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "[- ,()\\[\\]]", "")

  private def sanitizeFeatureNameStr(s: String): String =
    s.replaceAll("[- ,()\\[\\]]", "")

  /** Default feature name from an upload filename: basename up to the
    * first dot, dashes to underscores (dash is forbidden in Cytoscape
    * attributes; reference merge_features.R:56). */
  def featureNameFromFile(path: String): String =
    new java.io.File(path).getName.split("\\.")(0).replace("-", "_")

  private def tsv(spark: SparkSession, path: String, schema: StructType,
                  header: Boolean): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S3 format sniff: read just the header line and count columns.
    * 6 columns ⇒ Hi-C, else PCHiC. Reference: network_generator.R:50-55.
    * Returns the header fields (one small driver-side read; the data
    * scan itself stays distributed). */
  def sniffHeader(spark: SparkSession, path: String): Array[String] = {
    val head = spark.read.text(path).limit(1).collect()
    require(head.nonEmpty, s"empty input file (no header line): $path")
    head(0).getString(0).split("\t", -1)
  }

  def isHiC(spark: SparkSession, path: String): Boolean =
    sniffHeader(spark, path).length == 6

  /** S1 PCHiC TSV scan. The score-column tail is taken from the sniffed
    * header (column 12 onward = one CHiCAGO score per cell type).
    * Reference: load_PCHiC, network_generator_lib.R:281-286. */
  def loadPCHiC(spark: SparkSession, path: String): DataFrame = {
    val header = sniffHeader(spark, path)
    require(header.length >= 12,
      s"PCHiC file needs >=12 columns, got ${header.length}")
    val scoreCols = header.drop(11).toSeq
    tsv(spark, path, Schemas.pchicSchema(scoreCols), header = true)
  }

  /** S2 Hi-C TSV scan: 6 anonymous columns renamed positionally; the
    * reference drops the first data row (HiC[-1,] — a stale-header
    * artifact; reference network_generator_lib.R:292-299). We read with
    * header=true so the first line is consumed as the header, then drop
    * the first *data* row by filtering out rows that fail to parse as
    * coordinates — the schema's Long columns null out the duplicated
    * header row, making the drop a plain filter (no
    * monotonically_increasing_id, scale-safe). */
  def loadHiC(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Schemas.hicSchema, header = true)
      .filter(col("baitStart").isNotNull && col("oeStart").isNotNull)

  /** S4 features_on_nodes TSV scan: fragment key + N feature columns;
    * strips a leading `chr` from the fragment key (reference:
    * network_generator.R:128-131). Feature columns are whatever the
    * header declares; all typed double. */
  def loadFeaturesOnNodes(spark: SparkSession, path: String): DataFrame = {
    val header = sniffHeader(spark, path)
    val schema = StructType(
      StructField(header.head, StringType, nullable = false) +:
      header.tail.map(c => StructField(c, DoubleType, nullable = true)))
    val renamed = header.tail.foldLeft(
      tsv(spark, path, schema, header = true)
        .withColumnRenamed(header.head, "fragment")) {
      (df, c) => df.withColumnRenamed(c, sanitizeFeatureNameStr(c))
    }
    renamed.withColumn("fragment",
      regexp_replace(col("fragment"), "^chr", ""))
  }

  /** S5 alias DB scan (8 fixed columns, last is HGNC/MGI id). */
  def loadAlias(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Schemas.aliasSchema, header = true)

  /** S6 intronic-regions scan. */
  def loadIntronic(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Schemas.intronicSchema, header = true)

  /** S7 bait-names scan (HindIII annotation). */
  def loadBaitNames(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Schemas.baitNamesSchema, header = true)

  // --- S8: chaser feature-format family ---------------------------------
  // Every reader normalizes to the canonical long feature table
  // DF(chr,start,end,feature,value) — one row per (interval, feature).
  // Reference format dispatch: merge_features.R:68, backend.py:181-195.

  /** bed3: chr,start,end,value → single feature named `featureName`. */
  def loadBed3(spark: SparkSession, path: String, featureName: String): DataFrame =
    tsv(spark, path, Schemas.bed3Schema, header = false)
      .select(col("chr"), col("start"), col("end"),
        lit(sanitizeFeatureNameStr(featureName)).as("feature"), col("value"))

  /** bed6: score column is the value. */
  def loadBed6(spark: SparkSession, path: String, featureName: String): DataFrame =
    tsv(spark, path, Schemas.bed6Schema, header = false)
      .select(col("chr"), col("start"), col("end"),
        lit(sanitizeFeatureNameStr(featureName)).as("feature"),
        col("score").as("value"))

  /** macs2 narrowPeak/broadPeak: signalValue is the value. */
  def loadMacs2(spark: SparkSession, path: String, featureName: String): DataFrame =
    tsv(spark, path, Schemas.macs2Schema, header = false)
      .select(col("chr"), col("start"), col("end"),
        lit(sanitizeFeatureNameStr(featureName)).as("feature"),
        col("signalValue").as("value"))

  /** chromhmm segmentation: one 0/1 feature per state label — emitted in
    * long form (feature = state, value = 1.0); the downstream
    * fragment-aggregation plus missing→0 fill realizes the 0/1 matrix
    * without a wide pivot (scale-safe: state cardinality is small but the
    * long form never materializes n_fragments × n_states). */
  def loadChromhmm(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, Schemas.chromhmmSchema, header = false)
      .select(col("chr"), col("start"), col("end"),
        sanitizeFeatureName(col("state")).as("feature"), lit(1.0).as("value"))

  /** features_table: bedgraph-like with header chr,start,end + one or
    * more named value columns → unpivoted to long form. */
  def loadFeaturesTable(spark: SparkSession, path: String): DataFrame = {
    val header = sniffHeader(spark, path)
    require(header.length >= 4, "features_table needs chr,start,end,value...")
    val valueCols = header.drop(3).toSeq
    val schema = StructType(Seq(
      StructField("chr", StringType, nullable = false),
      StructField("start", LongType, nullable = false),
      StructField("end", LongType, nullable = false)) ++
      valueCols.map(c => StructField(c, DoubleType, nullable = true)))
    val wide = tsv(spark, path, schema, header = true)
    // stack to long: stack(n, 'f1', f1, 'f2', f2, ...). Column names
    // come from a user file header — escape the SQL string quote and
    // the backtick identifier quote so a name like "don't" (or a
    // crafted header) cannot break out of the generated expression
    val stackExpr = valueCols.map { c =>
      val lit = sanitizeFeatureNameStr(c)
        .replace("\\", "\\\\").replace("'", "\\'")
      val id = c.replace("`", "``")
      s"'$lit', `$id`"
    }.mkString(", ")
    wide.select(col("chr"), col("start"), col("end"),
      expr(s"stack(${valueCols.length}, $stackExpr) as (feature, value)"))
  }

  /** S8 upload-format dispatch, mirroring the reference's
    * option + sniffed-column-count table (backend.py:181-195):
    * match_nodes → bed6 (6 cols) else features_table;
    * proportion_on_nodes → bed3 (4 cols) else macs2;
    * chromHMM → chromhmm; features_table → features_on_nodes (the
    * fragment-keyed matrix — note its output is fragment-keyed, not
    * interval-keyed like the others). */
  def loadFeatureFile(spark: SparkSession, path: String,
                      formatOption: String,
                      featureName: String = "feature"): DataFrame = {
    val nCols = sniffHeader(spark, path).length
    formatOption match {
      case "match_nodes" =>
        if (nCols == 6) loadBed6(spark, path, featureName)
        else loadFeaturesTable(spark, path)
      case "proportion_on_nodes" =>
        if (nCols == 4) loadBed3(spark, path, featureName)
        else loadMacs2(spark, path, featureName)
      case "chromHMM" => loadChromhmm(spark, path)
      case "features_table" => loadFeaturesOnNodes(spark, path)
      case other => throw new IllegalArgumentException(
        s"unknown feature format option: $other")
    }
  }

  /** S9 parquet snapshot store/load — replaces the reference's Rdata
    * caches (network_generator.R:282-284, search_query.R:14) with
    * columnar, partition-prunable parquet. */
  def snapshot(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  def loadSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Driver-testdata convenience: read one of the TPC-H-ish tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
