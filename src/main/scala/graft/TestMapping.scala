package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Interactions

/** Deterministic mapping from the driver's TPC-H-ish parquet tables
  * (TESTDATA.md) onto the GARDEN-NET data model, so every operator from
  * SURVEY.md §2 runs over the driver's tables and hash-matches a DuckDB
  * oracle built from the IDENTICAL arithmetic.
  *
  * The mapping: one `lineitem` row = one chromatin interaction whose
  * bait fragment derives from `l_suppkey` and other-end fragment from
  * `l_partkey`; `l_quantity` is the CHiCAGO score. Keys map to genomic
  * coordinates as  chr = key%25 (0→MT, 23→X, 24→Y),
  * start = key*1000, end = start+999 — so supplier key k and part key k
  * produce the SAME fragment (exercising the P-wins-over-O vertex rule),
  * key%25==0 rows exercise the MT drop, repeated (suppkey, partkey)
  * pairs exercise simplify's duplicate-edge rule, and suppkey==partkey
  * rows exercise the self-loop drop.
  *
  * Gene names exercise the reference's name normalization
  * (network_generator_lib.R:351-360): every 13th supplier is named "."
  * (→ dropped), every 7th carries a transcript suffix "-1" (→ stripped),
  * every 5th carries a second name "ALT<k>" (→ split/unique/collapse).
  */
object TestMapping {

  val Threshold = 25.0
  val ThinScore = 47.0 // sub-graph for the iterative algorithms (CC, diameter)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` encoding has varied across testdata
    * generations (TIMESTAMP(NANOS) read as long under nanosAsLong;
    * TIMESTAMP_NTZ from µs/isAdjustedToUTC=false parquet) —
    * [[graft.streaming.EventStreams.normalizeTs]] maps every encoding
    * to a plain microsecond TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.normalizeTs(table(spark, dir, "events"))

  /** chr for a long key: key%25 with 0→MT, 23→X, 24→Y, else the digits. */
  def chrmap(k: Column): Column = {
    val m = k % 25
    when(m === 0, lit("MT")).when(m === 23, lit("X"))
      .when(m === 24, lit("Y")).otherwise(m.cast("string"))
  }

  /** Fragment id "chr_start_end" for a long key. */
  def frag(k: Column): Column =
    concat_ws("_", chrmap(k), (k * 1000).cast("string"),
      (k * 1000 + 999).cast("string"))

  def baitName(s: Column): Column =
    when(s % 13 === 0, lit("."))
      .otherwise(concat(lit("S"), s.cast("string"),
        when(s % 7 === 0, lit("-1")).otherwise(lit("")),
        when(s % 5 === 0, concat(lit(" ALT"), s.cast("string")))
          .otherwise(lit(""))))

  /** The 12-column PCHiC-shaped interaction table (score at positional
    * column 12, matching filter_by_threshold's contract). */
  def interactions(spark: SparkSession, dir: String): DataFrame = {
    val s = col("l_suppkey"); val k = col("l_partkey")
    table(spark, dir, "lineitem").select(
      chrmap(s).as("baitchr"), (s * 1000).as("baitstart"),
      (s * 1000 + 999).as("baitend"), s.as("baitid"),
      baitName(s).as("baitname"),
      chrmap(k).as("oechr"), (k * 1000).as("oestart"),
      (k * 1000 + 999).as("oeend"), k.as("oeid"),
      concat(lit("P"), k.cast("string")).as("oename"),
      (abs(k - s) * 1000).as("dist"),
      col("l_quantity").as("score"))
  }

  /** Score-thresholded, MT-dropped interactions — the working set. */
  def filtered(spark: SparkSession, dir: String): DataFrame =
    Interactions.dropMT(
      Interactions.filterByThreshold(interactions(spark, dir), Threshold))

  /** Raw directed bait→oe edge list with score. */
  def rawEdges(spark: SparkSession, dir: String): DataFrame =
    Interactions.edges(filtered(spark, dir), Some("score"))
      .select("src", "dst", "score")

  /** Simplified undirected edge list (first-wins = min (score, src, dst)
    * — a total order, deterministic under any partitioning). */
  def simplified(spark: SparkSession, dir: String): DataFrame =
    Interactions.simplifyBy(rawEdges(spark, dir),
      Seq(col("score"), col("src"), col("dst")))

  /** Typed (P-P / P-O) simplified edges. */
  def typed(spark: SparkSession, dir: String): DataFrame =
    Interactions.addTypes(simplified(spark, dir))

  /** Thin sub-graph for iterative algorithms: keeps component structure
    * interesting and the oracle's recursive CTE tractable. */
  def thin(spark: SparkSession, dir: String): DataFrame =
    simplified(spark, dir).filter(col("score") > ThinScore)

  /** Vertex table via Interactions.vertices over the working set. */
  def verts(spark: SparkSession, dir: String): DataFrame =
    Interactions.vertices(filtered(spark, dir))

  /** Long feature table DF(fragment, feature, value): 'bal' and 'cls'
    * for every fragment — supplier rows win over part rows on the
    * (rare) colliding fragments. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val sup = table(spark, dir, "supplier")
    val part = table(spark, dir, "part")
    val sfeat = sup.select(frag(col("s_suppkey").cast("long")).as("fragment"),
        lit("bal").as("feature"), col("s_acctbal").as("value"))
      .unionAll(sup.select(frag(col("s_suppkey").cast("long")).as("fragment"),
        lit("cls").as("feature"), col("s_nationkey").cast("double").as("value")))
    val pfeat = part.select(frag(col("p_partkey").cast("long")).as("fragment"),
        lit("bal").as("feature"), col("p_retailprice").as("value"))
      .unionAll(part.select(frag(col("p_partkey").cast("long")).as("fragment"),
        lit("cls").as("feature"), col("p_size").cast("double").as("value")))
    pfeat.join(sfeat.select("fragment", "feature"),
        Seq("fragment", "feature"), "left_anti")
      .unionByName(sfeat)
  }

  /** Deterministic CLUSTERED variant of the embeddings table (for the
    * trained-codebook ANN certificate — the isotropic originals have no
    * cluster structure for k-means to find): 16 well-separated centers
    * on a cos grid, each vector = its cluster's center + 0.25 × its
    * original embedding as noise. Pure column arithmetic — same rows
    * every run at every SF. */
  def clusteredEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val c = (col("vec_id") % 16).cast("double")
    table(spark, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => cos(c * lit(1.7) + i.cast("double") * lit(0.37)) +
          lit(0.25) * x).as("embedding"))
  }

  /** Corpus with PLANTED near-duplicates for SemDeDup: the raw
    * embeddings plus a 0.75-scaled copy of every 5th vector under
    * vec_id+100000. Scaling preserves direction, so each plant is an
    * exact-cosine (≈1.0) duplicate of its source that shares the
    * source's Voronoi cell, while the isotropic originals pair at
    * |cos| ≲ 0.5 — a clean margin around any dedup threshold. Pure
    * column arithmetic, identical in the DuckDB oracle. */
  def dupEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    e.unionAll(e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.75)).as("embedding")))
  }

  /** Genomic feature intervals from `orders` (for the A15 interval
    * aggregation): target fragment key k = o_orderkey % 2000, skipping
    * k%3==0 so the missing-value fill is exercised; intervals sized and
    * offset by order attributes so they straddle interval-join buckets. */
  def featureIntervals(spark: SparkSession, dir: String): DataFrame = {
    val o = col("o_orderkey")
    val k = o % 2000
    table(spark, dir, "orders")
      .filter(k % 3 =!= 0)
      .select(chrmap(k).as("chr"),
        (k * 1000 + o % 1500).as("start"),
        (k * 1000 + o % 1500 + o % 800 + 100).as("end"),
        concat(lit("f"), (o % 3).cast("string")).as("feature"),
        col("o_totalprice").as("value"))
  }

  /** Gene-annotation interval table (for J3 oe-alias annotation):
    * in-fragment windows derived from `part`. */
  def aliasRanges(spark: SparkSession, dir: String): DataFrame = {
    val k = col("p_partkey").cast("long")
    table(spark, dir, "part").select(
      chrmap(k).as("chr"), (k * 1000 + 200).as("start"),
      (k * 1000 + 600).as("end"),
      concat(lit("G"), k.cast("string")).as("gene_name"))
  }

  /** Name-keyed alias table (for J4 promoter annotation + Q3 ensembl
    * search), keyed by the suppliers' normalized gene names. */
  def aliasTable(spark: SparkSession, dir: String): DataFrame = {
    val s = col("s_suppkey").cast("long")
    table(spark, dir, "supplier").select(
      concat(lit("S"), s.cast("string")).as("gene_name"),
      concat(lit("ENSG"), lpad(s.cast("string"), 11, "0")).as("ensembl_gene_id"),
      concat(lit("AL"), s.cast("string")).as("alias"))
  }

  /** HindIII bait-name annotation (for J2): supplier fragments. */
  def baitNamesTable(spark: SparkSession, dir: String): DataFrame = {
    val s = col("s_suppkey").cast("long")
    table(spark, dir, "supplier").select(
      chrmap(s).as("Chr"), (s * 1000).as("Start"), (s * 1000 + 999).as("End"),
      concat(lit("BN"), s.cast("string")).as("gene_id"))
  }

  /** Intronic-region intervals (for J6) from `nation`. */
  def intronicRegions(spark: SparkSession, dir: String): DataFrame = {
    val n = col("n_nationkey").cast("long")
    table(spark, dir, "nation").select(
      chrmap(n * 80 + 3).as("chr"),
      ((n % 5) * 100000).as("start"),
      ((n % 5) * 100000 + 150000).as("end"))
  }

  /** Probe intervals (for the J8 nearest join) from `nation`. */
  def probes(spark: SparkSession, dir: String): DataFrame = {
    val n = col("n_nationkey").cast("long")
    val pk = n * 80 + 3
    table(spark, dir, "nation").select(
      concat(lit("N"), n.cast("string")).as("probe_id"),
      chrmap(pk).as("chr"),
      (pk * 1000 + 333333).as("start"),
      (pk * 1000 + 333433).as("end"))
  }
}
