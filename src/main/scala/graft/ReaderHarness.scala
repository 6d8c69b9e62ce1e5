package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Readers

/** CORRECTNESS harness for the S1–S9 file-source readers: each query
  * materializes a TSV/bed/gz/parquet fixture from the driver's parquet
  * tables into a fixed temp dir, reads it back through the production
  * reader (io/Readers.scala), and returns the parsed DataFrame; the
  * paired DuckDB oracle (OracleSql.readers) reads the SAME file with
  * `read_csv`/`read_parquet` under the same declared schema — so a
  * regression in any reader's parsing (header handling, stale-row drop,
  * chr-prefix strip, type binding, gzip) fails the driver's hash gate,
  * not just a unit test.
  *
  * Fixture paths are SF-SCOPED (fixtureRoot/<sfToken>/...): the oracle
  * SQL carries the `__SF_TOKEN__` placeholder that Verify substitutes
  * from the same sfDir at dump time, so both engines read the file the
  * Spark side wrote FOR THAT SF — a verify run at another SF can no
  * longer clobber a fixture between this run's dump and its oracle
  * check. Fixture writes are coalesce(1) — harness-only code; the
  * readers under test stay fully distributed.
  *
  * Reference input surface being verified: load_PCHiC
  * (network_generator_lib.R:281-286), load_HiC + stale-header drop
  * (network_generator_lib.R:292-299), format sniff
  * (network_generator.R:50-55), features_on_nodes + chr strip
  * (network_generator.R:127-134), alias DBs (network_generator.R:107),
  * bait names (network_generator_lib.R:869-881), intronic regions
  * (network_generator_lib.R:854-855), chaser feature formats
  * (merge_features.R:68, backend.py:181-195), Rdata snapshot caches
  * (network_generator.R:282-284).
  */
object ReaderHarness {
  import TestMapping.{chrmap, table, interactions, verts, featureIntervals,
    aliasRanges, intronicRegions}

  val fixtureRoot = "/tmp/graft_fixtures"

  /** Filesystem-safe token for an SF data dir — scopes fixture dumps
    * (and, via Verify's `__SF_TOKEN__` substitution, the oracle SQL
    * that reads them back) so runs at different SFs never clobber each
    * other's fixtures between dump and oracle check (the round-10 sf1
    * gate caught exactly that: an sf0.01 run re-dumping a shared-path
    * fixture after the sf1 dump but before its oracle check). */
  def sfToken(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** SF-scoped fixture directory: fixtureRoot/<sfToken>/ — every
    * fixture a query dumps for its oracle lives under the token of
    * the SF dir it derives from. */
  def fxDir(sfDir: String): String = s"$fixtureRoot/${sfToken(sfDir)}"

  private def writeTsv(df: DataFrame, dir: String, header: Boolean,
                       gzip: Boolean = false): String = {
    val w = df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", header.toString)
    (if (gzip) w.option("codec", "gzip") else w).csv(dir)
    dir
  }

  /** Write explicit lines in a guaranteed order (header, stale row,
    * data) — the one fixture where first-file-line identity matters. */
  private def writeLines(df: DataFrame, dir: String): String = {
    df.repartition(1).sortWithinPartitions("k").select("line")
      .write.mode("overwrite").text(dir)
    dir
  }

  private val hicHeader =
    "baitChr\tbaitStart\tbaitEnd\toeChr\toeStart\toeEnd"

  /** S1: 11-col PCHiC prefix + two sniffed score columns (Mon, Mac). */
  private def pchicFixture(s: SparkSession, d: String): String =
    writeTsv(interactions(s, d).select(
      col("baitchr").as("baitChr"), col("baitstart").cast("long").as("baitStart"),
      col("baitend").cast("long").as("baitEnd"), col("baitid").cast("long").as("baitID"),
      col("baitname").as("baitName"), col("oechr").as("oeChr"),
      col("oestart").cast("long").as("oeStart"), col("oeend").cast("long").as("oeEnd"),
      col("oeid").cast("long").as("oeID"), col("oename").as("oeName"),
      col("dist").cast("double").as("dist"),
      col("score").cast("double").as("Mon"),
      (col("score") / 2).cast("double").as("Mac")),
      s"${fxDir(d)}/s1_pchic", header = true)

  /** S2: 6-col Hi-C with the header repeated as the first DATA row —
    * the stale-header artifact loadHiC must drop (HiC[-1,]). Also the
    * input of the Hi-C-mode pipeline entries (g1_hic_*). */
  def hicFixture(s: SparkSession, d: String): String = {
    import s.implicits._
    val hdr = Seq((hicHeader, 0), (hicHeader, 1)).toDF("line", "k")
    val data = interactions(s, d).select(concat_ws("\t",
      col("baitchr"), col("baitstart"), col("baitend"),
      col("oechr"), col("oestart"), col("oeend")).as("line"), lit(2).as("k"))
    writeLines(hdr.unionByName(data), s"${fxDir(d)}/s2_hic")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "s1_read_pchic" -> ((s, d) => Readers.loadPCHiC(s, pchicFixture(s, d))),

    "s2_read_hic" -> ((s, d) => Readers.loadHiC(s, hicFixture(s, d))),

    "s3_format_sniff" -> ((s, d) => {
      import s.implicits._
      // self-contained header-only fixtures (sniffing never reads data)
      Seq((s"${fxDir(d)}/s3_sniff/pchic",
            "baitChr\tbaitStart\tbaitEnd\tbaitID\tbaitName\toeChr\toeStart" +
            "\toeEnd\toeID\toeName\tdist\tMon"),
          (s"${fxDir(d)}/s3_sniff/hic", hicHeader))
        .foreach { case (dir, h) =>
          Seq(h).toDF("line").coalesce(1).write.mode("overwrite").text(dir) }
      Seq(("pchic", Readers.isHiC(s, s"${fxDir(d)}/s3_sniff/pchic")),
          ("hic", Readers.isHiC(s, s"${fxDir(d)}/s3_sniff/hic")))
        .toDF("src", "is_hic")
    }),

    "s4_read_features_on_nodes" -> ((s, d) => {
      // half the keys carry the UCSC 'chr' prefix the reader must strip
      val fx = writeTsv(verts(s, d).select(
        when(col("start") % 2000 === 0,
          concat(lit("chr"), col("fragment"))).otherwise(col("fragment"))
          .as("frag_key"),
        col("start").cast("double").as("f1"),
        (col("end") - col("start")).cast("double").as("f2")),
        s"${fxDir(d)}/s4_features_on_nodes", header = true)
      Readers.loadFeaturesOnNodes(s, fx)
    }),

    "s5_read_alias" -> ((s, d) => {
      val k = col("s_suppkey").cast("long")
      val fx = writeTsv(table(s, d, "supplier").select(
        chrmap(k).as("chr"), (k * 1000 + 100).as("start"),
        (k * 1000 + 900).as("end"),
        concat(lit("ENSG"), lpad(k.cast("string"), 11, "0")).as("ensembl_gene_id"),
        concat(lit("S"), k.cast("string")).as("gene_name"),
        when(k % 2 === 0, lit("protein_coding")).otherwise(lit("lincRNA"))
          .as("gene_type"),
        concat(lit("AL"), k.cast("string")).as("alias"),
        concat(lit("HGNC:"), k.cast("string")).as("xref_id")),
        s"${fxDir(d)}/s5_alias", header = true)
      Readers.loadAlias(s, fx)
    }),

    "s6_read_intronic" -> ((s, d) => {
      // gzipped — exercises transparent codec handling in the csv source
      val fx = writeTsv(intronicRegions(s, d),
        s"${fxDir(d)}/s6_intronic", header = true, gzip = true)
      Readers.loadIntronic(s, fx)
    }),

    "s7_read_bait_names" -> ((s, d) => {
      val k = col("s_suppkey").cast("long")
      val fx = writeTsv(table(s, d, "supplier").select(
        chrmap(k).as("Chr"), (k * 1000).as("Start"), (k * 1000 + 999).as("End"),
        concat(lit("BN"), k.cast("string")).as("gene_id"),
        concat(lit("ENSG"), lpad(k.cast("string"), 11, "0")).as("ensembl_id"),
        concat(lit("r"), (k % 3).cast("string")).as("region")),
        s"${fxDir(d)}/s7_bait_names", header = true)
      Readers.loadBaitNames(s, fx)
    }),

    "s8_read_bed3" -> ((s, d) => {
      val fx = writeTsv(featureIntervals(s, d)
        .select(col("chr"), col("start"), col("end"),
          col("value").cast("double").as("value")),
        s"${fxDir(d)}/s8_bed3", header = false)
      Readers.loadBed3(s, fx, "pk")
    }),

    "s8_read_bed6" -> ((s, d) => {
      val fx = writeTsv(aliasRanges(s, d).select(
        col("chr"), col("start"), col("end"), col("gene_name").as("name"),
        (col("start") % 997).cast("double").as("score"),
        when(col("start") % 2 === 0, lit("+")).otherwise(lit("-")).as("strand")),
        s"${fxDir(d)}/s8_bed6", header = false)
      Readers.loadBed6(s, fx, "cons")
    }),

    "s8_read_macs2" -> ((s, d) => {
      val fx = writeTsv(featureIntervals(s, d).select(
        col("chr"), col("start"), col("end"),
        concat(lit("pk_"), col("start").cast("string")).as("name"),
        lit(0.0).cast("double").as("score"), lit(".").as("strand"),
        col("value").cast("double").as("signalValue"),
        (col("value") / 10).cast("double").as("pValue"),
        (col("value") / 100).cast("double").as("qValue"),
        ((col("end") - col("start")) / 2).cast("long").as("peak")),
        s"${fxDir(d)}/s8_macs2", header = false)
      Readers.loadMacs2(s, fx, "atac")
    }),

    "s8_read_chromhmm" -> ((s, d) => {
      val fx = writeTsv(featureIntervals(s, d).select(
        col("chr"), col("start"), col("end"),
        concat(lit("E"), substring(col("feature"), 2, 1)).as("state")),
        s"${fxDir(d)}/s8_chromhmm", header = false)
      Readers.loadChromhmm(s, fx)
    }),

    "s8_read_features_table" -> ((s, d) => {
      val fx = writeTsv(featureIntervals(s, d).select(
        col("chr"), col("start"), col("end"),
        col("value").cast("double").as("m1"),
        (col("value") * 2).cast("double").as("m2")),
        s"${fxDir(d)}/s8_features_table", header = true)
      Readers.loadFeaturesTable(s, fx)
    }),

    "s9_snapshot_roundtrip" -> ((s, d) => {
      val path = s"${fxDir(d)}/s9_snapshot"
      Readers.snapshot(verts(s, d), path, partitionCols = Seq("chr"))
      Readers.loadSnapshot(s, path)
        .select("fragment", "gene_names", "chr", "start", "end", "type")
    }))
}
