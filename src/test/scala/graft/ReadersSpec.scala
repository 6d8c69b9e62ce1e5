package graft

import java.nio.file.Files
import graft.io.Readers

/** S1-S8 readers against temp TSV fixtures: schema binding, format
  * sniff, the Hi-C stale-header drop, feature-format canonicalization. */
class ReadersSpec extends SparkSpec {

  private def tmpTsv(lines: String*): String = {
    val f = Files.createTempFile("graft", ".tsv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("S3 sniff: 6 columns means Hi-C") {
    val hic = tmpTsv("a\tb\tc\td\te\tf", "x\t1\t2\ty\t3\t4")
    val pchic = tmpTsv((1 to 13).map("c" + _).mkString("\t"))
    assert(Readers.isHiC(spark, hic))
    assert(!Readers.isHiC(spark, pchic))
  }

  test("S1 PCHiC scan binds the dynamic score tail, chr stays string") {
    val p = tmpTsv(
      "baitChr\tbaitStart\tbaitEnd\tbaitID\tbaitName\toeChr\toeStart\toeEnd\toeID\toeName\tdist\tMon\tMac",
      "X\t100\t199\t1\tG1\t1\t500\t599\t2\tP2\t400\t5.5\t6.5",
      "1\t100\t199\t1\tG1\tY\t500\t599\t2\tP2\t400\t1.5\t2.5")
    val df = Readers.loadPCHiC(spark, p)
    assert(df.columns.takeRight(2).sameElements(Array("Mon", "Mac")))
    assert(df.schema("baitChr").dataType.typeName == "string")
    val x = df.filter(df("baitChr") === "X").collect()
    assert(x.length == 1 && x(0).getDouble(11) == 5.5)
  }

  test("S2 Hi-C scan drops the stale duplicated header row") {
    val p = tmpTsv(
      "chr1\tx1\tx2\tchr2\ty1\ty2",   // real header (consumed)
      "chr1\tx1\tx2\tchr2\ty1\ty2",   // stale header repeated as data
      "1\t100\t199\t2\t500\t599")
    val df = Readers.loadHiC(spark, p)
    assert(df.count() == 1)
    assert(df.columns.sameElements(Array("baitChr", "baitStart", "baitEnd",
      "oeChr", "oeStart", "oeEnd")))
  }

  test("S4 features_on_nodes strips the chr prefix from fragment keys") {
    val p = tmpTsv("frag\tH3K4\tH3K27", "chr1_100_199\t1.0\t0.0")
    val df = Readers.loadFeaturesOnNodes(spark, p).collect()(0)
    assert(df.getString(0) == "1_100_199")
    assert(df.getDouble(1) == 1.0)
  }

  test("S8 bed3/bed6/macs2 normalize to the canonical feature table") {
    val b3 = tmpTsv("1\t100\t199\t2.5")
    val out3 = Readers.loadBed3(spark, b3, "mark").collect()(0)
    assert(out3.getString(3) == "mark" && out3.getDouble(4) == 2.5)
    val b6 = tmpTsv("1\t100\t199\tn\t7.5\t+")
    assert(Readers.loadBed6(spark, b6, "m").collect()(0).getDouble(4) == 7.5)
    val m2 = tmpTsv("1\t100\t199\tpeak1\t900\t.\t12.5\t1\t1\t150")
    assert(Readers.loadMacs2(spark, m2, "m").collect()(0).getDouble(4) == 12.5)
  }

  test("S8 chromhmm emits long-form 0/1 per state") {
    val p = tmpTsv("1\t100\t199\tE1", "1\t200\t299\tE2")
    val rows = Readers.loadChromhmm(spark, p).collect()
    assert(rows.map(_.getString(3)).toSet == Set("E1", "E2"))
    assert(rows.forall(_.getDouble(4) == 1.0))
  }

  test("S8 features_table unpivots named value columns") {
    val p = tmpTsv("chr\tstart\tend\tm1\tm2", "1\t100\t199\t1.5\t2.5")
    val rows = Readers.loadFeaturesTable(spark, p).collect()
    assert(rows.map(r => r.getString(3) -> r.getDouble(4)).toMap ==
      Map("m1" -> 1.5, "m2" -> 2.5))
  }

  test("S5 alias DB scan binds 8 fixed columns, xref last") {
    val p = tmpTsv(
      "chr\tstart\tend\tensembl_gene_id\tgene_name\tgene_type\talias\txref_id",
      "X\t100\t900\tENSG00000000007\tS7\tprotein_coding\tAL7\tHGNC:7")
    val r = Readers.loadAlias(spark, p).collect()(0)
    assert(r.getString(0) == "X" && r.getLong(1) == 100L)
    assert(r.getString(4) == "S7" && r.getString(7) == "HGNC:7")
  }

  test("S6 intronic scan: chr string, long coordinates") {
    val p = tmpTsv("chr\tstart\tend", "Y\t1000\t151000", "7\t0\t150000")
    val rows = Readers.loadIntronic(spark, p).collect()
    assert(rows.map(_.getString(0)).toSet == Set("Y", "7"))
    assert(rows.map(_.getLong(2)).toSet == Set(151000L, 150000L))
  }

  test("S7 bait-names scan binds the HindIII annotation columns") {
    val p = tmpTsv("Chr\tStart\tEnd\tgene_id\tensembl_id\tregion",
      "7\t7000\t7999\tBN7\tENSG00000000007\tr1")
    val r = Readers.loadBaitNames(spark, p).collect()(0)
    assert(r.getString(0) == "7" && r.getLong(1) == 7000L)
    assert(r.getString(3) == "BN7" && r.getString(5) == "r1")
  }

  test("S8 dispatch selects the reader from option + column count") {
    val b6 = tmpTsv("1\t100\t199\tn\t7.5\t+")
    assert(Readers.loadFeatureFile(spark, b6, "match_nodes", "m")
      .collect()(0).getDouble(4) == 7.5)
    val b3 = tmpTsv("1\t100\t199\t2.5")
    assert(Readers.loadFeatureFile(spark, b3, "proportion_on_nodes", "m")
      .collect()(0).getDouble(4) == 2.5)
    val m2 = tmpTsv("1\t100\t199\tpk\t900\t.\t12.5\t1\t1\t150")
    assert(Readers.loadFeatureFile(spark, m2, "proportion_on_nodes", "m")
      .collect()(0).getDouble(4) == 12.5)
    val hmm = tmpTsv("1\t100\t199\tE1")
    assert(Readers.loadFeatureFile(spark, hmm, "chromHMM")
      .collect()(0).getString(3) == "E1")
    val fon = tmpTsv("frag\tH3K4", "chr1_100_199\t1.0")
    assert(Readers.loadFeatureFile(spark, fon, "features_table")
      .columns.head == "fragment")
    intercept[IllegalArgumentException] {
      Readers.loadFeatureFile(spark, b3, "nope")
    }
  }

  test("feature names are sanitized at the upload boundary") {
    // Cytoscape attribute names forbid `- ,()[]` (merge_features.R:131):
    // the scrub REMOVES them from every user-supplied feature name
    val b3 = tmpTsv("1\t100\t199\t2.5")
    assert(Readers.loadBed3(spark, b3, "H3K4-me3 (rep 1)[a]")
      .collect()(0).getString(3) == "H3K4me3rep1a")
    val hmm = tmpTsv("1\t100\t199\tE1 (weak)")
    assert(Readers.loadChromhmm(spark, hmm)
      .collect()(0).getString(3) == "E1weak")
    // features_table: hostile HEADER names sanitize in the long output
    val ft = tmpTsv("chr\tstart\tend\tm-1 (x)\tm,2",
      "1\t100\t199\t1.5\t2.5")
    val feats = Readers.loadFeaturesTable(spark, ft)
      .collect().map(_.getString(3)).sorted
    assert(feats.sameElements(Array("m1x", "m2")))
    // features_on_nodes: hostile wide-matrix column names are renamed
    val fon = tmpTsv("frag\tH3K4-me3 (r1)", "chr1_100_199\t1.0")
    assert(Readers.loadFeaturesOnNodes(spark, fon)
      .columns.sameElements(Array("fragment", "H3K4me3r1")))
    // filename-derived default name: basename to first dot, dash to
    // underscore (merge_features.R:56)
    assert(Readers.featureNameFromFile("/up/H3K27-ac.peaks.bed")
      == "H3K27_ac")
  }

  test("S9 parquet snapshot round-trips") {
    val dir = Files.createTempDirectory("graftsnap").toString + "/t"
    Readers.snapshot(pchicFixture, dir)
    assert(Readers.loadSnapshot(spark, dir).count() == pchicFixture.count())
  }
}
