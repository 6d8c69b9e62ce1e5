package graft

import org.apache.spark.sql.functions._
import graft.core.Annotate

/** J1-J4, J6 annotation joins and the A2/A3 collapse semantics. */
class AnnotateSpec extends SparkSpec {
  import spark.implicits._

  private def verts = Seq(
    ("1_100_199", "GENEA GENEB", "1", 100L, 199L, "P"),
    ("1_500_599", "old", "1", 500L, 599L, "O"),
    ("2_100_199", "", "2", 100L, 199L, "O"))
    .toDF("fragment", "gene_names", "chr", "start", "end", "type")

  test("J1 joinFeatures keys on fragment or sniffed chr_start") {
    val feats = Seq(("1_100_199", "f", 1.0)).toDF("fragment", "feature", "value")
    val out = Annotate.joinFeatures(verts, feats)
    assert(out.filter(col("value").isNotNull).count() == 1)
    val short = Seq(("1_100", "f", 2.0)).toDF("fragment", "feature", "value")
    assert(Annotate.sniffKeyForm(short) == "chr_start")
    val out2 = Annotate.joinFeatures(verts, short, "chr_start")
    assert(out2.filter(col("value").isNotNull).count() == 1)
    assert(Annotate.sniffKeyForm(feats) == "fragment")
  }

  test("J2 bait names overwrite gene_names only for P vertices") {
    val bn = Seq(("1", 100L, 199L, "NEWNAME"), ("1", 500L, 599L, "IGNORED"))
      .toDF("Chr", "Start", "End", "gene_id")
    val out = Annotate.overwriteBaitNames(verts, bn).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("1_100_199") == "NEWNAME") // P: overwritten
    assert(out("1_500_599") == "old")     // O: kept despite annotation hit
  }

  test("J3 other-end alias interval join collapses sorted-distinct") {
    val alias = Seq(
      ("1", 510L, 520L, "ZGENE"), ("1", 530L, 540L, "AGENE"),
      ("1", 550L, 560L, "ZGENE"), ("2", 900L, 999L, "FAR"))
      .toDF("chr", "start", "end", "gene_name")
    val out = Annotate.annotateOtherEnds(verts, alias).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("1_500_599") == "AGENE ZGENE") // sorted, deduped
    assert(out("1_100_199") == "GENEA GENEB") // P untouched
    assert(out("2_100_199") == "")            // no overlap: kept
  }

  test("J4 promoter alias join explodes names, joins, re-collapses") {
    val alias = Seq(
      ("GeneA", "ENSG1", "ALA"), ("GeneB", "ENSG2", "ALB"))
      .toDF("gene_name", "ensembl_gene_id", "alias")
    val out = Annotate.annotatePromoters(verts, alias).collect()
      .map(r => r.getString(0) ->
        (r.getString(r.fieldIndex("ensembl_ids")),
         r.getString(r.fieldIndex("alias")))).toMap
    assert(out("1_100_199") == (("ENSG1 ENSG2", "ALA ALB")))
    assert(out("1_500_599") == (("", "")))
  }

  test("J6 intronic flag: only O vertices overlapping a region") {
    val intr = Seq(("1", 90L, 110L), ("1", 550L, 560L)).toDF("chr", "start", "end")
    val out = Annotate.flagIntronic(verts, intr).collect()
      .map(r => r.getString(0) -> r.getBoolean(r.fieldIndex("intronic_regions")))
      .toMap
    assert(out == Map(
      "1_100_199" -> false, // overlaps but is P
      "1_500_599" -> true,
      "2_100_199" -> false))
  }

  test("ensembl2name lowercases ids and dedups") {
    val alias = Seq(
      ("1", 1L, 2L, "ENSG0001", "GeneA", "t", "a", "x"),
      ("1", 3L, 4L, "ENSG0001", "GeneDup", "t", "a", "x"))
      .toDF("chr", "start", "end", "ensembl_gene_id", "gene_name",
        "gene_type", "alias", "xref_id")
    val m = Annotate.ensembl2name(alias).collect()
    assert(m.length == 1 && m(0).getString(0) == "ensg0001")
  }
}
