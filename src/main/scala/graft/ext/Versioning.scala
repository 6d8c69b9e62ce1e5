package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: the between-runs complement of the
  * within-run incremental operators (d12 incremental dedup, e13/e15
  * segment ingest). A training pipeline that re-crawls or re-filters
  * its corpus needs the DELTA between two snapshots — which documents
  * appeared, vanished, or changed text — both to drive incremental
  * downstream work (only `added`/`changed` docs need re-embedding,
  * re-deduping, re-scoring) and to audit what a data refresh actually
  * did before a run trains on it.
  */
object Versioning {

  /** Snapshot diff: full outer join of two corpus versions on id,
    * comparing md5(text) — emits ONLY the delta rows
    * (`added` | `removed` | `changed`), with both content hashes so a
    * consumer can route work without re-reading either snapshot.
    * Unchanged docs (the overwhelming majority between refreshes) are
    * filtered before anything else touches them.
    *
    * Scale: one equi-join on the id — both sides shuffle (id, 32-byte
    * hash), never text; at cluster scale two id-bucketed snapshots
    * co-locate and the join is shuffle-free. The md5 comparison makes
    * `changed` a pure content test, independent of column order,
    * storage layout, or re-crawl timestamps.
    * Output: (doc_id, status, old_hash, new_hash). */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    def hashed(d: DataFrame, h: String): DataFrame =
      d.select(col(idCol).as("doc_id"), md5(col(textCol)).as(h))
    hashed(oldDocs, "old_hash")
      .join(hashed(newDocs, "new_hash"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("same")).as("status"),
        col("old_hash"), col("new_hash"))
      .filter(col("status") =!= "same")
  }

  /** Index refresh driven by a [[corpusDiff]] delta: drop the stale
    * band rows (removed + changed docs), append fresh ones (added +
    * changed docs, banded from the NEW snapshot's text), and the
    * result is bit-identical to rebuilding [[Dedup.lshBands]] over
    * the whole new snapshot — the purity argument one more time
    * (band rows are per-document functions, and unchanged docs have
    * unchanged text). The v2 gate oracle pins exactly that rebuild.
    *
    * Cost shape: one anti-join of the standing index against the
    * (small) delta ids, one semi-join-pruned band computation over
    * delta docs — per-refresh work scales with the delta, never the
    * corpus. Output: lshBands' (doc, band, band_hash) form. */
  def refreshBandIndex(oldBands: DataFrame, diff: DataFrame,
                       newDocs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", k: Int = 3,
                       bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val stale = diff.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id").as("doc"))
    val fresh = diff.filter(col("status").isin("added", "changed"))
      .select(col("doc_id").as(idCol))
    oldBands.join(stale, Seq("doc"), "left_anti")
      .unionByName(Dedup.lshBands(
        newDocs.join(fresh, Seq(idCol), "left_semi"),
        idCol, textCol, k, bands, rowsPerBand))
  }
}
