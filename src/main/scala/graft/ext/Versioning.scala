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
}
