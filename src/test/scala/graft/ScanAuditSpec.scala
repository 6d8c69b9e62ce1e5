package graft

/** Scan-quality audit — the two plan properties PlanAuditSpec (join
  * shapes) and SearchSpec (partition pruning) don't cover:
  *
  *  1. FILTER PUSHDOWN: a lane that caps a raw parquet column
  *     (vec_id < 2000, doc_id < N) must deliver that predicate to the
  *     scan as a PushedFilter — at 100 TB the difference between
  *     reading the probe slice and reading the corpus.
  *  2. COLUMN PRUNING: a lane that consumes two columns of a
  *     five-column table must scan a two-column ReadSchema — a scan
  *     that reads all columns for a 2-column projection drags the
  *     whole table through IO for nothing.
  *
  * Both are asserted on the physical plan STRING (the PlanAuditSpec
  * convention — robust across AQE wrapping), against a real data dir.
  * If a refactor reorders projections so Catalyst can no longer push
  * or prune, these fail CI instead of the cluster. */
class ScanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("probe caps push down to the parquet scan as filters") {
    // r3's relevance pool scans embeddings with vec_id < 2000 on the
    // probe side and the full corpus on the other — the cap must reach
    // the scan, not evaluate post-IO
    val p = plan("r3_mmr_rerank")
    assert(p.contains("LessThan(vec_id,"),
      s"vec_id probe cap not pushed to the embeddings scan:\n${p.take(2000)}")
    // t14 caps documents at doc_id < 2000 (rag's equivalent cap sits
    // behind an eager chunk checkpoint, so its seed scan is not in
    // the visible plan — t14's is)
    val p2 = plan("t14_hash_embed")
    assert(p2.contains("LessThan(doc_id,"),
      "doc_id cap not pushed to the documents scan")
  }

  test("lanes consuming a column subset scan a pruned ReadSchema") {
    // d1 groups md5(text) by doc id: of documents' five columns
    // (doc_id, text, lang, source, n_chars) only two may be read
    val p = plan("d1_exact_dedup")
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
      .filter(_.contains("text"))
    assert(reads.nonEmpty, s"no documents scan found:\n${p.take(1500)}")
    reads.foreach { r =>
      assert(!r.contains("lang") && !r.contains("source") &&
        !r.contains("n_chars"),
        s"documents scan reads unused columns: $r")
    }
    // d16 likewise touches only (doc_id, text)
    val p3 = plan("d16_exact_spans")
    val r3 = "ReadSchema: [^\\n]*".r.findAllIn(p3).toSeq
      .filter(_.contains("text"))
    assert(r3.nonEmpty && r3.forall(r => !r.contains("lang") &&
      !r.contains("n_chars")),
      s"d16 scan reads unused columns: $r3")
  }

  test("the range probe pushes partition AND data filters to the scan") {
    // the q5 serving path's seed scan runs (and checkpoints) at lane
    // construction, so the LANE plan can't show it — audit the probe
    // itself over a chromosome-partitioned snapshot: chr prunes at
    // directory level (PartitionFilters) and start/end land as
    // PushedFilters, so the surviving partition's row groups skip on
    // parquet min/max
    import org.apache.spark.sql.functions._
    val snap = java.nio.file.Files.createTempDirectory("scanaudit").toString
    spark.range(0, 200)
      .select(concat(lit("c"), (col("id") % 5)).as("chr"),
        (col("id") * 10).as("start"), (col("id") * 10 + 9).as("end"),
        col("id").cast("string").as("fragment"))
      .write.mode("overwrite").partitionBy("chr").parquet(snap)
    val nodes = spark.read.parquet(snap)
    val p = graft.core.Intervals.probeOverlap(nodes, "c3", 100, 200)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("= c3"),
      s"chr did not prune partitions:\n${p.take(1500)}")
    assert(p.contains("LessThanOrEqual(start,") &&
      p.contains("GreaterThanOrEqual(end,"),
      s"range predicates not pushed:\n${p.take(1500)}")
  }
}
