package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Retrieval, TextOps}
import graft.streaming.EventStreams

/** Batch sessionization golden + the stateful streaming twin driven
  * through a MemoryStream with an advancing watermark. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def eventsDf = Seq(
    (1L, ts(0), 10L, "view", 1.0),
    (2L, ts(10), 10L, "view", 2.0),
    (3L, ts(55), 10L, "buy", 3.0),   // 45-min gap: new session
    (4L, ts(5), 20L, "view", 4.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("batch sessionization splits on the inactivity gap") {
    val out = EventStreams.sessionizeBatch(eventsDf, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("session_seq"))) ->
        r.getLong(r.fieldIndex("n_events"))).toMap
    assert(out == Map((10L, 1L) -> 2L, (10L, 2L) -> 1L, (20L, 1L) -> 1L))
  }

  test("a gap of exactly the cutoff does NOT split (strictly greater)") {
    val df = Seq(
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(30), 1L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStreams.sessionizeBatch(df, 30).count() == 1)
  }

  test("windowed counts bucket into tumbling windows") {
    val out = EventStreams.windowedCounts(eventsDf, "1 hour", watermark = None)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "buy" -> 1L))
  }

  test("streaming sessionization emits a session after the gap times out") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.sessionizeStream(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1L, ts(0), 10L, "view", 1.0),
        EventStreams.Event(2L, ts(10), 10L, "view", 2.0))
      query.processAllAvailable()
      // advance event time far past the gap: watermark passes session end
      input.addData(EventStreams.Event(9L,
        Timestamp.valueOf("2024-01-01 12:00:00"), 99L, "view", 0.0))
      query.processAllAvailable()
      input.addData(EventStreams.Event(10L,
        Timestamp.valueOf("2024-01-01 13:00:00"), 99L, "view", 0.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out")
        .filter(col("user_id") === 10L).collect()
      assert(out.length == 1)
      assert(out(0).getLong(out(0).fieldIndex("n_events")) == 2L)
      assert(out(0).getDouble(out(0).fieldIndex("value")) == 3.0)
    } finally query.stop()
  }

  test("windowedCounts streams from a file source and emits closed windows") {
    // max ts 11:20 -> watermark 11:10 -> the 10:00 window (end 11:00) is
    // emitted; the open 11:00 window stays in state
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    val withLate = eventsDf.unionByName(
      Seq((5L, Timestamp.valueOf("2024-01-01 11:20:00"), 20L, "view", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
    withLate.coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    val f = new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val out = EventStreams.windowedCountsStreamFromParquet(spark,
        f.getAbsolutePath, withLate.schema, queryName = "e2_spec_windows")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "buy" -> 1L))
  }

  test("streaming dedup emits exactly the batch-distinct key set") {
    val dir = java.nio.file.Files.createTempDirectory("dedupstream").toString
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
      (4L, "alpha beta"), (5L, "delta")).toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    val f = new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val streamed = EventStreams.dedupStreamFromParquet(spark,
        f.getAbsolutePath, docs.schema, queryName = "e4_spec_dedup")
      .collect().map(_.getString(0)).sorted
    val batch = docs.select(md5(col("text"))).distinct()
      .collect().map(_.getString(0)).sorted
    assert(streamed.length == 3 && streamed.sameElements(batch))
  }

  test("streaming IVF ingest assigns exactly like the batch window") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = graft.ext.Similarity.codebook(emb, 4)
    val cbRow = graft.ext.Similarity.rollCodebook(cb)
      .localCheckpoint(eager = true)
    // the window-free fold is bit-equal to ivfAssign's rounded-sim +
    // lowest-centroid-id tie-break (batch comparison first)
    val fold = graft.ext.Similarity.ivfAssignStreamable(emb, cbRow)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.ext.Similarity.ivfAssign(emb, cb)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fold == batch)
    // and the actual stream emits the same order-independent set
    val f = new java.io.File("/root/testdata/sf0.001")
      .listFiles().filter(_.getName == "embeddings.parquet").head
    val streamed = EventStreams.ivfAssignStreamFromParquet(spark,
        f.getAbsolutePath, emb.schema, cbRow,
        queryName = "e6_spec_ivf")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming SQ8 ingest encodes exactly like the batch encoder") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rng = graft.ext.Similarity.sq8Range(emb).localCheckpoint(eager = true)
    val batch = graft.ext.Similarity.sq8Encode(emb, rng)
      .select(col("corpus_id"), concat_ws(",", col("codes")).as("csv"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // streamable form is bit-equal (shared code expression)
    val streamable = graft.ext.Similarity.sq8EncodeStreamable(emb, rng)
      .select(col("corpus_id"), concat_ws(",", col("codes")).as("csv"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamable == batch)
    // and the actual stream emits the same order-independent set
    val f = new java.io.File("/root/testdata/sf0.001")
      .listFiles().filter(_.getName == "embeddings.parquet").head
    val streamed = EventStreams.sq8EncodeStreamFromParquet(spark,
        f.getAbsolutePath, emb.schema, rng, queryName = "e9_spec_sq8")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }

  test("streaming intra-doc dedup emits exactly the batch rows") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = graft.ext.Dedup.intraDocDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    val f = new java.io.File("/root/testdata/sf0.001")
      .listFiles().filter(_.getName == "documents.parquet").head
    val streamed = EventStreams.intraDocDedupStreamFromParquet(spark,
        f.getAbsolutePath, docs.schema, queryName = "e10_spec")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(streamed == batch)
  }

  // --- TIMESTAMP_NTZ regression fixtures: parquet written with
  // isAdjustedToUTC=false (Spark 4 reads it as TIMESTAMP_NTZ) broke the
  // whole event-time surface in round 7. Every event-time entry point
  // must survive all three wild encodings via normalizeTs.

  private def writeNtzFixture(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("ntzfix").toString
    eventsDf.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
  }

  test("streaming response cache: batch-1 keys become memo hits in " +
      "batch 2, compute runs once per key") {
    val base = java.nio.file.Files.createTempDirectory("e11spec").toString
    def writeOne(rows: Seq[(Long, String)], name: String,
                 mtime: Long): Unit = {
      val tmp = s"$base/_tmp_$name"
      rows.toDF("request_id", "key").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$base/reqs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // batch 1: A, B (A duplicated); batch 2: A again (must be a HIT),
    // C novel (must compute)
    val now = System.currentTimeMillis()
    writeOne(Seq((2L, "A"), (4L, "A"), (6L, "B")), "b0", now - 60000L)
    writeOne(Seq((1L, "A"), (3L, "C")), "b1", now)
    val computed = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = EventStreams.responseCacheStreamFromParquet(spark,
      s"$base/reqs", s"$base/memo", s"$base/out",
      misses => {
        val ks = misses.select("key").collect().map(_.getString(0))
        computed.synchronized { computed ++= ks }
        misses.select(col("key"),
          concat(lit("doc:"), col("key")).as("response"))
      })
    val rows = out.collect()
      .map(r => r.getLong(r.fieldIndex("request_id")) ->
        (r.getString(r.fieldIndex("key")),
         r.getString(r.fieldIndex("response")),
         r.getBoolean(r.fieldIndex("cached")))).toMap
    assert(rows.size == 5)
    // every request answered with its key's document
    rows.foreach { case (_, (k, resp, _)) => assert(resp == s"doc:$k") }
    // batch 1 all cold; batch 2: A is a cross-batch HIT, C computes
    assert(!rows(2L)._3 && !rows(4L)._3 && !rows(6L)._3)
    assert(rows(1L)._3, "batch-2 repeat of a batch-1 key must be a hit")
    assert(!rows(3L)._3)
    // one compute per distinct key, A NOT recomputed in batch 2
    assert(computed.sorted == Seq("A", "B", "C"))
  }

  test("streaming graph ingest emits exactly the batch forward edges " +
      "across a two-batch split") {
    // 3 tight clusters (the KnnGraphSpec fixture shape): base = 10 per
    // cluster, new arrivals = 2 per cluster streamed as two files
    val all = for {
      c <- 0 until 3
      j <- 0 until 12
    } yield {
      val v = Array.fill(8)(0.05f)
      v(c) = 1.0f
      v((c + j) % 8) = v((c + j) % 8) + 0.01f * (j + 1)
      (c * 12L + j, v.toSeq)
    }
    val df = all.toDF("vec_id", "embedding")
    val base = df.filter(col("vec_id") % 12 >= 2)
      .localCheckpoint(eager = true)
    val batch = df.filter(col("vec_id") % 12 < 2)
    val g = graft.ext.Similarity.knnGraphNNDescent(base, k = 5,
      rounds = 2).localCheckpoint(eager = true)
    val tmp = java.nio.file.Files.createTempDirectory("e12spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/vecs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(batch.filter(col("vec_id") % 24 === 0), "b0", now - 60000L)
    writeOne(batch.filter(col("vec_id") % 24 =!= 0), "b1", now)
    val streamed = EventStreams.graphIngestStreamFromParquet(spark,
      s"$tmp/vecs", batch.schema, base, g, s"$tmp/out", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val oracle = graft.ext.Similarity.knnGraphForwardEdges(base, g,
        batch, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == oracle, "stream == batch forward edges")
    assert(streamed.size == 30 && streamed.map(_._1).size == 6,
      "6 new ids x 5 edges")
  }

  test("streaming bm25 ingest emits exactly the batch postings segments " +
      "across a two-batch split, and compaction serves r1's rankings") {
    val docs = Seq(
      (0L, "common rare alpha"),
      (1L, "common rare rare beta"),
      (2L, "common beta beta gamma"),
      (3L, "common gamma"),
      (4L, "   ") // empty after tokenization → (4, NULL, 0, 0) marker
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e13spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/docs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(docs.filter(col("doc_id") % 2 === 0), "b0", now - 60000L)
    writeOne(docs.filter(col("doc_id") % 2 === 1), "b1", now)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3))).toSet
    val streamed = EventStreams.bm25IngestStreamFromParquet(spark,
      s"$tmp/docs", docs.schema, s"$tmp/out")
    val batchSeg = graft.ext.Retrieval.docPostings(docs)
    assert(canon(streamed) == canon(batchSeg), "stream == batch segments")
    assert(canon(streamed).contains((4L, None, 0L, 0L)),
      "empty doc carries its dl marker")
    // compaction from the STREAMED segments serves the same rankings
    // as the direct batch index — the full LSM equality
    val probes = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"), col("text"))
    def ranks(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val served = Retrieval.bm25Served(
      Retrieval.bm25FromSegments(streamed), probes)
    assert(ranks(served) == ranks(Retrieval.bm25(docs, probes)),
      "compacted-segment serve == direct batch bm25")
  }

  test("streaming dedup ingest: standing wins across batches, a later " +
      "batch's dup of an earlier survivor drops, state grows survivors-only") {
    val standing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b0 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),   // dup of standing
      (5L, "an entirely fresh batch document with new words"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (7L, "an entirely fresh batch document with new words"), // dup of b0's 5
      (9L, "another singleton batch document nothing matches"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e18spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/docs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(b0, "b0", now - 60000L)
    writeOne(b1, "b1", now)
    val out = EventStreams.dedupIngestStreamFromParquet(spark,
      s"$tmp/docs", standing.schema, standing, s"$tmp/state", s"$tmp/out")
    // 3 drops to standing 1 (batch 0); 5 survives and joins the state;
    // 7 then drops to SURVIVOR 5 (cross-batch continuity); 9 survives
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(5L, 9L))
    // survivors-only state: the standing docs dir holds 1, 5, 9 — the
    // dropped 3 and 7 never grew the index
    assert(EventStreams.readCommitted(spark, s"$tmp/state/docs",
        s"$tmp/state")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 5L, 9L))
  }

  test("streaming span ingest: cross-batch region duplication caught, " +
      "standing wins, unrelated text never spans") {
    import graft.ext.Dedup
    val sh = "the exact same forty eight character sentence ok".take(48)
    val standing = Seq((1L, "q" * 10 + sh + "r" * 10))
      .toDF("doc_id", "text")
    // batch 0: a fresh region (its own 44-char run) + unrelated text;
    // batch 1: copies BOTH batch 0's run (cross-batch continuity — the
    // property one batch call cannot exhibit) AND the standing region
    val b0 = Seq(
      (10L, "a" * 44 + "kkkk"),
      (11L, "totally unrelated text that matches nothing else"))
      .toDF("doc_id", "text")
    val b1 = Seq((20L, "mm" + "a" * 44 + sh + "pp"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e21spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/docs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(b0, "b0", now - 60000L)
    writeOne(b1, "b1", now)
    val out = EventStreams.spanIngestStreamFromParquet(spark,
        s"$tmp/docs", standing.schema, standing, s"$tmp/state", s"$tmp/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 0: doc 10's run is NEW (intra-doc 40-grams at 1..5 — pos 1
    // canonical, 2..5 dup -> span [2,44]); doc 11 emits nothing.
    // batch 1: doc 20 duplicates doc 10's run (gram positions 3..7,
    // all dup against the now-standing batch-0 grams -> span [3,46])
    // AND the original standing region (positions 47..55 -> [47,94]);
    // positions 7 and 47 are not consecutive, so the runs stay two
    // spans even though their coverage abuts
    assert(out == Set((10L, 2L, 44L), (20L, 3L, 46L), (20L, 47L, 94L)),
      s"got $out")
    // the standing gram index grew by BOTH batches' segments
    val grams = EventStreams.readCommitted(spark, s"$tmp/state/grams",
      s"$tmp/state")
    assert(grams.agg(org.apache.spark.sql.functions.sum("__ns"))
      .collect()(0).getLong(0) > 0)
  }

  test("append-only ingest replay guard: a full re-delivery run " +
      "(lost checkpoint) re-appends nothing") {
    // r12 verdict #4: the append-only segment loops (e13 here as the
    // representative; e11/e12/e15/e16/e19 share the same inline guard)
    // were unguarded — a replayed batch double-appended its segment.
    // The harshest replay is a RESTART WITH A LOST CHECKPOINT: every
    // batch re-delivers with batchIds starting again at 0, all at or
    // below the committed marker, so the whole second run must be a
    // no-op on the standing outDir.
    val docs = Seq(
      (1L, "spark streams micro batches"),
      (2L, "postings segments append only"),
      (3L, "replay must not double count"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e13replay").toString
    docs.coalesce(1).write.parquet(s"$tmp/docs")
    def seg = EventStreams.readCommitted(spark, s"$tmp/out", s"$tmp/out")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3)))
    EventStreams.bm25IngestStreamFromParquet(spark, s"$tmp/docs",
      docs.schema, s"$tmp/out").queryExecution.toRdd.count()
    val once = seg.toSeq.sorted
    assert(once.nonEmpty)
    // second full run: fresh checkpoint, same outDir — pure replay
    EventStreams.bm25IngestStreamFromParquet(spark, s"$tmp/docs",
      docs.schema, s"$tmp/out").queryExecution.toRdd.count()
    assert(seg.toSeq.sorted == once,
      "replayed run re-appended postings segments")
  }

  test("ingest replay guard: a committed batchId re-delivery is a no-op") {
    import graft.ext.Dedup
    val standing = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (5L, "completely different sentence about spark plans"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e18replay").toString
    EventStreams.writeSeed(standing, s"$tmp/state/docs")
    EventStreams.writeSeed(Dedup.lshBands(standing, "doc_id", "text"),
      s"$tmp/state/bands")
    def outIds = EventStreams.readCommitted(spark, s"$tmp/out",
        s"$tmp/state")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def stateIds = EventStreams.readCommitted(spark, s"$tmp/state/docs",
        s"$tmp/state")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    EventStreams.dedupIngestBatch(spark, batch, 0L, s"$tmp/state",
      s"$tmp/out")
    assert(outIds == Seq(5L) && stateIds == Seq(1L, 5L))
    // REPLAY of batch 0 (the post-failure re-delivery): no double
    // emit, no double state growth
    EventStreams.dedupIngestBatch(spark, batch, 0L, s"$tmp/state",
      s"$tmp/out")
    assert(outIds == Seq(5L), "replayed batch re-emitted survivors")
    assert(stateIds == Seq(1L, 5L), "replayed batch re-grew the state")
    // the NEXT batch id still processes
    val b1 = Seq((7L, "completely different sentence about spark plans"))
      .toDF("doc_id", "text") // dup of survivor 5
    EventStreams.dedupIngestBatch(spark, b1, 1L, s"$tmp/state",
      s"$tmp/out")
    assert(outIds == Seq(5L) && stateIds == Seq(1L, 5L),
      "batch 1's dup-of-survivor should drop")
  }

  test("streaming phash ingest: cross-batch pairing against earlier " +
      "arrivals, unrelated images never pair") {
    import graft.ext.Multimodal
    val docs = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val base = Multimodal.synthesizeCellImages(docs, "doc_id")
    val img1 = base.filter(col("media_id") === 1L)
    // standing: image 1 only; batch 0: a copy (id 10); batch 1: another
    // copy (id 20) plus the UNRELATED image 2 re-idd as 21
    val b0 = img1.withColumn("media_id", lit(10L))
    val b1 = img1.withColumn("media_id", lit(20L))
      .unionByName(base.filter(col("media_id") === 2L)
        .withColumn("media_id", lit(21L)))
    val tmp = java.nio.file.Files.createTempDirectory("e20spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/media/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(b0, "b0", now - 60000L)
    writeOne(b1, "b1", now)
    val out = EventStreams.phashIngestStreamFromParquet(spark,
        s"$tmp/media", b0.schema, Multimodal.hashIndex(img1),
        s"$tmp/state", s"$tmp/out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0 pairs (1,10); batch 1 pairs (1,20) AND (10,20) — the
    // cross-batch hit against batch 0's arrival — while 21 never pairs
    assert(out == Set((1L, 10L), (1L, 20L), (10L, 20L)))
  }

  test("streaming band ingest emits exactly the batch lshBands segments " +
      "across a two-batch split, and the incremental probe reads them") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different words entirely unrelated here"),
      (5L, "")  // zero-token doc: '' shingle, still banded
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e15spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/docs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(docs.filter(col("doc_id") % 2 === 0), "b0", now - 60000L)
    writeOne(docs.filter(col("doc_id") % 2 === 1), "b1", now)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val streamed = EventStreams.bandIngestStreamFromParquet(spark,
      s"$tmp/docs", docs.schema, s"$tmp/out")
    val batchSeg = graft.ext.Dedup.lshBands(docs, "doc_id", "text")
      .select(col("doc").as("doc_id"), col("band").cast("long"),
        col("band_hash"))
    assert(canon(streamed) == canon(batchSeg), "stream == batch bands")
    assert(streamed.filter(col("doc_id") === 5L).count() == 4,
      "zero-token doc still carries its 4 band rows")
    // the streamed segments ARE the standing index an incremental
    // probe reads — new batch 6 finds its dup of doc 1 through them
    val batch6 = Seq((6L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val inc = graft.ext.Dedup.incrementalCandidates(
        docs, streamed.select(col("doc_id").as("doc"), col("band"),
          col("band_hash")), batch6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc.contains((1L, 6L)) && inc((1L, 6L)) == 1.0,
      "probe through streamed segments finds the planted dup")
  }

  test("streaming as-of enriches batch-2 probes against batch-1 state " +
      "and matches the batch twin") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // batch 0 (day 1): a probe before any ref, a ref, an equal-ts
      // probe, an equal-ts ref pair (id tie-break)
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, "purchase", 50.0),
      (3L, ts("2024-01-01 10:00:00"), 1L, "click", 2.0),
      (4L, ts("2024-01-01 12:00:00"), 1L, "purchase", 60.0),
      (5L, ts("2024-01-01 12:00:00"), 1L, "purchase", 70.0),
      (6L, ts("2024-01-01 13:00:00"), 2L, "view", 5.0), // user w/o refs
      // batch 1 (day 2): probes that must see CARRIED batch-0 state,
      // then a fresh ref superseding it
      (7L, ts("2024-01-02 09:00:00"), 1L, "click", 3.0),
      (8L, ts("2024-01-02 10:00:00"), 1L, "purchase", 80.0),
      (9L, ts("2024-01-02 11:00:00"), 1L, "view", 4.0),
      (10L, ts("2024-01-02 12:00:00"), 2L, "click", 6.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("e14spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/ev/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(ev.filter(col("ts") < lit("2024-01-02")), "b0", now - 60000L)
    writeOne(ev.filter(col("ts") >= lit("2024-01-02")), "b1", now)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val streamed = canon(EventStreams.asofStreamFromParquet(spark,
      s"$tmp/ev", ev.schema, queryName = "e14spec")
      .select("event_id", "user_id", "ts", "asof_ref_id", "asof_ref_value"))
    assert(streamed(1L).isEmpty, "probe before any ref")
    assert(streamed(3L).contains(2L), "equal-ts ref visible in-batch")
    assert(streamed(7L).contains(5L),
      "batch-2 probe sees CARRIED batch-1 state (equal-ts id tie-break)")
    assert(streamed(9L).contains(8L), "fresh in-batch ref supersedes state")
    assert(streamed(6L).isEmpty && streamed(10L).isEmpty,
      "ref-less user stays NULL across both batches")
    val batch = canon(EventStreams.asofJoinBatch(ev))
    assert(streamed == batch, "stream == batch as-of")
  }

  test("normalizeTs maps NTZ parquet to the same instants as TIMESTAMP") {
    val f = writeNtzFixture()
    val raw = spark.read.parquet(f.getAbsolutePath)
    assert(raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val norm = EventStreams.normalizeTs(raw)
    assert(norm.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = norm.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val want = eventsDf.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(got == want)
  }

  test("batch sessionization runs over an NTZ parquet via normalizeTs") {
    val f = writeNtzFixture()
    val events = EventStreams.normalizeTs(
      spark.read.parquet(f.getAbsolutePath))
    val out = EventStreams.sessionizeBatch(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("session_seq"))) ->
        r.getLong(r.fieldIndex("n_events"))).toMap
    assert(out == Map((10L, 1L) -> 2L, (10L, 2L) -> 1L, (20L, 1L) -> 1L))
  }

  test("both stream readers run over an NTZ parquet source") {
    val f = writeNtzFixture()
    val rawSchema = spark.read.parquet(f.getAbsolutePath).schema
    assert(rawSchema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // windowed counts: max ts 10:55 -> watermark 10:45 -> no window end
    // (11:00) has passed, so append emits nothing — the point is the
    // plan analyzes and runs (round 7 died in analysis)
    val w = EventStreams.windowedCountsStreamFromParquet(spark,
      f.getAbsolutePath, rawSchema, queryName = "e2_ntz_windows")
    assert(w.count() == 0)
    // sessionize: user 10's first session closes IN-BATCH when the
    // 10:55 event breaks the gap (emitted immediately, no watermark
    // needed); the two still-open sessions stay in state
    val s = EventStreams.sessionizeStreamFromParquet(spark,
      f.getAbsolutePath, rawSchema, queryName = "e3_ntz_sessions")
    val rows = s.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(rows(0).fieldIndex("user_id")) == 10L)
    assert(rows(0).getLong(rows(0).fieldIndex("n_events")) == 2L)
  }

  test("streaming decontamination flags exactly the batch overlap rows") {
    val dir = java.nio.file.Files.createTempDirectory("deconstream").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // clean train
      (2L, "the secret bench phrase appears right here now verbatim"),
      (3L, "totally unrelated words in this training document text"),
      (37L * 2, "the secret bench phrase appears right here now indeed"))
      .toDF("doc_id", "text") // 74 ≡ 0 (mod 37) → held-out side
    docs.coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    val f = new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val benchRow = docs.filter(col("doc_id") % 37 === 0)
      .select(explode(array_distinct(Dedup.shinglesOfTokens(
        TextOps.tokens(lower(col("text"))), 5))).as("__g"))
      .select(substring(md5(col("__g")), 1, 16).as("__gh")).distinct()
      .groupBy().agg(sort_array(collect_set(col("__gh"))).as("bgrams"))
      .localCheckpoint(eager = true)
    val streamed = EventStreams.decontaminateStreamFromParquet(spark,
        f.getAbsolutePath, docs.schema, benchRow,
        col("doc_id") % 37 =!= 0, queryName = "e7_spec_decon")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    val batch = TextOps.decontaminate(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(streamed.map(_._1).toSeq == Seq(1L, 2L, 3L)) // held-out absent
    assert(streamed.find(_._1 == 2L).get._4)  // shared 5-gram → flagged
    assert(!streamed.find(_._1 == 1L).get._4) // clean doc passes
    assert(streamed.sameElements(batch))
  }

  test("streaming quality filter admits exactly the batch-filter rows") {
    val dir = java.nio.file.Files.createTempDirectory("qfstream").toString
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog slept there too"), // good
      (2L, "zz zz zz zz zz zz"),                                  // repetitive
      (3L, "the quick brown fox jumps over the lazy dog today"),  // good
      (4L, "@@@ ### $$$ %%% ^^^"))                                // symbols
      .toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    val f = new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val streamed = EventStreams.qualityFilterStreamFromParquet(spark,
        f.getAbsolutePath, docs.schema, minQuality = 0.6,
        queryName = "e5_spec_qf")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val batch = docs
      .select(col("doc_id"),
        graft.ext.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        graft.ext.TextOps.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(streamed.nonEmpty && streamed.map(_._1).contains(1L))
    assert(!streamed.map(_._1).contains(4L)) // symbol soup rejected
    assert(streamed.sameElements(batch))
  }

  test("streaming sampling admission admits exactly the batch-sample rows") {
    val dir = java.nio.file.Files.createTempDirectory("smpstream").toString
    // ids 0..199, short texts → all in the 0.25-rate 'short' stratum:
    // the admitted set is a strict, hash-determined subset
    val docs = spark.range(200)
      .select(col("id").as("doc_id"),
        concat(lit("tok word item "), col("id").cast("string")).as("text"))
    docs.coalesce(1).write.mode("overwrite").parquet(dir + "/in")
    val f = new java.io.File(dir + "/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val streamed = EventStreams.sampleStreamFromParquet(spark,
        f.getAbsolutePath, docs.schema, queryName = "e8_spec_sample")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val batch = graft.ext.Sampling.stratifiedSample(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(streamed.nonEmpty && streamed.length < 200) // really sampled
    assert(streamed.forall(_._3 == "short"))
    assert(streamed.sameElements(batch))
  }

  test("streaming NB scoring against a frozen model == batch classifier " +
      "across a two-batch split") {
    val docs = Seq(
      (0L, "the cats sat upon a mat and the dogs sat down"),
      (3L, "zz zz zz zz zz zz zz zz"),
      (6L, "the foxes run to a dens and the birds flew in"),
      (9L, "qq qq qq qq qq qq qq qq"),
      (12L, ""),
      (1L, "the cats and dogs sat on a mat"),
      (2L, "zz qq zz qq zz qq")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("e16spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/docs/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(docs.filter(col("doc_id") % 2 === 0), "b0", now - 60000L)
    writeOne(docs.filter(col("doc_id") % 2 === 1), "b1", now)
    val m = graft.ext.TextOps.nbTrain(docs, threshold = 0.7)
    val frozen = graft.ext.TextOps.NbModel(
      m.model.localCheckpoint(eager = true),
      m.tot.localCheckpoint(eager = true),
      m.pri.localCheckpoint(eager = true))
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val streamed = EventStreams.nbScoreStreamFromParquet(spark,
      s"$tmp/docs", docs.schema, frozen, s"$tmp/out")
    val batch = graft.ext.TextOps.nbQualityClassifier(docs,
      threshold = 0.7)
    assert(canon(streamed) == canon(batch), "stream == batch scores")
    // the split put pos-evidence doc 1 and its seed docs in DIFFERENT
    // batches: the frozen model carried the evidence across
    assert(streamed.filter(col("doc_id") === 1L).collect()(0)
      .getString(4) == "pos")
  }

  test("streaming HLL ingest: merged segment registers == one-shot sketch, cert holds") {
    import spark.implicits._
    val ev = Seq(("click", 1L), ("click", 2L), ("click", 2L),
      ("view", 1L), ("view", 3L), ("view", 4L), ("view", 4L),
      ("buy", 9L)).toDF("event_type", "user_id")
    // register max-merge: union of per-slice segments estimates
    // exactly what the one-shot sketch over the whole frame does —
    // even with OVERLAPPING slices (user 2 in both)
    val segs = graft.ext.Sketches.hllSegments(
        ev.filter(col("user_id") % 2 === 0))
      .union(graft.ext.Sketches.hllSegments(
        ev.filter(col("user_id") % 2 === 1)))
      .union(graft.ext.Sketches.hllSegments(ev.filter(col("user_id") === 2L)))
    val merged = segs.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot, "segment merge != one-shot sketch")
    // end-to-end stream: two micro-batches, cert against exact
    val tmp = java.nio.file.Files.createTempDirectory("e17spec").toString
    def writeOne(d: org.apache.spark.sql.DataFrame, name: String,
                 mtime: Long): Unit = {
      val t = s"$tmp/_tmp_$name"
      d.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$tmp/ev/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(ev.filter(col("user_id") % 2 === 0), "b0", now - 60000L)
    writeOne(ev.filter(col("user_id") % 2 === 1), "b1", now)
    val out = EventStreams.hllIngestStreamFromParquet(spark, s"$tmp/ev",
      ev.schema, ev, s"$tmp/out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(("click", 2L, true), ("view", 3L, true),
      ("buy", 1L, true)))
  }

  // ------- exactly-once crash injection (r13 verdict #1) -------

  /** multiset canon of a committed dir: every column stringified so
    * duplicate rows count, not collapse */
  private def multiset(dir: String, markerDir: String): Map[String, Int] =
    EventStreams.readCommitted(spark, dir, markerDir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|"))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("crash injection e18: a crash between a batch's writes and its " +
      "commit double-appends nothing — replay restores multiset " +
      "equality with the uncrashed run") {
    import graft.ext.Dedup
    val standing = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b0 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (5L, "completely different sentence about spark plans"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (7L, "completely different sentence about spark plans"), // dup of 5
      (9L, "another singleton batch document nothing matches"))
      .toDF("doc_id", "text")
    def seed(root: String): Unit = {
      EventStreams.writeSeed(standing, s"$root/state/docs")
      EventStreams.writeSeed(Dedup.lshBands(standing, "doc_id", "text"),
        s"$root/state/bands")
    }
    // uncrashed twin: batches 0 and 1 fold cleanly
    val clean = java.nio.file.Files.createTempDirectory("e18clean").toString
    seed(clean)
    EventStreams.dedupIngestBatch(spark, b0, 0L, s"$clean/state",
      s"$clean/out")
    EventStreams.dedupIngestBatch(spark, b1, 1L, s"$clean/state",
      s"$clean/out")
    // crashed run: batch 0 commits; batch 1 CRASHES mid-batch — its
    // survivors landed in out/b1 and HALF its kept docs landed in
    // docs/b1, but neither bands/b1 nor the commit marker did (the
    // exact pre-commit window the r12 guard left open)
    val root = java.nio.file.Files.createTempDirectory("e18crash").toString
    seed(root)
    EventStreams.dedupIngestBatch(spark, b0, 0L, s"$root/state",
      s"$root/out")
    b1.filter(col("doc_id") === 7L) // partial + WRONG rows: 7 is a dup
      .write.parquet(EventStreams.batchPath(s"$root/out", 1L))
    b1.limit(1)
      .write.parquet(EventStreams.batchPath(s"$root/state/docs", 1L))
    // the uncommitted partial rows are invisible to every reader
    assert(EventStreams.readCommitted(spark, s"$root/out", s"$root/state")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(5L))
    // restart: Structured Streaming re-delivers batch 1 in full; the
    // replay overwrites both partial dirs wholesale and commits
    EventStreams.dedupIngestBatch(spark, b1, 1L, s"$root/state",
      s"$root/out")
    assert(multiset(s"$root/out", s"$root/state")
      == multiset(s"$clean/out", s"$clean/state"),
      "crashed+replayed output differs from the uncrashed run")
    assert(multiset(s"$root/state/docs", s"$root/state")
      == multiset(s"$clean/state/docs", s"$clean/state"),
      "crashed+replayed docs state differs from the uncrashed run")
    assert(multiset(s"$root/state/bands", s"$root/state")
      == multiset(s"$clean/state/bands", s"$clean/state"),
      "crashed+replayed bands state differs from the uncrashed run")
  }

  test("crash injection e21: partial span output + gram segment without " +
      "a commit are invisible and the replay restores exactly-once") {
    import graft.ext.Dedup
    val sh = "the exact same forty eight character sentence ok".take(48)
    val standing = Seq((1L, "q" * 10 + sh + "r" * 10))
      .toDF("doc_id", "text")
    val b0 = Seq((10L, "a" * 44 + "kkkk")).toDF("doc_id", "text")
    val b1 = Seq((20L, "mm" + "a" * 44 + sh + "pp")).toDF("doc_id", "text")
    def run(root: String, crash: Boolean): Unit = {
      Dedup.writeGramIndex(standing,
        EventStreams.seedPath(s"$root/state/grams"))
      EventStreams.spanIngestBatch(spark, b0, 0L, s"$root/state",
        s"$root/out")
      if (crash) {
        // mid-batch-1 crash: the span rows and the gram segment both
        // landed, the commit did not — the worst pre-commit cut
        Dedup.incrementalSpansIndexed(
            EventStreams.readCommitted(spark, s"$root/state/grams",
              s"$root/state").groupBy("h")
              .agg(org.apache.spark.sql.functions.sum(col("__ns"))
                .as("__ns")), b1)
          .write.parquet(EventStreams.batchPath(s"$root/out", 1L))
        Dedup.gramSegment(b1)
          .write.parquet(EventStreams.batchPath(s"$root/state/grams", 1L))
        // invisible: committed marker still at 0
        assert(EventStreams.readCommitted(spark, s"$root/out",
          s"$root/state").collect().map(_.getLong(0)).toSet == Set(10L))
      }
      EventStreams.spanIngestBatch(spark, b1, 1L, s"$root/state",
        s"$root/out")
    }
    val clean = java.nio.file.Files.createTempDirectory("e21clean").toString
    val root = java.nio.file.Files.createTempDirectory("e21crash").toString
    run(clean, crash = false)
    run(root, crash = true)
    assert(multiset(s"$root/out", s"$root/state")
      == multiset(s"$clean/out", s"$clean/state"),
      "crashed+replayed span output differs from the uncrashed run")
    assert(multiset(s"$root/state/grams", s"$root/state")
      == multiset(s"$clean/state/grams", s"$clean/state"),
      "crashed+replayed gram state differs from the uncrashed run")
  }

  test("commit-aware reader never surfaces an uncommitted batch dir, " +
      "even one far above the marker") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("roCommit").toString
    EventStreams.writeSeed(df, s"$tmp/data")
    // junk from a writer that died before ANY commit
    Seq((99L, "junk")).toDF("doc_id", "text")
      .write.parquet(EventStreams.batchPath(s"$tmp/data", 0L))
    Seq((98L, "junk")).toDF("doc_id", "text")
      .write.parquet(EventStreams.batchPath(s"$tmp/data", 7L))
    val seen = EventStreams.readCommitted(spark, s"$tmp/data", tmp)
      .collect().map(_.getLong(0)).toSet
    assert(seen == Set(1L), s"uncommitted batch rows surfaced: $seen")
  }
}
