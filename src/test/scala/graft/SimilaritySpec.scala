package graft

import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, Similarity}

/** Similarity search + multimodal plumbing. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val r = spark.range(1).select(
      Similarity.cosine(array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0))).as("o"),
      Similarity.cosine(array(lit(1.0), lit(2.0)), array(lit(1.0), lit(2.0))).as("i"),
      Similarity.cosine(array(lit(1.0), lit(0.0)), array(lit(-1.0), lit(0.0))).as("n"))
      .collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine desc, excludes self") {
    val probes = emb.filter(col("vec_id") === 0L)
    val out = Similarity.bruteForceTopK(emb, probes, k = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    // rank 1 = the near-parallel vector
    assert(out(0).getInt(1) == 1 && out(0).getLong(2) == 1L)
  }

  test("SQ8: codes bounded, flat dims code 0, rerank recovers the exact top-k") {
    val rng = Similarity.sq8Range(emb)
    val codes = Similarity.sq8Encode(emb, rng).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.size == 5)
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // dim 0 spans [-1,1]: extremes land on the code endpoints
    assert(codes(0L)(0) == 255L && codes(4L)(0) == 0L)
    // SQ8 + exact re-rank over the full pool == brute force exactly
    val sq = Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 2), k = 3,
      rerank = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bf = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 2),
      k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(sq.sorted.toSeq == bf.sorted.toSeq)
    // a flat dimension (all equal) must not poison the codes
    val flat = emb.withColumn("embedding",
      concat(col("embedding"), array(lit(7.5f))))
    val fr = Similarity.sq8Range(flat)
    val fc = Similarity.sq8Encode(flat, fr).collect()
      .map(_.getSeq[Long](1))
    assert(fc.forall(_.last == 0L))
  }

  test("IVF-SQ8: full-probe composition recovers the exact top-k") {
    val cb = Similarity.codebook(emb, 2)
    // probing every bucket with a full-depth pool must equal brute force
    val out = Similarity.ivfSq8TopK(emb, cb, emb.filter(col("vec_id") < 2),
      k = 3, nProbe = 2, rerank = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bf = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 2),
      k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(out.sorted.toSeq == bf.sorted.toSeq)
    // pruning to 1 of 2 buckets returns at most the pruned candidates
    val pruned = Similarity.ivfSq8TopK(emb, cb,
      emb.filter(col("vec_id") < 2), k = 3, nProbe = 1, rerank = 2)
      .collect()
    assert(pruned.nonEmpty && pruned.length <= out.length)
  }

  test("SQ8 recall certificate: full pool = exact recall 1.0") {
    val r = Similarity.sq8Recall(emb, emb.filter(col("vec_id") < 2),
      k = 2, rerank = 2).collect()(0)
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 1.0 && r.getBoolean(3))
  }

  test("IVF: assignment is total, probe recall covers the near bucket") {
    val cb = Similarity.codebook(emb, 2)
    val assigned = Similarity.ivfAssign(emb, cb)
    assert(assigned.count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() <= 2)
    val out = Similarity.ivfTopK(assigned, cb,
      emb.filter(col("vec_id") === 0L), k = 2, nProbe = 2).collect()
    assert(out.nonEmpty && out(0).getLong(2) == 1L)
  }

  test("IVF recall certificate: full probe = exact recall 1.0") {
    val cb = Similarity.codebook(emb, 2)
    val r = Similarity.ivfRecall(emb, cb, emb.filter(col("vec_id") < 2),
      k = 2, nProbe = 2).collect()(0)
    assert(r.getLong(1) == 4L)                 // 2 probes x k=2
    assert(r.getDouble(2) == 1.0 && r.getBoolean(3))
  }

  private def embLab = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.8f, 0.2f, 0.0f), 1),
    (4L, Array(0.95f, 0.05f, 0.0f), 0),
    (5L, Array(0.1f, 0.9f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("filtered ANN: every result shares the probe's label, ranked by cosine") {
    val probes = embLab.filter(col("vec_id") === 0L)
    val bf = Similarity.bruteForceTopKFiltered(embLab, probes, k = 3).collect()
    // label-0 corpus minus self = {1, 4}; 4 is the nearer vector
    assert(bf.map(_.getLong(2)).toSeq == Seq(4L, 1L))
    val cb = Similarity.codebook(embLab, 2)
    val ivf = Similarity.ivfTopKFiltered(embLab, cb, probes,
      k = 3, nProbe = 2).collect()
    assert(ivf.map(_.getLong(2)).toSeq == Seq(4L, 1L))
    // a label-1 probe never sees label-0 vectors, even nearer ones
    val p1 = Similarity.ivfTopKFiltered(embLab, cb,
      embLab.filter(col("vec_id") === 3L), k = 3, nProbe = 2).collect()
    assert(p1.map(_.getLong(2)).toSet == Set(2L, 5L))
  }

  test("filtered index snapshot roundtrip serves identical rankings") {
    val cb = Similarity.codebook(embLab, 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_attr_t").toString
    Similarity.writeIvfIndex(Similarity.ivfAssignAttr(embLab, cb), dir)
    val probes = embLab.filter(col("vec_id") < 2)
    val served = Similarity.ivfSearchFiltered(
      Similarity.readIvfIndex(spark, dir), cb, probes, k = 2, nProbe = 2)
    val fresh = Similarity.ivfTopKFiltered(embLab, cb, probes,
      k = 2, nProbe = 2)
    assert(served.collect().map(_.toString).sorted.toSeq ==
      fresh.collect().map(_.toString).sorted.toSeq)
  }

  test("partitioned filtered index prunes to the probed buckets and " +
      "serves rows identical to the full index") {
    val cb = Similarity.codebook(embLab, 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_part_t").toString
    Similarity.writeIvfIndexPartitioned(
      Similarity.ivfAssignAttr(embLab, cb), dir)
    val index = spark.read.parquet(dir)
    // the layout on disk is centroid_id=<c>/ directories
    assert(new java.io.File(dir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("centroid_id=")))
    val probes = embLab.filter(col("vec_id") === 0L)
    // nProbe=1 of 2 buckets: the scan must list ONLY the probed
    // bucket's directory (FileSourceScanExec.partitionFilters →
    // FileIndex.listFiles — the SearchSpec pruning contract)
    val pruned = Similarity.ivfSearchFilteredPruned(index, cb, probes,
      k = 3, nProbe = 1)
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "bucket predicate was not classified as a partition filter")
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty && files.size < index.inputFiles.length)
    // SEMANTICS: pruned serve == full-index serve, row for row
    val full = Similarity.ivfSearchFiltered(
      Similarity.ivfAssignAttr(embLab, cb), cb, probes, k = 3, nProbe = 1)
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      full.collect().map(_.toString).sorted.toSeq)
    assert(pruned.count() > 0)
  }

  test("filtered recall certificate: full probe = exact recall 1.0") {
    val cb = Similarity.codebook(embLab, 2)
    val r = Similarity.filteredIvfRecall(embLab, cb,
      embLab.filter(col("vec_id") < 2), k = 2, nProbe = 2).collect()(0)
    assert(r.getLong(0) == r.getLong(1))       // all exact hits recovered
    assert(r.getDouble(2) == 1.0 && r.getBoolean(3))
  }

  test("incremental phash probe: batch pairs emit, standing pairs never do") {
    val docs = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val base = Multimodal.synthesizeCellImages(docs, "doc_id")
    // standing holds a byte-identical dup pair (1, 5) of its own
    val standing = base.unionByName(base.filter(col("media_id") === 1L)
      .withColumn("media_id", lit(5L)))
    // the batch re-introduces image 1 under a new id
    val batch = base.filter(col("media_id") === 1L)
      .withColumn("media_id", lit(10L))
    val out = Multimodal.phashIncremental(
        Multimodal.hashIndex(standing), batch, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both standing copies pair with the batch arrival; the
    // standing-standing dup (1, 5) is NOT re-paired
    assert(out == Set((1L, 10L), (5L, 10L)))
  }

  test("multimodal decode stub: deterministic metadata, image has no duration") {
    val media = Multimodal.synthesize(
      Seq((0L, "hello"), (1L, "world"), (2L, "again")).toDF("id", "t"), "id", "t")
    val dec = Multimodal.decodeStub(media).select("media_id", "kind", "meta.*")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.isNullAt(4), r.get(4))).toMap
    assert(dec(0L)._1 == "image" && dec(0L)._2)          // image: null duration
    assert(dec(1L)._1 == "audio" && dec(1L)._3 == 1500L) // 5 bytes *100+1000
    // deterministic: same payload -> same meta
    val again = Multimodal.decodeStub(media).select("meta.width").collect()
    val again2 = Multimodal.decodeStub(media).select("meta.width").collect()
    assert(again.map(_.getInt(0)).sameElements(again2.map(_.getInt(0))))
  }

  test("real ImageIO decode reads true PNG/JPEG dims, stub-falls-back else") {
    // real PNG bytes with known dims via the fixture generator
    val imgs = Multimodal.synthesizeImages(
      Seq(3L, 20L).toDF("id"), "id")
    val dec = Multimodal.decode(imgs).select("media_id", "meta.*")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    // id=3: w=(3%19+1)*8=32, h=(3%13+1)*8=32; id=20: w=16, h=64
    assert(dec(3L) == ((32, 32, "png")))
    assert(dec(20L) == ((16, 64, "png")))
    // a real JPEG payload decodes too (codec tagged jpeg)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
      24, 17, java.awt.image.BufferedImage.TYPE_INT_RGB), "jpg", jbos)
    val jm = Multimodal.sniffImageMeta(jbos.toByteArray)
    assert(jm.contains((24, 17, "jpeg")))
    // non-image bytes fall back to the md5 stub metadata exactly
    val media = Multimodal.synthesize(
      Seq((0L, "hello"), (1L, "world")).toDF("id", "t"), "id", "t")
    val viaStub = Multimodal.decodeStub(media)
      .select("media_id", "meta.*").collect().map(_.toSeq).toSeq
    val viaReal = Multimodal.decode(media)
      .select("media_id", "meta.*").collect().map(_.toSeq).toSeq
    assert(viaReal.sortBy(_.head.toString) == viaStub.sortBy(_.head.toString))
    // truncated/corrupt "PNG" header: sniff declines, no crash
    assert(Multimodal.sniffImageMeta(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0)).isEmpty)
    assert(Multimodal.sniffImageMeta(null).isEmpty)
  }

  test("resize stub preserves aspect and caps at the box") {
    val media = Multimodal.synthesize(
      Seq((1L, "x" * 50)).toDF("id", "t"), "id", "t")
    val dec = Multimodal.resizeStub(Multimodal.decodeStub(media), 64, 48)
      .select("meta.width", "meta.height").collect()(0)
    assert(dec.getInt(0) <= 64 && dec.getInt(1) <= 48)
  }

  test("frame sampling explodes audio/video only, stride respected") {
    val media = Multimodal.synthesize(
      Seq((0L, "img"), (1L, "audio-payload")).toDF("id", "t"), "id", "t")
    val frames = Multimodal.frameSample(Multimodal.decodeStub(media), 1000L)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byId.contains(0L)) // image skipped
    // audio: 13 bytes -> 2300ms -> frames at 0,1000,2000
    assert(byId(1L) == 3L)
  }

  test("video near-dup tolerates per-frame hamming: tweaked copies pair, exact matching would miss them") {
    val ids = Seq(2L, 5L).toDF("id")
    val base = Multimodal.synthesizeGifs(ids, "id", nFrames = 3)
    // every frame cell-swapped: each frame hash lands at hamming 1-2
    // from its base frame — NO frame hash is exactly equal
    val tweaked = Multimodal.tweakGifs(
      base.filter(col("media_id") === 2), shiftId = 100L)
    val all = base.unionByName(tweaked)
    val fh = Multimodal.videoFrameHashes(all).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (f <- 0L until 3L) {
      val d = java.lang.Long.bitCount(fh((2L, f)) ^ fh((102L, f)))
      assert(d >= 1 && d <= 2, s"frame $f tweak hamming $d")
    }
    // banded hamming<=2 matching pairs all 3 frames; raising the bar
    // to exact equality (maxHamming=0) finds nothing — the regression
    // the tolerant matcher exists to prevent
    val out = Multimodal.videoNearDup(all, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 102L, 3L)))
    assert(Multimodal.videoNearDup(all, maxHamming = 0).count() == 0L)
  }

  test("AVI container: DIB frames round-trip pixel-exact, headers carry " +
      "timing, MJPEG chunks decode, mixed GIF+AVI corpora pair") {
    val ids = Seq(2L, 5L).toDF("id")
    val gifs = Multimodal.synthesizeGifs(ids, "id", nFrames = 3)
    val avis = Multimodal.synthesizeAvis(ids, "id", nFrames = 3)
    // same frame rule, different container: per-frame dHashes agree
    // EXACTLY (DIB is uncompressed — pixel-perfect round-trip)
    val gh = Multimodal.videoFrameHashes(gifs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ah = Multimodal.videoFrameHashes(avis
        .withColumn("media_id", col("media_id") + 100L)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (id <- Seq(2L, 5L); f <- 0L until 3L)
      assert(gh((id, f)) == ah((id + 100L, f)),
        s"GIF vs AVI frame hash diverged at ($id, $f)")
    // ...so a MIXED corpus pairs across containers through the one
    // near-dup engine (the 100 TB reality: formats arrive mixed)
    val mixed = Multimodal.videoNearDup(
        gifs.unionByName(avis.withColumn("media_id",
          col("media_id") + 100L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mixed == Set((2L, 102L, 3L), (5L, 105L, 3L)))
    // header sniff: avih timing = (id%20+1)*50 ms * 3 frames
    val meta = Multimodal.decode(avis).select(col("media_id"),
        col("meta.width"), col("meta.height"), col("meta.duration_ms"),
        col("meta.codec")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(meta(2L) == ((72, 64, 3 * 3 * 50L, "avi")))
    assert(meta(5L) == ((72, 64, 3 * 6 * 50L, "avi")))
    // the MJPEG ('00dc') chunk path: real JPEG frames via ImageIO —
    // lossy, so dims/count are exact and hashes near (not pinned by
    // the gate oracle; this spec is its contract)
    val frames = (0 until 3).map(f =>
      Multimodal.synthesizeCellImages(Seq(2L * 3 + f).toDF("id"), "id"))
    val imgs = Seq(0, 1, 2).map { f =>
      val row = frames(f).collect()(0)
      val p = row.getAs[Array[Byte]](2)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    }
    val mj = Multimodal.encodeAvi(imgs, usPerFrame = 40000, mjpeg = true)
    val dec = Multimodal.decodeAvi(mj)
    assert(dec.length == 3)
    assert(dec.head.getWidth == 72 && dec.head.getHeight == 64)
    assert(Multimodal.sniffAviMeta(mj).contains((72, 64, 120L)))
  }

  test("dHash: perturbed re-encode keeps the hash, distinct ids differ") {
    val ids = Seq(3L, 10L, 17L, 24L).toDF("id")
    val base = Multimodal.synthesizeCellImages(ids, "id")
    val pert = Multimodal.perturbImages(base, shiftId = 1000L)
    val h = (base.unionByName(pert))
      .collect()
      .map(r => r.getLong(0) ->
        Multimodal.dHash(r.getAs[Array[Byte]](2)).get)
      .toMap
    // the perturbed copy is a byte-DIFFERENT file (md5 dedup can't
    // pair it) ...
    val bytes = (base.unionByName(pert)).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toSeq).toMap
    assert(bytes(3L) != bytes(1003L))
    // ... but the perceptual hash is EXACTLY preserved
    for (id <- Seq(3L, 10L, 17L, 24L))
      assert(h(id) == h(id + 1000L), s"hash drifted for id $id")
    // distinct ids: ~uniform 64-bit hashes, far beyond hamming 6
    for (a <- Seq(3L, 10L, 17L); b <- Seq(10L, 17L, 24L) if a < b)
      assert(java.lang.Long.bitCount(h(a) ^ h(b)) > 6)
    // non-image payloads produce no hash
    assert(Multimodal.dHash("not a png".getBytes).isEmpty)
    assert(Multimodal.dHash(null).isEmpty)
  }

  test("phashNearDup pairs exactly the planted perturbed copies") {
    val ids = (0L until 12L).toDF("id")
    val base = Multimodal.synthesizeCellImages(ids, "id")
    val planted = Multimodal.perturbImages(
      base.filter(col("media_id") % 4 === 0), shiftId = 100L)
    // a non-decodable row must be ignored, not crash the hash stage
    val junk = Seq((999L, "image", "junk-bytes".getBytes))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.phashNearDup(
        base.unionByName(planted).unionByName(junk))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 100L, 0L), (4L, 104L, 0L), (8L, 108L, 0L)))
  }

  test("real resize rewrites payload pixels: output re-decodes at box dims") {
    // ids 3 (32x32, fits 64x48 -> passthrough) and 10 (88x88 -> scaled)
    val imgs = Multimodal.synthesizeImages(
      Seq(3L, 10L).toDF("id"), "id")
    val out = Multimodal.decode(
        Multimodal.resize(Multimodal.decode(imgs), 64, 48))
      .select("media_id", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(3L) == ((32, 32)))          // fits: untouched
    assert(out(10L) == ((48, 48)))         // 88x88 * 48/88 -> floor 48
    // the scaled payload is genuinely re-encoded (byte-different,
    // decodes at the new size); the fitting one passes through
    val pay = Multimodal.resize(Multimodal.decode(imgs), 64, 48)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val orig = imgs.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(pay(3L).toSeq == orig(3L).toSeq)
    assert(pay(10L).toSeq != orig(10L).toSeq)
    assert(Multimodal.sniffImageMeta(pay(10L)).contains((48, 48, "png")))
  }

  test("real WAV decode: true duration from the header, NULL dims") {
    val wavs = Multimodal.synthesizeWavs(Seq(2L, 49L).toDF("id"), "id")
    val out = Multimodal.decode(wavs)
      .select("media_id", "meta.width", "meta.duration_ms", "meta.codec")
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.getLong(2), r.getString(3))).toMap
    assert(out(2L) == ((true, 300L, "wav")))    // (2%50+1)*100 ms
    assert(out(49L) == ((true, 5000L, "wav")))  // (49%50+1)*100 ms
    // non-WAV audio payloads take the stub fallback, not a crash
    assert(Multimodal.sniffWavMeta("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(Multimodal.sniffWavMeta("plain text".getBytes).isEmpty)
  }

  test("phashClusters: exact collapse + near pairing + transitive merge") {
    val ids = (0L until 6L).toDF("id")
    val base = Multimodal.synthesizeCellImages(ids, "id")
    // id 2: byte-identical copy (102) AND near-miss tweak (202) ->
    // one transitive 3-member cluster; id 4: perturbed same-hash copy
    val planted =
      base.filter(col("media_id") === 2)
        .withColumn("media_id", col("media_id") + 100L)
        .unionByName(Multimodal.tweakImages(
          base.filter(col("media_id") === 2), shiftId = 200L))
        .unionByName(Multimodal.perturbImages(
          base.filter(col("media_id") === 4), shiftId = 100L))
    val out = Multimodal.phashClusters(base.unionByName(planted))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      2L -> "000000000002", 102L -> "000000000002", 202L -> "000000000002",
      4L -> "000000000004", 104L -> "000000000004"))
    // the tweak really is a near-MISS, not an exact hash match
    val h = base.unionByName(planted).collect()
      .map(r => r.getLong(0) ->
        Multimodal.dHash(r.getAs[Array[Byte]](2)).get).toMap
    val d = java.lang.Long.bitCount(h(2L) ^ h(202L))
    assert(d >= 1 && d <= 2, s"tweak hamming $d")
    assert(h(2L) == h(102L))
  }

  test("real video near-dup: GIF frames decode, perturbed copies pair") {
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val base = Multimodal.synthesizeGifs(ids, "id", nFrames = 3)
    val planted = Multimodal.perturbGifs(
      base.filter(col("media_id") === 2), shiftId = 100L)
    // payloads are real multi-frame GIFs: 3 hashes per video
    val fh = Multimodal.videoFrameHashes(base.unionByName(planted))
    assert(fh.groupBy("media_id").count().collect()
      .forall(_.getLong(1) == 3L))
    // the perturbed copy is byte-different but pairs on ALL 3 frames
    val bytes = base.unionByName(planted).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toSeq).toMap
    assert(bytes(2L) != bytes(102L))
    val out = Multimodal.videoNearDup(base.unionByName(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 102L, 3L)))
    // junk payloads decode to no frames, not a crash
    assert(Multimodal.videoFrameHashes(
      Seq((9L, "video", "GIF8junk".getBytes))
        .toDF("media_id", "kind", "payload")).count() == 0L)
    // real container metadata: dims + duration = nFrames * delay
    val meta = Multimodal.decode(base)
      .select("media_id", "meta.width", "meta.height", "meta.duration_ms",
        "meta.codec").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4))).toMap
    assert(meta(3L) == ((72, 64, 3L * (3 % 20 + 1) * 50, "gif")))
  }

  test("real feature extraction: cell stats exact, float vectors ANN-ready") {
    val imgs = Multimodal.synthesizeImages(Seq(5L).toDF("id"), "id")
    // 5 -> 48x48; verify one cell/channel sum against driver arithmetic
    val stats = Multimodal.imageCellStats(imgs, grid = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(stats.size == 12) // 2x2 cells x 3 channels
    var (n, sum, sq) = (0L, 0L, 0L)
    for (y <- 0 until 24; x <- 0 until 24) { // cell (0,0)
      val v = (x * 31 + y * 7 + 5) & 0xFFFFFF
      val b = v & 0xFF // channel 2 = blue
      n += 1; sum += b; sq += b.toLong * b
    }
    assert(stats((0L, 0L, 2L)) == ((n, sum, sq)))
    // float features: grid^2*6 = 24 dims, means in [0,1]; a
    // non-decodable row falls back to an md5 stub padded to the SAME
    // 24 dims — a mixed table stays one fixed-dim ANN-ready column
    val mixed = imgs.unionByName(
      Seq((99L, "image", "not a png".getBytes))
        .toDF("media_id", "kind", "payload"))
    val f = Multimodal.featureExtract(mixed, grid = 2)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(5L).length == 24)
    assert(f(5L).zipWithIndex.filter(_._2 % 2 == 0) // means
      .forall { case (v, _) => v >= 0f && v <= 1f })
    assert(f(99L).length == 24)
    assert(f(99L).forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("feature extraction stub emits fixed-dim float arrays in [-1,1]") {
    val media = Multimodal.synthesize(
      Seq((1L, "abc")).toDF("id", "t"), "id", "t")
    val f = Multimodal.featureExtractStub(media, 8).select("features")
      .collect()(0).getSeq[Float](0)
    assert(f.length == 8)
    assert(f.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("k-means codebook: clustered data reaches 0.9 recall at nProbe=2") {
    val emb = TestMapping.clusteredEmbeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 20)
    val trained = Similarity.codebookKMeans(emb, 16, iters = 2)
    val rT = Similarity.ivfRecall(emb, trained, probes, k = 10, nProbe = 2)
      .collect()(0)
    assert(rT.getLong(1) == 200L)
    assert(rT.getBoolean(3), s"trained recall=${rT.getDouble(2)}")
    // the untrained sampled codebook on the SAME clustered data scans
    // the same 2/16 buckets but with arbitrary centroids — the trained
    // one must not be worse (it is strictly better unless the sample
    // happens to land one seed per cluster)
    val sampled = Similarity.codebook(emb, 16)
    val rS = Similarity.ivfRecall(emb, sampled, probes, k = 10, nProbe = 2)
      .collect()(0)
    assert(rT.getDouble(2) >= rS.getDouble(2),
      s"trained=${rT.getDouble(2)} sampled=${rS.getDouble(2)}")
  }

  test("IVF disk index: probes prune to their centroid partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    val cb = Similarity.codebook(emb, 2)
    val assigned = Similarity.ivfAssign(emb, cb)
    Similarity.writeIvfIndex(assigned, dir)
    Similarity.writeCodebook(cb, dir + "_codebook")
    val idx = Similarity.readIvfIndex(spark, dir)
    val cbDisk = Similarity.readCodebook(spark, dir + "_codebook")
    // partition layout on disk: one dir per centroid
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName)
    assert(dirs.length >= 1 && dirs.length <= 2)
    // a bucket-filtered scan shows the partition filter at the source
    val someCentroid = assigned.select("centroid_id").distinct()
      .collect()(0).getLong(0)
    val plan = idx.filter(col("centroid_id") === someCentroid)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"), plan.take(500))
    // and topK over the disk index matches topK over the in-memory one
    val probes = emb.filter(col("vec_id") === 0L)
    val fromDisk = Similarity.ivfTopK(idx, cbDisk, probes, k = 2,
      nProbe = 2).collect().map(_.getLong(2)).toSeq
    val fromMem = Similarity.ivfTopK(assigned, cb, probes, k = 2,
      nProbe = 2).collect().map(_.getLong(2)).toSeq
    assert(fromDisk == fromMem)
  }

  // 8 vectors in R⁴ → m=2 subspaces of 2 dims, ks=2 centroids each
  private def emb4 = Seq(
    (0L, Array(1.0f, 0.0f, 5.0f, 5.0f)),
    (1L, Array(0.9f, 0.1f, 5.1f, 4.9f)),
    (2L, Array(0.0f, 1.0f, -5.0f, -5.0f)),
    (3L, Array(0.1f, 0.9f, -4.9f, -5.1f)),
    (4L, Array(3.0f, 3.0f, 0.0f, 0.0f)),
    (5L, Array(-3.0f, -3.0f, 0.1f, -0.1f)),
    (6L, Array(1.0f, 0.1f, 4.8f, 5.2f)),
    (7L, Array(0.2f, 1.1f, -5.2f, -4.8f)))
    .toDF("vec_id", "embedding")

  test("PQ codes + ADC top-k match a driver-side re-derivation") {
    val pcb = Similarity.pqCodebook(emb4, m = 2, ks = 2, dim = 4)
    // cbs[j][c]: m × ks × dim/m doubles (nested collect yields mutable
    // ArraySeqs — normalize to immutable)
    val cbs: Seq[Seq[Seq[Double]]] =
      pcb.collect()(0)
        .getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.map(_.toSeq).toSeq).toSeq
    assert(cbs.length == 2 && cbs.forall(_.length == 2))
    def sq(a: Seq[Double], b: Seq[Double]): Long =
      a.lazyZip(b).map((x, y) =>
        math.floor((x - y) * (x - y) * 1e6 + 0.5).toLong).sum
    val vecs = emb4.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toMap
    def subv(v: Seq[Double], j: Int) = v.slice(j * 2, j * 2 + 2)
    def codeOf(v: Seq[Double]): Seq[Int] =
      (0 until 2).map { j =>
        // strict < keeps the LOWEST centroid id on ties, like the SQL
        // oracle's ORDER BY d, cid
        (0 until 2).minBy(c => (sq(subv(v, j), cbs(j)(c)), c))
      }
    val sparkCodes = Similarity.pqAssign(emb4, pcb, m = 2, ks = 2, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(sparkCodes == vecs.map { case (id, v) => id -> codeOf(v) })
    // ADC from probe 0: table lookups against the driver codes
    def adc(p: Seq[Double], id: Long): Long =
      (0 until 2).map(j => sq(subv(p, j), cbs(j)(sparkCodes(id)(j)))).sum
    val expect = vecs.keys.filter(_ != 0L).toSeq
      .sortBy(id => (adc(vecs(0L), id), id)).take(3)
    val got = Similarity.pqTopK(
      Similarity.pqAssign(emb4, pcb, m = 2, ks = 2, dim = 4), pcb,
      emb4.filter(col("vec_id") === 0L), k = 3, m = 2, ks = 2, dim = 4)
      .collect()
    assert(got.map(_.getLong(2)).toSeq == expect)
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // pinned fixed-point distances reproduce the driver arithmetic
    got.foreach { r =>
      val want = math.floor(adc(vecs(0L), r.getLong(2)).toDouble / 1e6 *
        1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == want)
    }
  }

  test("PQ assignment is partitioning-independent") {
    val pcb = Similarity.pqCodebook(emb4, m = 2, ks = 2, dim = 4)
    val one = Similarity.pqAssign(emb4.coalesce(1), pcb, m = 2, ks = 2,
      dim = 4).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val many = Similarity.pqAssign(emb4.repartition(7), pcb, m = 2, ks = 2,
      dim = 4).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(one == many)
  }

  test("exact-L2 top-k: planted duplicate ranks first at distance 0") {
    val withDup = emb4.unionAll(Seq((9L, Array(1.0f, 0.0f, 5.0f, 5.0f)))
      .toDF("vec_id", "embedding"))
    val out = Similarity.bruteForceTopKL2(withDup,
      withDup.filter(col("vec_id") === 9L), k = 2).collect()
    assert(out(0).getLong(2) == 0L && out(0).getDouble(3) == 0.0)
  }

  test("PQ drops malformed vectors instead of crashing the ADC lookup") {
    val dirty = emb4.unionAll(Seq(
      (10L, Array(1.0f, 2.0f)),                 // short vector
      (11L, null.asInstanceOf[Array[Float]]))   // null vector
      .toDF("vec_id", "embedding"))
    val pcb = Similarity.pqCodebook(dirty, m = 2, ks = 2, dim = 4)
    val codes = Similarity.pqAssign(dirty, pcb, m = 2, ks = 2, dim = 4)
    assert(codes.count() == 8) // the 8 well-formed rows survive
    val out = Similarity.pqTopK(codes, pcb,
      dirty.filter(col("vec_id") >= 9L), k = 3, m = 2, ks = 2, dim = 4)
    assert(out.count() == 0)   // malformed probes score nothing
  }

  test("k-means training survives empty cells (ANSI missing-key guard)") {
    // 8 rows, only TWO distinct vectors, ks=4: the md5 sample seeds
    // duplicate centroids, assignment ties break to the LOWEST c, so the
    // higher duplicate cells get ZERO members — under Spark 4 ANSI a
    // plain element_at on the rebuild maps' missing (j,c) keys throws
    // MAP_KEY_DOES_NOT_EXIST; the try_element_at + coalesce path must
    // keep the previous centroid instead
    val dup = Seq.tabulate(8) { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.0f, 5.0f, 5.0f))
      else (i.toLong, Array(0.0f, 1.0f, -5.0f, -5.0f))
    }.toDF("vec_id", "embedding")
    val pcb = Similarity.pqCodebookKMeans(dup, m = 2, ks = 4, dim = 4,
      iters = 2)
    val cbs = pcb.collect()(0)
      .getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](0)
    assert(cbs.length == 2 && cbs.forall(_.length == 4))
    assert(cbs.forall(_.forall(_.forall(x => !x.isNaN && !x.isInfinite))))
    // the trained codebook still codes the corpus (both distinct
    // vectors land on a centroid; no cell lookup throws)
    assert(Similarity.pqAssign(dup, pcb, m = 2, ks = 4, dim = 4)
      .count() == 8)
  }

  test("streamable IVF assignment: empty codebook assigns nothing, no throw") {
    val cbRow = Similarity.rollCodebook(
      Similarity.codebook(emb, 2).filter(lit(false)))
    assert(cbRow.count() == 1) // one row, empty cids/cvs
    assert(Similarity.ivfAssignStreamable(emb, cbRow).count() == 0)
  }

  test("trained PQ sub-codebooks: never lose to the sample, saturate clusters") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 20)
    val sampled = Similarity.pqRecall(emb,
      Similarity.pqCodebook(emb, m = 8, ks = 16, dim = 64),
      probes, k = 10, target = 0.05).collect()(0)
    val trained = Similarity.pqRecall(emb,
      Similarity.pqCodebookKMeans(emb, m = 8, ks = 16, dim = 64, iters = 2),
      probes, k = 10, target = 0.05).collect()(0)
    assert(trained.getDouble(2) >= sampled.getDouble(2),
      s"trained=${trained.getDouble(2)} sampled=${sampled.getDouble(2)}")
    assert(trained.getBoolean(3)) // the 0.05 absolute floor
    // on clustered data 2 Lloyd rounds saturate same-cluster precision
    val cl = TestMapping.clusteredEmbeddings(spark, "/root/testdata/sf0.001")
    val tccb = Similarity.pqCodebookKMeans(cl, m = 8, ks = 16, dim = 64,
      iters = 2)
    val top = Similarity.pqTopK(Similarity.pqAssign(cl, tccb), tccb,
      cl.filter(col("vec_id") < 20), k = 10)
    val same = top.filter(col("probe_id") % 16 === col("corpus_id") % 16)
      .count()
    assert(same >= 190L, s"same-cluster $same/200") // measured 200/200
  }

  test("IVFADC residual encoding beats or matches plain IVF-PQ precision") {
    val cl = TestMapping.clusteredEmbeddings(spark, "/root/testdata/sf0.001")
    val probes = cl.filter(col("vec_id") < 20)
    val cb = Similarity.codebookKMeans(cl, 16, iters = 2)
      .localCheckpoint(eager = true)
    def precision(top: org.apache.spark.sql.DataFrame): Double = {
      val rows = top.collect()
      rows.count(r => r.getLong(r.fieldIndex("probe_id")) % 16 ==
        r.getLong(r.fieldIndex("corpus_id")) % 16).toDouble / rows.length
    }
    val plainPcb = Similarity.pqCodebook(cl, m = 8, ks = 16, dim = 64)
      .localCheckpoint(eager = true)
    val plain = precision(Similarity.ivfPqTopK(
      Similarity.buildIvfPqIndex(cl, cb, plainPcb), cb, plainPcb,
      probes, k = 10, nProbe = 2))
    val resPcb = Similarity.pqResidualCodebook(cl, cb, m = 8, ks = 16,
      dim = 64, iters = 2)
    val res = precision(Similarity.ivfAdcTopK(
      Similarity.buildIvfAdcIndex(cl, cb, resPcb), cb, resPcb,
      probes, k = 10, nProbe = 2))
    assert(res >= plain, s"residual $res < plain $plain")
    assert(res >= 0.855, s"residual $res below the 0.855 certificate pin")
    // residual index carries the same (id -> bucket) assignment as the
    // plain index — only the code payload differs
    val ra = Similarity.buildIvfAdcIndex(cl, cb, resPcb)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pa = Similarity.buildIvfPqIndex(cl, cb, plainPcb)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ra == pa)
  }

  test("IVF-PQ: bucket-pruned ADC equals PQ over the pruned candidates") {
    val cl = TestMapping.clusteredEmbeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.codebookKMeans(cl, 16, iters = 2)
    val assigned = Similarity.ivfAssign(cl, cb)
    val pcb = Similarity.pqCodebook(cl, m = 8, ks = 16, dim = 64)
    val codes = Similarity.pqAssign(cl, pcb)
    val probes = cl.filter(col("vec_id") < 10)
    val out = Similarity.ivfPqTopK(
      Similarity.buildIvfPqIndex(cl, cb, pcb), cb, pcb, probes,
      k = 10, nProbe = 2)
    // composition semantics: for each probe, the IVF-PQ result is
    // exactly pqTopK over the codes restricted to its probed buckets
    val expect = {
      // per-probe pruned candidate set, scored by the plain PQ path
      val pb = Similarity.ivfTopK(assigned, cb, probes, k = 1000,
        nProbe = 2).select(col("probe_id"), col("corpus_id"))
      val pruned = Similarity.pqTopK(codes, pcb, probes, k = Int.MaxValue,
        m = 8, ks = 16, dim = 64)
        .join(pb, Seq("probe_id", "corpus_id"), "left_semi")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("adc_dist"), col("corpus_id"))
      pruned.withColumn("r", row_number().over(w)).filter(col("r") <= 10)
        .select("probe_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = out.select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // and the pruned search still lands in the probe's own cluster
    val same = out.filter(col("probe_id") % 16 === col("corpus_id") % 16)
      .count()
    assert(same >= (out.count() * 0.7).toLong,
      s"same-cluster $same/${out.count()}")
  }

  test("PQ recall certificate: clustered data beats the isotropic floor") {
    val cl = TestMapping.clusteredEmbeddings(spark, "/root/testdata/sf0.001")
    val pcb = Similarity.pqCodebook(cl, m = 8, ks = 16, dim = 64)
    // same-cluster precision of the ADC top-10 (cluster = vec_id % 16):
    // the structure PQ codes must preserve — within-cluster order is
    // 0.25-noise by construction
    val top = Similarity.pqTopK(Similarity.pqAssign(cl, pcb), pcb,
      cl.filter(col("vec_id") < 20), k = 10)
    val r = top.agg(count(lit(1)).as("n"),
      sum(when(col("probe_id") % 16 === col("corpus_id") % 16, 1)
        .otherwise(0)).as("same")).collect()(0)
    assert(r.getLong(0) == 200L)
    assert(r.getLong(1) >= 140L, s"same-cluster ${r.getLong(1)}/200")
  }
}
