package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata structs, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The IMAGE decode is REAL where the JDK can do it: [[decode]] sniffs
  * PNG/JPEG magic bytes and reads true dimensions through
  * `javax.imageio` (header-only — no pixel decode) inside
  * `mapPartitions`, the production codec boundary (one reader context
  * per task, payloads never leave the executor). Every other format is
  * STUBBED (no audio/video codec libraries in this container):
  * `decodeStub` derives deterministic fake metadata from the payload's
  * md5, and [[decode]] falls back to exactly those values when the
  * sniff fails, so the stub and real paths compose in one plan. Swap
  * the fallback for more codecs and the rest of the plan is unchanged.
  *
  * The full real-vs-stub inventory is a CONTRACT table —
  * "Codec boundary contract (multimodal)" in COVERAGE.md: five real
  * codec paths (PNG, JPEG, WAV, GIF, AVI-DIB), one real-but-spec-
  * pinned (AVI-MJPEG), and the permanent non-JDK stubs (MP4/WebM,
  * JPEG2000, compressed audio) that plug in at the [[decode]]
  * mapPartitions boundary without touching anything upstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true),
  ))

  /** Hex-nibble value (0-15) at 1-based position `pos` of an md5 hex
    * string — the deterministic entropy source for the stubs (portable:
    * the DuckDB oracle computes the identical strpos construction). */
  def nib(md5Hex: Column, pos: Int): Column =
    instr(lit("0123456789abcdef"), substring(md5Hex, pos, 1)) - 1

  /** Byte value (0-255) at 1-based byte index of an md5 hex string. */
  def md5Byte(md5Hex: Column, byteIdx: Int): Column =
    nib(md5Hex, 2 * byteIdx - 1) * 16 + nib(md5Hex, 2 * byteIdx)

  /** Synthesize a media table from any table with an id + a string
    * column: payload = utf8 bytes (a stand-in blob), kind round-robins.
    * Fixture generator for tests/benches only. */
  def synthesize(src: DataFrame, idCol: String, textCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** The stub's deterministic fake metadata columns (md5-derived) —
    * shared by [[decodeStub]] and [[decode]]'s fallback so the two
    * paths cannot drift. */
  private def stubMetaCols(h: Column): (Column, Column, Column, Column) = (
    ((md5Byte(h, 1) % 192 + 1) * 10).cast("int"),
    ((md5Byte(h, 2) % 108 + 1) * 10).cast("int"),
    when(col("kind") =!= "image",
      length(col("payload")).cast("long") * 100 + 1000)
      .otherwise(lit(null).cast("long")),
    element_at(array(lit("png"), lit("opus"), lit("h264")),
      (col("media_id") % 3 + 1).cast("int")))

  /** ===== DECODE STUB =====
    * Deterministic fake decode: metadata derived from md5(payload).
    * Contract: output schema is fixed; a real deployment swaps this
    * projection for a per-partition codec ([[decode]] does, for the
    * formats the JDK ships a codec for). */
  def decodeStub(media: DataFrame): DataFrame = {
    val (w, h2, dur, codec) = stubMetaCols(md5(col("payload")))
    media.withColumn("meta", struct(
      w.as("width"), h2.as("height"),
      dur.as("duration_ms"), codec.as("codec")))
  }

  /** Header-only image sniff+decode: PNG / JPEG magic bytes, then true
    * dimensions via the matching `javax.imageio` reader WITHOUT
    * decoding pixels (reader.getWidth reads the header). None for
    * non-image bytes, truncated headers, or codec errors — the caller
    * falls back to the stub. Executor-side only. */
  private[graft] def sniffImageMeta(payload: Array[Byte])
      : Option[(Int, Int, String)] = {
    if (payload == null || payload.length < 4) return None
    val isPng = (payload(0) & 0xFF) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G'
    val isJpeg = (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8 &&
      (payload(2) & 0xFF) == 0xFF
    if (!isPng && !isJpeg) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), if (isPng) "png" else "jpeg"))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Header-only WAV sniff+decode: RIFF/WAVE magic bytes, then true
    * duration via `javax.sound.sampled.AudioSystem.getAudioFileFormat`
    * (header-only — frame count × frame rate, no sample decode). None
    * for non-WAV bytes or unknown frame counts — the caller falls back
    * to the stub. Executor-side only. */
  private[graft] def sniffWavMeta(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 12) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
          payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E')) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val frames = aff.getFrameLength
      val rate = aff.getFormat.getFrameRate
      if (frames < 0 || rate <= 0f) None
      else Some(math.round(frames * 1000.0 / rate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** ===== REAL DECODE (formats the JDK ships a codec for) =====
    * PNG/JPEG image payloads get their TRUE width/height/codec read on
    * the executors, GIF video payloads their TRUE dims + duration
    * (Σ per-frame delays), and RIFF/WAVE audio payloads their TRUE duration
    * (`mapPartitions` — the codec boundary: payload bytes never
    * shuffle, never reach the driver; one codec context per task);
    * everything else falls back to the [[decodeStub]] metadata
    * column-for-column. Output schema identical to decodeStub; really-
    * decoded audio reports NULL width/height (an audio stream has
    * none — the stub's fake dims exist only to keep the fallback
    * deterministic). */
  def decode(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    // Row-preserving mapPartitions: every input column (and media_id's
    // original type) survives, exactly like decodeStub's withColumn
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val outSchema = media.schema
      .add("__w", IntegerType).add("__h", IntegerType)
      .add("__dur", LongType).add("__codec", StringType)
    val sniffed = media.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img = if (kind == "image") sniffImageMeta(payload) else None
        val aud = if (kind == "audio") sniffWavMeta(payload) else None
        val gif = if (kind == "video") sniffGifMeta(payload) else None
        val avi = if (kind == "video" && gif.isEmpty) sniffAviMeta(payload)
                  else None
        val vid = gif.orElse(avi)
        Row.fromSeq(r.toSeq ++ Seq(
          img.map(m => Int.box(m._1))
            .orElse(vid.map(m => Int.box(m._1))).orNull,
          img.map(m => Int.box(m._2))
            .orElse(vid.map(m => Int.box(m._2))).orNull,
          aud.map(Long.box).orElse(vid.map(m => Long.box(m._3))).orNull,
          img.map(_._3).orElse(aud.map(_ => "wav"))
            .orElse(gif.map(_ => "gif")).orElse(avi.map(_ => "avi"))
            .orNull))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
    val (sw, sh, sdur, scodec) = stubMetaCols(md5(col("payload")))
    sniffed.withColumn("meta", struct(
        when(col("__codec") === "wav", lit(null).cast("int"))
          .otherwise(coalesce(col("__w"), sw)).as("width"),
        when(col("__codec") === "wav", lit(null).cast("int"))
          .otherwise(coalesce(col("__h"), sh)).as("height"),
        coalesce(col("__dur"), sdur).as("duration_ms"),
        coalesce(col("__codec"), scodec).as("codec")))
      .drop("__w", "__h", "__dur", "__codec")
  }

  /** Real-WAV fixture generator: one PCM 16-bit mono 8 kHz WAV per
    * source id with id-derived frame count ((id%50+1)*800 frames =
    * (id%50+1)*100 ms) ENCODED AS REAL RIFF/WAVE BYTES on the
    * executors — the audio twin of [[synthesizeImages]]: the oracle
    * predicts the decoded duration arithmetically while [[decode]]
    * actually parses the header. Tests/benches only. */
  def synthesizeWavs(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    Widen.widened(src.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map { id =>
        val nFrames = ((id % 50) + 1).toInt * 800
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false)
        val pcm = new Array[Byte](nFrames * 2)
        var k = 0
        while (k < nFrames) { // deterministic non-constant samples
          val s = ((k * 2654435761L + id * 40503L) & 0xFFFF).toInt - 32768
          pcm(2 * k) = (s & 0xFF).toByte
          pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, "audio", bos.toByteArray)
      })
      .toDF("media_id", "kind", "payload")
  }

  /** Real-PNG fixture generator: one image row per source id with
    * id-derived dimensions ((id%19+1)*8 × (id%13+1)*8) ENCODED AS REAL
    * PNG BYTES on the executors — so a correctness oracle can predict
    * the decoded metadata arithmetically while [[decode]] actually
    * parses the bytes. Tests/benches only. */
  def synthesizeImages(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    Widen.widened(src.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map { id =>
        val w = ((id % 19) + 1).toInt * 8
        val h = ((id % 13) + 1).toInt * 8
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) { // deterministic non-constant pixels
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (x * 31 + y * 7 + id.toInt) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray)
      })
      .toDF("media_id", "kind", "payload")
  }

  // ===================================================== perceptual hash

  /** Number of grid columns/rows for [[dHash]]: 9 columns × 8 rows of
    * box-averaged luminance → 8 left-vs-right comparisons per row =
    * 64 bits. */
  private val DHashCols = 9
  private val DHashRows = 8

  /** REAL perceptual dHash of an image payload: full ImageIO pixel
    * decode, box-average the luminance ((r+g+b)/3) onto a 9×8 grid,
    * then one bit per horizontal neighbor pair — bit set iff
    * left cell is brighter than right. None for non-decodable
    * payloads. Executor-side only (called from `mapPartitions`).
    *
    * Robustness contract: a bit flips only if the two cells' mean
    * luminances cross, so any perturbation that shifts cell means by
    * less than half the cells' contrast (re-encode, mild noise,
    * brightness-preserving rescale) preserves the hash. */
  private[graft] def dHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 4) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    dHashOf(img)
  }

  /** [[dHash]] over an already-decoded frame (shared by the image path
    * and the per-frame video path). */
  private[graft] def dHashOf(img: java.awt.image.BufferedImage)
      : Option[Long] = {
    if (img == null || img.getWidth < DHashCols || img.getHeight < DHashRows)
      return None
    val (w, h) = (img.getWidth, img.getHeight)
    // box-averaged luminance per grid cell (exact integer box bounds)
    val cell = Array.ofDim[Double](DHashRows, DHashCols)
    var i = 0
    while (i < DHashRows) {
      val y0 = i * h / DHashRows; val y1 = (i + 1) * h / DHashRows
      var j = 0
      while (j < DHashCols) {
        val x0 = j * w / DHashCols; val x1 = (j + 1) * w / DHashCols
        var sum = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        cell(i)(j) = sum.toDouble / (3.0 * (y1 - y0) * (x1 - x0))
        j += 1
      }
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < DHashRows) {
      var j = 0
      while (j < DHashCols - 1) {
        bits <<= 1
        if (cell(i)(j) > cell(i)(j + 1)) bits |= 1L
        j += 1
      }
      i += 1
    }
    Some(bits)
  }

  /** Deterministic 64-bit mix (splitmix64 finalizer) — the entropy
    * source for the [[synthesizeCellImages]] fixtures. */
  private def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** dHash fixture generator: one 72×64 PNG per source id, built as a
    * 9×8 grid of 8×8-pixel flat gray cells whose levels are id-derived
    * pseudo-random 16-step values (16..226) with ADJACENT CELLS IN A
    * ROW FORCED ≥14 LEVELS APART — so every dHash bit has ≥14 levels
    * of contrast and survives the ±3 pixel noise of [[perturbImages]]
    * exactly (planted near-dups land at hamming distance 0, while
    * distinct ids get independent ~uniform 64-bit hashes). Tests and
    * benches only. */
  def synthesizeCellImages(src: DataFrame, idCol: String): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    Widen.widened(src.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map { id =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(cellImage(id), "png", bos)
        (id, "image", bos.toByteArray)
      })
      .toDF("media_id", "kind", "payload")
  }

  /** One 72×64 cell frame for `seed` — the [[synthesizeCellImages]]
    * pixel rule, shared with the GIF video fixtures. */
  private def cellImage(seed: Long): java.awt.image.BufferedImage = {
    val w = DHashCols * 8; val h = DHashRows * 8
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < DHashRows) {
      var prev = -1000
      var j = 0
      while (j < DHashCols) {
        var lvl = 16 + 14 *
          ((mix64(seed * 73L + i * DHashCols + j) & 0x7FFFFFFFL) % 16).toInt
        if (math.abs(lvl - prev) < 14)               // force row-adjacent
          lvl = if (lvl <= 128) lvl + 28 else lvl - 28 // contrast >=14
        prev = lvl
        val px = (lvl << 16) | (lvl << 8) | lvl
        var y = i * 8
        while (y < i * 8 + 8) {
          var x = j * 8
          while (x < j * 8 + 8) { img.setRGB(x, y, px); x += 1 }
          y += 1
        }
        j += 1
      }
      i += 1
    }
    img
  }

  /** Perturbed near-dup planting: decode each payload, add
    * deterministic per-pixel noise in [-3, 3], RE-ENCODE as fresh PNG
    * bytes, and shift the id — the output rows are byte-DIFFERENT
    * files of the same picture (md5-style exact dedup can never pair
    * them; a working perceptual hash must). Tests and benches only. */
  def perturbImages(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val noise = ((x * 31 + y * 17 + id * 7) % 7).toInt - 3
            def ch(v: Int) = math.min(255, math.max(0, v + noise))
            val rgb = img.getRGB(x, y)
            img.setRGB(x, y, (ch((rgb >> 16) & 0xFF) << 16) |
              (ch((rgb >> 8) & 0xFF) << 8) | ch(rgb & 0xFF))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id + shiftId, r.getString(kindIdx), bos.toByteArray)
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Near-miss planting: decode, SWAP the first two 8×8 cell blocks of
    * row 0, re-encode — flips dHash bit 0 deterministically (adjacent
    * cells are distinct by fixture construction) and possibly bit 1,
    * nothing else: the copy lands at hamming 1–2 from its base, the
    * band-join near-dup regime (unlike [[perturbImages]], whose copies
    * keep the EXACT hash and collapse before pairing). Tests and
    * benches only. */
  def tweakImages(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val a = img.getRGB(x, y); val b = img.getRGB(x + 8, y)
            img.setRGB(x, y, b); img.setRGB(x + 8, y, a)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (r.getLong(idIdx) + shiftId, r.getString(kindIdx), bos.toByteArray)
      }
      .toDF("media_id", "kind", "payload")
  }

  /** REAL image near-duplicate detection: per-payload perceptual
    * [[dHash]] (computed in `mapPartitions` — payload bytes never
    * shuffle), then hamming-banded pairing: the 64-bit hash splits
    * into 8 bytes, candidate pairs EQUI-JOIN on any shared (band,
    * byte) key, and survivors verify `bit_count(xor) <= maxHamming`.
    * Any pair within hamming 6 differs in at most 6 of the 8 bands,
    * so at least 2 bands match exactly — banding loses no recall at
    * this threshold while keeping a 100 TB image table at one
    * band-key shuffle, never an all-pairs join (the
    * [[graft.ext.Dedup.minhashCandidates]] economics with hash bytes
    * as the bands). Non-decodable payloads produce no hash and never
    * pair. */
  def phashNearDup(media: DataFrame, maxHamming: Int = 6): DataFrame =
    bandPairs(dHashes(media), maxHamming)

  /** (media_id, dhash) for every decodable payload — hashing runs in
    * `mapPartitions` (payload bytes never shuffle; only the 8-byte
    * hash + id move after this). */
  private def dHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions(_.flatMap { r =>
        dHash(r.getAs[Array[Byte]](payloadIdx))
          .map(h => (r.getLong(idIdx), h))
      })
      .toDF("media_id", "dhash")
  }

  /** The persistable perceptual-hash index frame: (media_id, dhash)
    * for every decodable payload. dHash is a PURE per-image function,
    * so the index is append-only — a processed batch's rows are
    * exactly what the next [[phashIncremental]] call's standing side
    * unions in (the [[graft.ext.Dedup.lshBands]] purity argument on
    * the multimodal leg). */
  def hashIndex(media: DataFrame): DataFrame = dHashes(media)

  /** Incremental perceptual near-dup probe — the d12 maintenance
    * shape on the multimodal leg, completing the incremental story
    * across every index family (text d12, lexical e13/r6, graph-ANN
    * s9, CC a6_inc): a NEW image batch is near-dup-checked against a
    * STANDING corpus via its persisted [[hashIndex]] frame, without
    * re-pairing (or re-DECODING) the standing corpus — only the
    * batch's payloads decode, the standing side contributes 16 bytes
    * + id per image. Candidates are the same hamming-banded
    * (band, byte) equi-joins as [[phashNearDup]]: standing⋈batch
    * plus batch⋈batch, never standing⋈standing. Equivalence
    * contract (the m8 gate oracle): the result equals the
    * full-corpus [[phashNearDup]] rebuild restricted to pairs
    * touching the batch. */
  def phashIncremental(standingHashes: DataFrame, batch: DataFrame,
                       maxHamming: Int = 2): DataFrame = {
    val bh = dHashes(batch).localCheckpoint(true)
    val sb = withBandKeys(standingHashes.select("media_id", "dhash"))
    val bb = withBandKeys(bh.select("media_id", "dhash"))
    val cross = sb.as("a").join(bb.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.media_id") =!= col("b.media_id"))
      .select(least(col("a.media_id"), col("b.media_id")).as("media_a"),
        greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
        expr("bit_count(a.dhash ^ b.dhash)").cast("long").as("hamming"))
    val intra = bb.as("a").join(bb.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        expr("bit_count(a.dhash ^ b.dhash)").cast("long").as("hamming"))
    cross.unionByName(intra).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming-banded pairing over a (media_id, dhash) frame — see
    * [[phashNearDup]] for the economics. */
  /** Adds the 8 exploded hamming-band keys (one per hash byte, tagged
    * with the byte index) to a frame carrying a `dhash` column —
    * shared by [[bandPairs]] and [[videoNearDup]]. */
  private def withBandKeys(hashes: DataFrame): DataFrame =
    hashes.withColumn("band_key",
      explode(array((0 until 8).map(b =>
        shiftright(col("dhash"), b * 8).bitwiseAND(lit(255L))
          .bitwiseOR(lit(b.toLong << 8))): _*)))

  private def bandPairs(hashesIn: DataFrame, maxHamming: Int): DataFrame = {
    // the self-join consumes the hash frame TWICE: materialize it once
    // (16 bytes + id per image) so a 100 TB corpus decodes once, not
    // twice — the decode dominates everything downstream
    val hashes = hashesIn.localCheckpoint(true)
    val banded = withBandKeys(hashes.select("media_id", "dhash"))
    banded.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        expr("bit_count(a.dhash ^ b.dhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Perceptual near-dup CLUSTER RESOLUTION — the d7-style removal
    * shape for images, built to survive the 100 TB degenerate case:
    * a viral image with millions of byte-identical (or re-encoded-
    * identical-hash) copies would make pairwise output quadratic in
    * the cluster size, so identical hashes COLLAPSE to their min-id
    * representative FIRST (one groupBy — cluster membership becomes
    * linear rep→member edges), only representatives enter the banded
    * near-pairing, and [[graft.core.GraphOps.connectedComponents]]
    * resolves transitive near-dup chains into cluster labels. Output:
    * (media_id, cluster) for every media in a cluster of ≥2, cluster
    * = zero-padded min media id (deterministic, engine-independent).
    * Singletons are implicitly kept (not listed). */
  def phashClusters(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    val spark = media.sparkSession
    val hashes = dHashes(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val key = (c: Column) => lpad(c.cast("string"), 12, "0")
      val rep = hashes.groupBy("dhash")
        .agg(min(col("media_id")).as("rep"))
      val exactEdges = hashes.join(rep, "dhash")
        .filter(col("media_id") =!= col("rep"))
        .select(key(col("rep")).as("src"), key(col("media_id")).as("dst"))
      val nearEdges = bandPairs(
          rep.select(col("rep").as("media_id"), col("dhash")), maxHamming)
        .select(key(col("media_a")).as("src"), key(col("media_b")).as("dst"))
      graft.core.GraphOps.connectedComponents(
          exactEdges.unionByName(nearEdges))
        .select(col("id").cast("long").as("media_id"),
          col("comp").as("cluster"))
    } finally hashes.unpersist(blocking = false)
  }

  // ============================================== real multi-frame video

  // ---- RIFF/AVI container (pure-Java writer + parser; r11 verdict
  // task #6: a SECOND real video container beside animated GIF).
  // Two REAL codec forms: uncompressed bottom-up BGR24 DIB frames in
  // '00db' chunks (the canonical raw-video AVI — pixel-exact
  // round-trip, so the m7 frame-hash arithmetic holds bit-for-bit)
  // and MJPEG in '00dc' chunks (each frame a real JPEG via ImageIO —
  // lossy, spec-pinned rather than oracle-pinned because JPEG error
  // can flip dHash bits at gradient ties). MP4/WebM remain the
  // documented non-JDK boundary (COVERAGE.md stub inventory).

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def rd32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One frame's chunk payload under the chosen codec. */
  private def aviFrameBytes(img: java.awt.image.BufferedImage,
                            mjpeg: Boolean): Array[Byte] =
    if (mjpeg) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    } else {
      // bottom-up BGR24 rows, each padded to a 4-byte boundary — the
      // standard uncompressed DIB frame layout
      val w = img.getWidth; val h = img.getHeight
      val stride = (w * 3 + 3) & ~3
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(row + x * 3) = (rgb & 0xff).toByte
          out(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          out(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

  /** Write a REAL AVI file: RIFF('AVI ') with hdrl (avih + one video
    * strl), a movi list of per-frame chunks, and an idx1 index —
    * parseable by any standard AVI reader. `usPerFrame` lands in both
    * avih and the stream header's rate/scale, so the container carries
    * true timing metadata ([[sniffAviMeta]] reads duration back as
    * µsPerFrame · totalFrames). */
  private[graft] def encodeAvi(frames: Seq[java.awt.image.BufferedImage],
                               usPerFrame: Int,
                               mjpeg: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty)
    val w = frames.head.getWidth; val h = frames.head.getHeight
    val datas = frames.map(aviFrameBytes(_, mjpeg))
    val ckId = if (mjpeg) "00dc" else "00db"
    val handler = if (mjpeg) "MJPG" else "DIB "
    val compression = if (mjpeg) {
      val f = fourcc("MJPG"); rd32(f, 0)
    } else 0
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      fourcc(id) ++ le32(body.length) ++ body ++
        (if (pad == 1) Array(0.toByte) else Array.empty[Byte])
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(typ) ++ body
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10 /*HASINDEX*/) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(usPerFrame) /*scale*/ ++ le32(1000000) /*rate*/ ++
        le32(0) ++ le32(frames.length) ++ le32(datas.map(_.length).max) ++
        le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        le32(compression) ++ le32(datas.head.length) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviBody = datas.flatMap(d => chunk(ckId, d)).toArray
    val movi = list("movi", moviBody)
    // idx1: one entry per frame chunk, offsets relative to 'movi'+4
    var off = 4
    val idxBody = datas.flatMap { d =>
      val e = fourcc(ckId) ++ le32(0x10 /*KEYFRAME*/) ++ le32(off) ++
        le32(d.length)
      off += 8 + d.length + (d.length & 1)
      e
    }.toArray
    val idx1 = chunk("idx1", idxBody)
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  private def isAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      cc(payload, 0) == "RIFF" && cc(payload, 8) == "AVI "

  /** Walk the RIFF tree calling `f(chunkId, listType, start, size)`
    * for every leaf chunk (listType = enclosing list's type). */
  private def walkRiff(b: Array[Byte], from: Int, to: Int, inList: String)
                      (f: (String, String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val id = cc(b, o)
      val sz = rd32(b, o + 4)
      if (sz < 0 || o + 8 + sz > to) return // truncated/corrupt: stop
      if (id == "LIST" && sz >= 4)
        walkRiff(b, o + 12, o + 8 + sz, cc(b, o + 8))(f)
      else f(id, inList, o + 8, sz)
      o += 8 + sz + (sz & 1)
    }
  }

  /** Header-only AVI sniff: (width, height, duration_ms) from avih —
    * duration = dwMicroSecPerFrame · dwTotalFrames, no frame decode.
    * None for non-AVI bytes. */
  private[graft] def sniffAviMeta(payload: Array[Byte])
      : Option[(Int, Int, Long)] = {
    if (!isAvi(payload)) return None
    var res: Option[(Int, Int, Long)] = None
    walkRiff(payload, 12, math.min(payload.length, 12 + rd32(payload, 4)),
        "AVI ") { (id, _, o, sz) =>
      if (id == "avih" && sz >= 40 && res.isEmpty) {
        val usf = rd32(payload, o).toLong
        val total = rd32(payload, o + 16).toLong
        res = Some((rd32(payload, o + 32), rd32(payload, o + 36),
          usf * total / 1000L))
      }
    }
    res
  }

  /** Decode an AVI payload's frames: '00db' raw DIB chunks decode with
    * the manual bottom-up BGR walk, '00dc' MJPEG chunks through
    * ImageIO's JPEG reader. Nil for non-AVI bytes. */
  private[graft] def decodeAvi(payload: Array[Byte])
      : Seq[java.awt.image.BufferedImage] = {
    if (!isAvi(payload)) return Nil
    var dims: Option[(Int, Int)] = None
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[java.awt.image.BufferedImage]
    try {
      walkRiff(payload, 12,
          math.min(payload.length, 12 + rd32(payload, 4)), "AVI ") {
        (id, inList, o, sz) =>
        if (id == "avih" && sz >= 40 && dims.isEmpty)
          dims = Some((rd32(payload, o + 32), rd32(payload, o + 36)))
        else if (inList == "movi" && id.endsWith("db")) dims.foreach {
          case (w, h) =>
            val stride = (w * 3 + 3) & ~3
            if (sz >= stride * h) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                val row = o + (h - 1 - y) * stride
                var x = 0
                while (x < w) {
                  val bb = payload(row + x * 3) & 0xff
                  val g = payload(row + x * 3 + 1) & 0xff
                  val r = payload(row + x * 3 + 2) & 0xff
                  img.setRGB(x, y, (r << 16) | (g << 8) | bb)
                  x += 1
                }
                y += 1
              }
              frames += img
            }
        }
        else if (inList == "movi" && id.endsWith("dc")) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, o, sz))
          if (img != null) frames += img
        }
      }
      frames.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Real-VIDEO fixture generator, AVI form: one uncompressed-DIB AVI
    * per source id with the SAME frame rule as [[synthesizeGifs]]
    * (frame f's pixel seed = id·nFrames+f) and the same id-derived
    * timing ((id%20+1)·50 ms per frame, carried as avih
    * dwMicroSecPerFrame), so the two containers share one oracle
    * arithmetic. Tests/benches only. */
  def synthesizeAvis(src: DataFrame, idCol: String,
                     nFrames: Int = 4): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    Widen.widened(src.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map { id =>
        (id, "video",
          encodeAvi((0 until nFrames).map(f => cellImage(id * nFrames + f)),
            usPerFrame = ((id % 20) + 1).toInt * 50000))
      })
      .toDF("media_id", "kind", "payload")
  }

  /** Noise-perturbed re-encoded AVI copies — [[perturbGifs]]'s twin on
    * the RIFF container: ±3 deterministic pixel noise per frame, DIB
    * re-encode, so the copies are byte-different files whose per-frame
    * dHashes are exactly preserved (uniform-cell gradients swallow the
    * noise; the uncompressed codec adds none). Tests/benches only. */
  def perturbAvis(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val id = r.getLong(idIdx)
        val frames = decodeAvi(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val noise = ((x * 31 + y * 17 + id * 7) % 7).toInt - 3
              def ch(v: Int) = math.min(255, math.max(0, v + noise))
              val rgb = img.getRGB(x, y)
              img.setRGB(x, y, (ch((rgb >> 16) & 0xFF) << 16) |
                (ch((rgb >> 8) & 0xFF) << 8) | ch(rgb & 0xFF))
              x += 1
            }
            y += 1
          }
          img
        }
        (id + shiftId, r.getString(kindIdx),
          encodeAvi(frames, usPerFrame = 40000))
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Near-miss AVI planting — [[tweakGifs]]'s twin: every frame's
    * first two 8×8 row-0 cells swap before the DIB re-encode, landing
    * each frame at hamming 1–2 from its base. Tests/benches only. */
  def tweakAvis(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val frames = decodeAvi(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val a = img.getRGB(x, y); val b = img.getRGB(x + 8, y)
              img.setRGB(x, y, b); img.setRGB(x + 8, y, a)
              x += 1
            }
            y += 1
          }
          img
        }
        (r.getLong(idIdx) + shiftId, r.getString(kindIdx),
          encodeAvi(frames, usPerFrame = 40000))
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Encode frames as one animated-GIF payload (the JDK's only
    * multi-frame container — real bytes, real frames; our ≤16-gray-
    * level fixtures fit the 256-color palette losslessly). `delayCs`
    * > 0 writes a real per-frame GraphicControlExtension delay
    * (centiseconds), making the container carry true timing metadata
    * ([[sniffGifMeta]] reads it back as the video duration). */
  private def encodeGif(frames: Seq[java.awt.image.BufferedImage],
                        delayCs: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { f =>
        val meta = if (delayCs <= 0) null else {
          val spec = javax.imageio.ImageTypeSpecifier
            .createFromBufferedImageType(
              java.awt.image.BufferedImage.TYPE_INT_RGB)
          val m = w.getDefaultImageMetadata(spec, null)
          val fmt = m.getNativeMetadataFormatName
          val root = m.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = (0 until root.getLength)
            .map(root.item(_))
            .collectFirst { case n: javax.imageio.metadata.IIOMetadataNode
                if n.getNodeName == "GraphicControlExtension" => n }
            .getOrElse {
              val n = new javax.imageio.metadata.IIOMetadataNode(
                "GraphicControlExtension")
              root.appendChild(n); n
            }
          gce.setAttribute("disposalMethod", "none")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("transparentColorIndex", "0")
          gce.setAttribute("delayTime", delayCs.toString)
          m.setFromTree(fmt, root)
          m
        }
        w.writeToSequence(new javax.imageio.IIOImage(f, null, meta), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Header-ish GIF sniff+decode: magic bytes, then frame count, first-
    * frame dims, and TRUE duration = Σ per-frame GraphicControl delays
    * (centiseconds → ms) via the gif reader's metadata — no pixel
    * decode. None for non-GIF bytes. Executor-side only. */
  private[graft] def sniffGifMeta(payload: Array[Byte])
      : Option[(Int, Int, Long)] = {
    if (payload == null || payload.length < 6 || payload(0) != 'G' ||
        payload(1) != 'I' || payload(2) != 'F') return None
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      r.setInput(iis)
      val n = r.getNumImages(true)
      if (n <= 0) None
      else {
        var durCs = 0L
        var i = 0
        while (i < n) {
          val m = r.getImageMetadata(i)
          val root = m.getAsTree(m.getNativeMetadataFormatName)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          var j = 0
          while (j < root.getLength) {
            val node = root.item(j)
            if (node.getNodeName == "GraphicControlExtension")
              durCs += node.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                .getAttribute("delayTime").toLong
            j += 1
          }
          i += 1
        }
        Some((r.getWidth(0), r.getHeight(0), durCs * 10L))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally { r.dispose(); iis.close() }
  }

  /** Container dispatch: frames of ANY decodable multi-frame payload
    * (animated GIF or RIFF/AVI) — the one entry the frame-signature
    * pipeline uses, so GIF and AVI corpora (or a mix) flow through the
    * same near-dup plans. */
  private[graft] def decodeVideoFrames(payload: Array[Byte])
      : Seq[java.awt.image.BufferedImage] =
    if (isAvi(payload)) decodeAvi(payload) else decodeGif(payload)

  /** Decode a GIF payload into its frames; Nil for non-GIF bytes. */
  private def decodeGif(payload: Array[Byte])
      : Seq[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 6 || payload(0) != 'G' ||
        payload(1) != 'I' || payload(2) != 'F') return Nil
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      r.setInput(iis)
      (0 until r.getNumImages(true)).map(r.read(_))
    } catch { case scala.util.control.NonFatal(_) => Nil }
    finally { r.dispose(); iis.close() }
  }

  /** Real-VIDEO fixture generator: one animated GIF per source id,
    * `nFrames` cell-image frames (frame f's pixel seed = id·nFrames+f)
    * with an id-derived REAL per-frame delay ((id%20+1)·5 cs), so the
    * oracle predicts the decoded duration arithmetically:
    * nFrames·(id%20+1)·50 ms. Tests/benches only. */
  def synthesizeGifs(src: DataFrame, idCol: String,
                     nFrames: Int = 4): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    Widen.widened(src.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(_.map { id =>
        (id, "video",
          encodeGif((0 until nFrames).map(f => cellImage(id * nFrames + f)),
            delayCs = ((id % 20) + 1).toInt * 5))
      })
      .toDF("media_id", "kind", "payload")
  }

  /** Noise-perturbed re-encoded GIF copies (the video twin of
    * [[perturbImages]]): every frame gets ±3 deterministic pixel
    * noise, the container is re-encoded — byte-different files whose
    * per-frame dHashes are exactly preserved. Tests/benches only. */
  def perturbGifs(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val id = r.getLong(idIdx)
        val frames = decodeGif(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val noise = ((x * 31 + y * 17 + id * 7) % 7).toInt - 3
              def ch(v: Int) = math.min(255, math.max(0, v + noise))
              val rgb = img.getRGB(x, y)
              img.setRGB(x, y, (ch((rgb >> 16) & 0xFF) << 16) |
                (ch((rgb >> 8) & 0xFF) << 8) | ch(rgb & 0xFF))
              x += 1
            }
            y += 1
          }
          img
        }
        (id + shiftId, r.getString(kindIdx), encodeGif(frames))
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Near-miss GIF planting (the video twin of [[tweakImages]]): EVERY
    * frame gets its first two 8×8 row-0 cells swapped before the
    * container re-encodes — each frame's dHash lands at hamming 1–2
    * from its base frame, the band-join near-pairing regime (unlike
    * [[perturbGifs]], whose frames keep the EXACT hash). Tests and
    * benches only. */
  def tweakGifs(media: DataFrame, shiftId: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.map { r =>
        val frames = decodeGif(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val a = img.getRGB(x, y); val b = img.getRGB(x + 8, y)
              img.setRGB(x, y, b); img.setRGB(x + 8, y, a)
              x += 1
            }
            y += 1
          }
          img
        }
        (r.getLong(idIdx) + shiftId, r.getString(kindIdx), encodeGif(frames))
      }
      .toDF("media_id", "kind", "payload")
  }

  /** (media_id, frame_idx, dhash) for every frame of every decodable
    * multi-frame payload — the REAL form of the frame-signature table:
    * container parse + per-frame perceptual hash, all inside
    * `mapPartitions` (payloads never shuffle; only 16 bytes/frame move
    * on). */
  def videoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions(_.flatMap { r =>
        val id = r.getLong(idIdx)
        decodeVideoFrames(r.getAs[Array[Byte]](payloadIdx))
          .iterator.zipWithIndex
          .flatMap { case (img, f) =>
            dHashOf(img).map(h => (id, f.toLong, h)) }
      })
      .toDF("media_id", "frame_idx", "dhash")
  }

  /** REAL video near-duplicate detection: videos pair when ≥
    * `minShared` of their frames agree on the PERCEPTUAL frame hash
    * within hamming ≤ `maxHamming` — one frame-hash shuffle, never an
    * all-pairs video join, with the true per-frame [[dHash]] as the
    * signature. Frame agreement uses the SAME hamming-banded pairing
    * economics as [[phashNearDup]] (candidates equi-join on any shared
    * hash-byte band, survivors verify `bit_count(xor)`), so a
    * re-encode that flips a bit or two on a frame still pairs —
    * exact-equality matching would silently miss it. The count is over
    * DISTINCT matched (frame-hash-of-a, frame-hash-of-b) pairs. */
  def videoNearDup(media: DataFrame, minShared: Long = 2L,
                   maxHamming: Int = 2): DataFrame = {
    // the self-join consumes the signature frame twice — materialize
    // so every container parses once (dHash economics, see bandPairs)
    val sig = videoFrameHashes(media)
      .select(col("media_id"), col("dhash")).distinct()
      .localCheckpoint(true)
    val banded = withBandKeys(sig)
    banded.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.media_id") < col("b.media_id"))
      .filter(expr("bit_count(a.dhash ^ b.dhash)") <= maxHamming)
      .select(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        col("a.dhash").as("__ha"), col("b.dhash").as("__hb"))
      .distinct() // a pair found via several bands counts once
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("n_shared_frames"))
      .filter(col("n_shared_frames") >= minShared)
  }

  /** Resize stage (stub): recompute metadata for a target box keeping
    * aspect; payload passes through (the REAL [[resize]] rewrites the
    * payload pixels and falls back to exactly this arithmetic for
    * non-decodable rows). */
  def resizeStub(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    decoded.withColumn("meta", struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.codec").as("codec")))
  }

  /** ===== REAL RESIZE (image formats the JDK ships) =====
    * Decodable payloads are PIXEL-RESCALED into the `maxW`×`maxH` box
    * (aspect kept, never upscaled: target dims are
    * floor(dim · min(maxW/w, maxH/h, 1)) — the same arithmetic as
    * [[resizeStub]]) and RE-ENCODED as PNG bytes inside
    * `mapPartitions` (the codec boundary: payloads never shuffle,
    * never reach the driver). An already-fitting image passes its
    * payload through untouched. Non-decodable rows keep their payload
    * and get [[resizeStub]]'s metadata arithmetic — one entry point,
    * both regimes, identical output schema. */
  def resize(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    import org.apache.spark.sql.Row
    val payloadIdx = decoded.schema.fieldIndex("payload")
    val outSchema = decoded.schema
      .add("__rw", IntegerType).add("__rh", IntegerType)
      .add("__rpayload", BinaryType)
    val resized = decoded.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // (real dims, rewritten payload): a fitting image keeps its
        // original payload (and codec) but still reports REAL dims
        val real: Option[(Int, Int, Array[Byte])] =
          try {
            val img = if (payload == null) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val scale = math.min(
                math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
              if (scale >= 1.0) Some((w, h, null)) // fits: passthrough
              else {
                val nw = math.max(1, math.floor(w * scale).toInt)
                val nh = math.max(1, math.floor(h * scale).toInt)
                val out = new java.awt.image.BufferedImage(nw, nh,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, nw, nh, null)
                } finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                Some((nw, nh, bos.toByteArray))
              }
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        Row.fromSeq(r.toSeq ++ Seq(
          real.map(m => Int.box(m._1)).orNull,
          real.map(m => Int.box(m._2)).orNull,
          real.map(_._3).orNull))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
    // stub fallback arithmetic on the pre-resize metadata
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    resized
      .withColumn("payload", coalesce(col("__rpayload"), col("payload")))
      .withColumn("meta", struct(
        coalesce(col("__rw"), floor(w * scale).cast("int")).as("width"),
        coalesce(col("__rh"), floor(h * scale).cast("int")).as("height"),
        col("meta.duration_ms").as("duration_ms"),
        when(col("__rpayload").isNotNull, lit("png"))
          .otherwise(col("meta.codec")).as("codec")))
      .drop("__rw", "__rh", "__rpayload")
  }

  /** Frame sampling: one output row per sampled frame timestamp for
    * video/audio rows (every `everyMs` ms) — the explode pattern that
    * turns a 100 TB video table into a frames table without ever
    * collecting a payload to the driver. */
  def frameSample(decoded: DataFrame, everyMs: Long = 60000L): DataFrame =
    decoded.filter(col("kind").isin("video", "audio"))
      .select(col("media_id"), col("kind"),
        explode(sequence(lit(0L),
          greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ts_ms"))

  /** ===== REAL FEATURE EXTRACTION (image formats the JDK ships) =====
    * Per-channel grid-cell pixel statistics: each decodable payload is
    * fully pixel-decoded in `mapPartitions` and reduced to EXACT
    * integer sums per (grid cell, RGB channel) — count, Σvalue,
    * Σvalue² — from which mean/variance derive exactly (no float
    * accumulation anywhere, so the result is partitioning- and
    * engine-independent and can be hash-pinned against an arithmetic
    * oracle). One output row per (media, cell_i, cell_j, channel);
    * non-decodable payloads emit nothing (callers wanting a fallback
    * compose with [[featureExtractStub]]). Cell bounds use the
    * floor-scaled rule (cell_i = y·grid / h), exact for any dims. */
  def imageCellStats(media: DataFrame, grid: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          try { if (payload == null) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)) }
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val n = Array.ofDim[Long](grid, grid)
          val sum = Array.ofDim[Long](grid, grid, 3)
          val sq = Array.ofDim[Long](grid, grid, 3)
          var y = 0
          while (y < h) {
            val ci = y * grid / h
            var x = 0
            while (x < w) {
              val cj = x * grid / w
              val rgb = img.getRGB(x, y)
              n(ci)(cj) += 1L
              var c = 0
              while (c < 3) {
                val v = ((rgb >> (16 - 8 * c)) & 0xFF).toLong
                sum(ci)(cj)(c) += v
                sq(ci)(cj)(c) += v * v
                c += 1
              }
              x += 1
            }
            y += 1
          }
          for (ci <- (0 until grid).iterator; cj <- 0 until grid;
               c <- 0 until 3)
            yield (id, ci.toLong, cj.toLong, c.toLong,
              n(ci)(cj), sum(ci)(cj)(c), sq(ci)(cj)(c))
        }
      }
    }.toDF("media_id", "cell_i", "cell_j", "channel",
      "n", "psum", "psum_sq")
  }

  /** Float feature vectors from [[imageCellStats]]: per (cell,
    * channel) the [0,1]-scaled mean and variance, laid out
    * ((cell_i·grid + cell_j)·3 + channel)·2 + {0: mean, 1: var} —
    * grid²·6 dims (24 at the default grid=2), ANN-ready (the
    * [[graft.ext.Similarity]] ops take any fixed-dim array<float>).
    * Rows for non-decodable payloads fall back to the md5 stub
    * embedding, so one entry point serves a mixed 100 TB table. */
  def featureExtract(media: DataFrame, grid: Int = 2): DataFrame = {
    val stats = imageCellStats(media, grid)
      .withColumn("__mean", col("psum").cast("double") / col("n") / 255.0)
      .withColumn("__var",
        (col("psum_sq").cast("double") / col("n") -
          (col("psum").cast("double") / col("n")) *
          (col("psum").cast("double") / col("n"))) / (255.0 * 255.0))
      .withColumn("__dim",
        ((col("cell_i") * grid + col("cell_j")) * 3 + col("channel")) * 2)
      .select(col("media_id"),
        explode(array(
          struct(col("__dim").as("d"), col("__mean").as("v")),
          struct((col("__dim") + 1).as("d"), col("__var").as("v"))))
          .as("dv"))
      .groupBy("media_id")
      .agg(array_sort(collect_list(struct(col("dv.d"), col("dv.v"))))
        .as("__sorted"))
      .select(col("media_id"),
        transform(col("__sorted"), e => e("v").cast("float"))
          .as("features"))
    // the stub fallback must honor the SAME grid²·6 dimensionality as
    // the real vectors — the Similarity/ANN ops assume one fixed dim
    // per table, and a mixed 8/24-dim column breaks every distance
    // computation downstream. md5 yields 16 bytes; dims past 16 draw
    // from md5(md5hex) (deterministic second digest).
    val dims = grid * grid * 6
    val h = md5(col("payload"))
    val h2 = md5(h)
    val stubArr = array((0 until dims).map { i =>
      val b = if (i < 16) md5Byte(h, i + 1)
              else md5Byte(h2, (i - 16) % 16 + 1)
      (b.cast("double") / 127.5 - 1.0).cast("float")
    }: _*)
    media.join(stats, Seq("media_id"), "left")
      .withColumn("features", coalesce(col("features"), stubArr))
  }

  /** Feature extraction (stub): fixed-dim deterministic pseudo-embedding
    * from md5(payload) bytes, scaled to [-1, 1]. dim ≤ 16. The
    * array<float> one-row-in/one-row-out shape is what a real encoder
    * batch produces. */
  def featureExtractStub(media: DataFrame, dim: Int = 8): DataFrame = {
    require(dim <= 16, "md5 provides 16 bytes")
    val h = md5(col("payload"))
    media.withColumn("features",
      array((1 to dim).map(i =>
        (md5Byte(h, i).cast("double") / 127.5 - 1.0).cast("float")): _*))
  }
}
