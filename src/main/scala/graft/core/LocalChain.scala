package graft.core

import org.apache.spark.unsafe.types.UTF8String

/** One-task replay of the seeded randomization chain for the BOUNDED
  * regime — the per-replica body of [[Chas.randomizeTagged]].
  *
  * The distributed chain (window pairing + fused key audit per round)
  * is the giant-graph shape; on a bounded edge set every round is a
  * handful of near-empty stages whose cost is scheduling, not work.
  * Replicas are fully independent (the pairing window partitions by
  * replica and the audit is per-replica), so Chas routes bounded inputs
  * through `groupByKey(replica).flatMapGroups` and each task runs its
  * replica's whole chain here, in arrays.
  *
  * EXACTNESS CONTRACT: this is the same chain, step for step — the
  * DuckDB oracle replays the rounds as SQL CTEs and the result is
  * hash-pinned, so every detail below mirrors the DataFrame version
  * bit-for-bit (ChasSpec asserts local == distributed on whole result
  * sets; the sf1 slice pins the 5.49M-row chain):
  *  - h = md5 hex of "src|dst|replica|<seed + 1000003*round>"
  *  - 16-way salt = first hex char; pairing sorts (h, src, dst) in
  *    UTF8String binary order within (bin, salt) and pairs adjacent
  *    rows (odd leftover passes through)
  *  - a proposal is pre-valid if it makes no self-loop and the two
  *    minted keys differ; minted keys are audited against the current
  *    edge set OF THE SAME GROUP (the tag part of the bin — each
  *    tagged subnet is its own graph) and against same-round
  *    double-mints in that group — any hit rejects every minter of
  *    the key
  *  - accepted pairs emit the swapped endpoints, rejected pairs their
  *    originals, all within the pair's (replica, bin)
  *
  * Constants matter at millions of rows per replica: bins are interned
  * to ints once (the group key is an array index, not a built string),
  * and string comparison takes an allocation-free ASCII fast path that
  * matches UTF8String binary order exactly for code points < 0x80
  * (fragment ids are ASCII by construction; anything else falls back
  * to a real UTF8String compare).
  */
private[graft] object LocalChain {

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** UTF8String binary order without the per-call allocations: for
    * ASCII (all ids in this engine) UTF-16 code-unit order equals
    * UTF-8 byte order, so compare chars and only fall back to real
    * UTF8String comparison when a non-ASCII char decides. */
  private def bcmp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i); val cb = b.charAt(i)
      if (ca != cb) {
        return if (ca < 0x80 && cb < 0x80) ca - cb
        else UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      }
      i += 1
    }
    a.length - b.length
  }

  /** (src, dst, binIdx) current edge of one replica; bin interned. */
  private final case class Edge(src: String, dst: String, bin: Int)

  /** Run the whole chain for one replica; emits (replica, bin, src,
    * dst) rows of the final edge set. */
  def runReplica(replica: Int, base: Iterator[(String, String, String)],
                 seed: Long, rounds: Int)
      : Iterator[(Int, String, String, String)] = {
    // intern bins: swaps stay within a bin, so the universe is fixed up
    // front and the per-round group key is an array index
    val binIdx = new java.util.HashMap[String, Integer]()
    val bins = new scala.collection.mutable.ArrayBuffer[String]()
    // group id per bin: the audit is scoped to the tag part of the bin
    // (prefix before the first '|'; the whole bin when absent) — same
    // prefix rule as the distributed audit's substring_index and the
    // oracle's split_part
    val grpIdx = new java.util.HashMap[String, Integer]()
    val grpOfBin = new scala.collection.mutable.ArrayBuffer[Int]()
    var edges = base.map { case (s, d, b) =>
      var i = binIdx.get(b)
      if (i == null) {
        i = bins.length; binIdx.put(b, i); bins += b
        val cut = b.indexOf('|')
        val g = if (cut < 0) b else b.substring(0, cut)
        var gi = grpIdx.get(g)
        if (gi == null) { gi = grpIdx.size(); grpIdx.put(g, gi) }
        grpOfBin += gi.intValue()
      }
      Edge(s, d, i.intValue())
    }.toArray
    val grps = grpOfBin.toArray
    var r = 0
    while (r < rounds) {
      edges = round(edges, bins.length, grps, replica, seed, r)
      r += 1
    }
    edges.iterator.map(e => (replica, bins(e.bin), e.src, e.dst))
  }

  private final case class Pair(bin: Int, p: Long,
                                ls: String, ld: String,
                                rs: String, rd: String) // rs/rd null = leftover

  /** Unordered-edge key; the ' ' separator cannot occur in fragment ids, so
    * string equality of the joined key == tuple equality. */
  private def ukey(a: String, b: String): String =
    if (bcmp(a, b) <= 0) a + " " + b else b + " " + a

  /** Per-thread MessageDigest for the parallel hash phase (MD5
    * instances are not thread-safe; one per pool thread, reused). */
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def round(edges: Array[Edge],
                    nBins: Int, grpOfBin: Array[Int],
                    replica: Int, seed: Long, r: Int)
      : Array[Edge] = {
    val lit = "|" + replica + "|" + (seed + 1000003L * r)
    // 1a. seeded hash per row — PARALLEL over the common ForkJoin pool:
    // hs(i) is a pure function of edges(i), so index-disjoint writes
    // are safe and the result is bit-identical to the serial loop. The
    // common pool is JVM-shared, so concurrent replica tasks split the
    // executor's cores instead of oversubscribing them (the bounded
    // a14 regime runs nReplicates tasks on a whole executor — this is
    // where the idle cores go to work).
    val hs = new Array[String](edges.length)
    java.util.stream.IntStream.range(0, edges.length).parallel().forEach { i =>
      val e = edges(i)
      hs(i) = md5Hex(tlMd.get(), e.src + "|" + e.dst + lit)
    }
    // 1b. group rows by (salt hex char, bin) — serial (builds lists)
    val groups = new Array[java.util.ArrayList[Integer]](16 * nBins)
    var i = 0
    while (i < edges.length) {
      val c = hs(i).charAt(0)
      val salt = if (c <= '9') c - '0' else c - 'a' + 10
      val k = salt * nBins + edges(i).bin
      var g = groups(k)
      if (g == null) { g = new java.util.ArrayList[Integer](); groups(k) = g }
      g.add(i)
      i += 1
    }
    // 2a. sort each group by (h, src, dst) binary order — PARALLEL:
    // groups are disjoint and the comparator only reads hs/edges, so
    // per-group sorts are independent and each is deterministic
    java.util.Arrays.stream(groups).parallel().forEach { g =>
      if (g != null) {
        g.sort { (x: Integer, y: Integer) =>
          var c = hs(x).compareTo(hs(y)) // hex ASCII: String order = byte order
          if (c == 0) c = bcmp(edges(x).src, edges(y).src)
          if (c == 0) c = bcmp(edges(x).dst, edges(y).dst)
          c
        }
      }
    }
    // 2b. pair adjacent rows — serial, in group order (same pairs, same
    // order as the fused serial loop)
    val pairs = new scala.collection.mutable.ArrayBuffer[Pair](edges.length / 2 + 8)
    var k = 0
    while (k < groups.length) {
      val g = groups(k)
      if (g != null) {
        val saltB = (k / nBins).toLong
        var j = 0
        while (j < g.size()) {
          val a = edges(g.get(j))
          val p = saltB * 1000000000L + (j / 2 + 1)
          if (j + 1 < g.size()) {
            val b = edges(g.get(j + 1))
            pairs += Pair(a.bin, p, a.src, a.dst, b.src, b.dst)
          } else {
            pairs += Pair(a.bin, p, a.src, a.dst, null, null)
          }
          j += 2
        }
      }
      k += 1
    }
    // 3. fused key audit, scoped per group: minted keys vs current
    // edges of the SAME group + same-group double-mints ('\u0000'
    // cannot occur in ids, so the composite key is injective)
    val existing = new java.util.HashSet[String](edges.length * 2)
    i = 0
    while (i < edges.length) {
      existing.add(
        grpOfBin(edges(i).bin) + "\u0000" + ukey(edges(i).src, edges(i).dst))
      i += 1
    }
    def pre(q: Pair): Boolean =
      q.rs != null && q.ls != q.rd && q.rs != q.ld &&
        ukey(q.ls, q.rd) != ukey(q.rs, q.ld)
    // minted key -> minters; mint count = list size
    val minted = new java.util.HashMap[String, java.util.ArrayList[Pair]]()
    for (q <- pairs if pre(q);
         kk <- Seq(grpOfBin(q.bin) + "\u0000" + ukey(q.ls, q.rd),
                   grpOfBin(q.bin) + "\u0000" + ukey(q.rs, q.ld))) {
      var l = minted.get(kk)
      if (l == null) { l = new java.util.ArrayList[Pair](); minted.put(kk, l) }
      l.add(q)
    }
    val bad = new java.util.HashSet[Pair]()
    val mit = minted.entrySet().iterator()
    while (mit.hasNext) {
      val entry = mit.next()
      if (existing.contains(entry.getKey) || entry.getValue.size() > 1) {
        val l = entry.getValue
        var j = 0
        while (j < l.size()) { bad.add(l.get(j)); j += 1 }
      }
    }
    // 4. emit
    val out = new scala.collection.mutable.ArrayBuffer[Edge](edges.length)
    for (q <- pairs) {
      if (q.rs == null) out += Edge(q.ls, q.ld, q.bin)
      else if (pre(q) && !bad.contains(q)) {
        out += Edge(q.ls, q.rd, q.bin)
        out += Edge(q.rs, q.ld, q.bin)
      } else {
        out += Edge(q.ls, q.ld, q.bin)
        out += Edge(q.rs, q.rd, q.bin)
      }
    }
    out.toArray
  }
}
