package graft.ext

import scala.collection.mutable

/** One-task NN-Descent twin (the `core.LocalGraph` precedent): the
  * whole build runs inside a single `mapPartitions` task over the
  * coalesced vectors, replicating the relational rounds of
  * [[Similarity.knnGraphNNDescent]] OPERATION FOR OPERATION so the
  * edge set is bit-identical — same md5-derived init targets, same
  * (md5(p:x), x)-capped neighborhoods, same candidate pairs, same
  * left-to-right cosine accumulation, same `roundLike(_, 6)`
  * rounding, same (cos desc, dst asc) top-k tie-breaks. Every gate
  * lane that builds a graph (s7/s8/s9/s10/rag) pins the full edge
  * hash, so the twins cannot silently diverge.
  *
  * Why it exists: below a few thousand vectors the relational rounds
  * pay ~2 s of shuffle/checkpoint fixed cost per round on
  * milliseconds of arithmetic (8 s of rag_retrieve's 11 s at sf0.1).
  * The distributed path stays the ONLY path above the routing bound —
  * this class is a small-regime accelerator, not a replacement.
  */
private[ext] object LocalKnn {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** conv(substring(md5, 1, 12), 16, 10) as a long — 48 bits. */
  private def hex12(h: String): Long =
    java.lang.Long.parseLong(h.substring(0, 12), 16)

  /** Num.roundLike(c, 6) replicated literally. */
  private def round6(c: Double): Double = {
    val p = 1000000.0
    if (c >= 0) math.floor(c * p + 0.5) / p
    else -math.floor(-c * p + 0.5) / p
  }

  /** CosineSimExpr replicated: one pass, left-to-right accumulation,
    * dot / (sqrt(na) * sqrt(nb)). Returns NaN for a zero norm (the
    * relational twin would throw/NULL there; corpora are pre-filtered
    * to positive norms, and NaN pairs are dropped by the caller). */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val div = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    if (div == 0.0) Double.NaN else dot / div
  }

  private final case class Edge(src: Long, dst: Long, cos: Double)

  /** (cos desc, dst asc) — Catalyst's double ordering via
    * java.lang.Double.compare. */
  private val topOrder: Ordering[Edge] = new Ordering[Edge] {
    def compare(a: Edge, b: Edge): Int = {
      val c = java.lang.Double.compare(b.cos, a.cos)
      if (c != 0) c else java.lang.Long.compare(a.dst, b.dst)
    }
  }

  private def topK(edges: Seq[Edge], k: Int): Array[Edge] = {
    val bySrc = mutable.LongMap.empty[mutable.ArrayBuffer[Edge]]
    edges.foreach(e =>
      bySrc.getOrElseUpdate(e.src, mutable.ArrayBuffer.empty) += e)
    val out = mutable.ArrayBuffer.empty[Edge]
    bySrc.foreach { case (_, lst) =>
      out ++= lst.sorted(topOrder).take(k) }
    out.toArray
  }

  /** One-task twin of [[Similarity.beamCore]] — the expand-score-prune
    * beam loop replicated operation for operation: same
    * md5(probe:i:beam) mod n entry lottery constrained to `nodeIds`,
    * same per-step (neighbors-of-beam ∪ beam) \ {probe} candidate set,
    * same round6 scores, same (cos desc, node asc) top-`beam` prune
    * (java.lang.Double.compare = Catalyst double order, NaN largest).
    * Probes are independent, so the per-probe loops run on the common
    * ForkJoin pool (the LocalChain precedent — concurrent lanes share
    * the executor's cores). `adj` must be the DEDUPED symmetrized
    * adjacency ([[Similarity.symmetrized]] semantics). Returns the
    * final top-`m` rows per probe as (probe, rank, node, cos). */
  def beamSearch(vecs: Array[(Long, Array[Double])],
                 nodeIds: java.util.Set[java.lang.Long],
                 probes: Array[Long],
                 edges: Array[(Long, Long)],
                 n: Long, m: Int, beam: Int, steps: Int, seeds: Int)
      : Iterator[(Long, Long, Long, Double)] = {
    val byId = mutable.LongMap.empty[Array[Double]]
    vecs.foreach { case (id, v) => byId.update(id, v) }
    // deduped symmetric adjacency
    val adjSet = mutable.LongMap.empty[mutable.HashSet[Long]]
    edges.foreach { case (s, d) =>
      adjSet.getOrElseUpdate(s, mutable.HashSet.empty) += d
      adjSet.getOrElseUpdate(d, mutable.HashSet.empty) += s
    }
    val adj = mutable.LongMap.empty[Array[Long]]
    adjSet.foreach { case (id, s) => adj.update(id, s.toArray) }
    // (cos desc, node asc) — Catalyst double order via Double.compare
    val ord: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    val out = new Array[Array[(Long, Long, Long, Double)]](probes.length)
    java.util.stream.IntStream.range(0, probes.length).parallel()
      .forEach { pi =>
        val p = probes(pi)
        val vp = byId(p)
        def score(node: Long): (Long, Double) =
          (node, round6(cosine(vp, byId(node))))
        // entry lottery ∩ nodeIds, minus the probe itself. Candidates
        // without a vector drop BEFORE scoring — the relational
        // beamCore's inner join on scoreVecs does the same, so a
        // dangling graph edge is tolerated identically in both regimes
        val entry = mutable.HashSet.empty[Long]
        var i = 0
        while (i < seeds) {
          val node = java.lang.Math.floorMod(
            hex12(md5hex(s"$p:$i:beam")), n)
          if (node != p && nodeIds.contains(node) && byId.contains(node))
            entry += node
          i += 1
        }
        var c = entry.toArray.map(score).sorted(ord).take(beam)
        var st = 0
        while (st < steps) {
          val cand = mutable.HashSet.empty[Long]
          c.foreach { case (node, _) =>
            cand += node
            adj.get(node).foreach(_.foreach(cand += _))
          }
          cand -= p
          c = cand.toArray.filter(byId.contains).map(score)
            .sorted(ord).take(beam)
          st += 1
        }
        out(pi) = c.take(m).zipWithIndex.map { case ((node, cos), r) =>
          (p, (r + 1).toLong, node, cos) }
      }
    out.iterator.flatMap(_.iterator)
  }

  /** One-task twin of [[Similarity.mergeForward]]: reverse edges
    * propose, affected base nodes re-rank old ∪ proposals to top-k,
    * untouched rows pass through, every row ranked per src by
    * (cos desc, dst asc). Duplicate rows survive exactly like the
    * relational unionAll (lists, never sets). Returns
    * (src, rank, dst, cos). */
  def mergeForward(old: Array[(Long, Long, Double)],
                   fwd: Array[(Long, Long, Double)], k: Int)
      : Iterator[(Long, Long, Long, Double)] = {
    val aff = mutable.HashSet.empty[Long]
    fwd.foreach { case (_, d, _) => aff += d } // rev srcs = fwd dsts
    val ordE: Ordering[(Long, Long, Double)] =
      new Ordering[(Long, Long, Double)] {
        def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
          val c = java.lang.Double.compare(b._3, a._3)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
    val bySrc = mutable.LongMap.empty[mutable.ArrayBuffer[(Long, Long, Double)]]
    def add(e: (Long, Long, Double)): Unit =
      bySrc.getOrElseUpdate(e._1, mutable.ArrayBuffer.empty) += e
    // affected: old rows ∪ reverse proposals, re-ranked to top-k;
    // untouched old rows and the forward rows pass through whole
    val affRows = mutable.LongMap.empty[mutable.ArrayBuffer[(Long, Long, Double)]]
    old.foreach { e =>
      if (aff.contains(e._1))
        affRows.getOrElseUpdate(e._1, mutable.ArrayBuffer.empty) += e
      else add(e)
    }
    fwd.foreach { case (s, d, c) =>
      affRows.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += ((d, s, c))
      add((s, d, c))
    }
    affRows.foreach { case (_, lst) =>
      lst.sorted(ordE).take(k).foreach(add) }
    bySrc.iterator.flatMap { case (_, lst) =>
      lst.sorted(ordE).zipWithIndex.map { case ((s, d, c), r) =>
        (s, (r + 1).toLong, d, c) }
    }
  }

  /** The full build; returns (src, rank, dst, cosine) rows. */
  def descent(vecs: Array[(Long, Array[Double])], k: Int, rounds: Int,
              cap: Int): Iterator[(Long, Long, Long, Double)] = {
    val n = vecs.length.toLong
    val byId = mutable.LongMap.empty[Array[Double]]
    vecs.foreach { case (id, v) => byId.update(id, v) }
    def score(src: Long, dst: Long): Double =
      round6(cosine(byId(src), byId(dst)))
    // init: dst = md5(src:i:knn) mod n, self-loops and absent ids drop
    val init = mutable.HashSet.empty[(Long, Long)]
    vecs.foreach { case (src, _) =>
      var i = 0
      while (i < k) {
        val dst = java.lang.Math.floorMod(
          hex12(md5hex(s"$src:$i:knn")), n)
        if (dst != src && byId.contains(dst)) init += ((src, dst))
        i += 1
      }
    }
    var g = topK(init.iterator.map { case (s, d) =>
      Edge(s, d, score(s, d)) }.filterNot(_.cos.isNaN).toSeq, k)
    var r = 0
    while (r < rounds) {
      // symmetric neighborhoods, capped per p by (md5(p:x), x)
      val nbr = mutable.LongMap.empty[mutable.HashSet[Long]]
      g.foreach { e =>
        nbr.getOrElseUpdate(e.src, mutable.HashSet.empty) += e.dst
        nbr.getOrElseUpdate(e.dst, mutable.HashSet.empty) += e.src
      }
      val cand = mutable.HashSet.empty[(Long, Long)]
      nbr.foreach { case (p, xs) =>
        val capped = xs.toArray
          .map(x => (md5hex(s"$p:$x"), x))
          .sortBy(identity)(Ordering.Tuple2(Ordering.String, Ordering.Long))
          .take(cap).map(_._2)
        var i = 0
        while (i < capped.length) {
          var j = i + 1
          while (j < capped.length) {
            val a = capped(i); val b = capped(j)
            cand += (if (a < b) (a, b) else (b, a))
            j += 1
          }
          i += 1
        }
      }
      // old ∪ new (both directions), max-dedup by key, per-src top-k
      val merged = mutable.HashMap.empty[(Long, Long), Double]
      g.foreach(e => merged.update((e.src, e.dst), e.cos))
      cand.foreach { case (a, b) =>
        val c = score(a, b)
        if (!c.isNaN) {
          val k1 = (a, b); val k2 = (b, a)
          if (!merged.get(k1).exists(_ >= c)) merged.update(k1, c)
          if (!merged.get(k2).exists(_ >= c)) merged.update(k2, c)
        }
      }
      g = topK(merged.iterator.map { case ((s, d), c) => Edge(s, d, c) }
        .toSeq, k)
      r += 1
    }
    topK(g.toSeq, k).groupBy(_.src).iterator.flatMap { case (_, lst) =>
      lst.sorted(topOrder).zipWithIndex.map { case (e, i) =>
        (e.src, (i + 1).toLong, e.dst, e.cos) }
    }
  }
}
