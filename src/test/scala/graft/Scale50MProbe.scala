package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Round-8 at-scale smoke (VERDICT r7 item 7): a ~24M-edge synthetic
  * graph — ABOVE every bounded-regime cutoff (LocalMaxEdges /
  * LocalMaxChainRows 5M, DocStreamMaxEdges 20M) — driven through the
  * four distributed regimes end-to-end once, wall times printed for
  * COVERAGE.md:
  *   - CC min-label + pointer jumping (distributed, not LocalGraph)
  *   - certified diameter via double sweeps + broadcast-CSR iFUB
  *   - the tagged swap chain's windowed distributed rounds
  *   - writeDatasetTree with executor-written per-document line dirs
  *
  * The graph: 4M nodes over the 25-chromosome key space, ~24M
  * pseudo-random chord edges (Knuth-hash partner keys), constant score
  * so the threshold keeps everything.
  *
  *   sbt "Test/runMain graft.Scale50MProbe"
  */
object Scale50MProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "100g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"[scale50m] $name%-26s ${(System.nanoTime() - s) / 1e9}%8.1fs")
      r
    }
    val nEdges = args.headOption.map(_.toLong).getOrElse(24000000L)
    val nNodes = 4000000L
    val s = (col("id") % nNodes) + 1L
    val k = (((col("id") * 2654435761L) % nNodes + nNodes) % nNodes) + 1L
    val inter = spark.range(nEdges).select(
      TestMapping.chrmap(s).as("baitchr"), (s * 1000).as("baitstart"),
      (s * 1000 + 999).as("baitend"), s.as("baitid"),
      TestMapping.baitName(s).as("baitname"),
      TestMapping.chrmap(k).as("oechr"), (k * 1000).as("oestart"),
      (k * 1000 + 999).as("oeend"), k.as("oeid"),
      concat(lit("P"), k.cast("string")).as("oename"),
      (abs(k - s) * 1000).as("dist"), lit(50.0).as("score"))

    val ds = Pipeline.build(inter, threshold = 5.0)
    val edgesC = ds.edges.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nE = t("build+simplify (count)") { edgesC.count() }
    println(s"[scale50m] edges after simplify: $nE")
    val sym = GraphOps.symmetrize(edgesC).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSym = t("symmetrize (count)") { sym.count() }
    println(s"[scale50m] sym rows: $nSym (LocalMaxEdges=" +
      s"${GraphOps.LocalMaxEdges} -> distributed regimes engaged)")
    require(nSym > GraphOps.LocalMaxEdges,
      "probe graph must exceed the local-regime cutoff")

    t("CC pointer-jumping") {
      val cc = GraphOps.connectedComponentsSym(sym, nSym)
      println(s"[scale50m]   components: " +
        cc.select(countDistinct(col("comp"))).collect()(0).getLong(0))
    }
    t("certified diameter") {
      val d = GraphOps.diameterCertifiedSym(sym, nSym).collect()(0)
      println(s"[scale50m]   diameter=${d.getLong(0)} exact=${d.getBoolean(1)}")
    }
    t("tagged swap chain (dist)") {
      // localMaxChainRows=0 forces the windowed distributed rounds
      val r = Chas.randomize(edgesC.select("src", "dst", "score"),
        nReplicates = 1, seed = 42L, localMaxChainRows = 0L)
      println(s"[scale50m]   randomized rows: ${r.count()}")
    }
    t("writeDatasetTree (dist docs)") {
      val out = java.nio.file.Files.createTempDirectory("scale50m").toString
      // nE > DocStreamMaxEdges -> executor-written per-document dirs
      Pipeline.writeDatasetTree(ds, out, features = None)
      val files = new java.io.File(s"$out/chromosomes").listFiles()
      println(s"[scale50m]   tree documents: ${files.length}")
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(out))
    }
    spark.stop()
  }
}
