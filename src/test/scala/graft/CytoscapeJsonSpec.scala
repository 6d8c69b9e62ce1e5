package graft

import graft.io.CytoscapeJson

/** S10 sink: element shape, `searched` string form, `~` edge ids,
  * empty-result guard (reference network_generator_lib.R:242-275,
  * network_generator.R:88-92). */
class CytoscapeJsonSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(
    ("1_100_199", "EZH2", "1", 100L, 199L, "P", true, 2L),
    ("1_500_599", null.asInstanceOf[String], "1", 500L, 599L, "O", false, 1L))
    .toDF("fragment", "gene_names", "chr", "start", "end", "type",
      "searched", "degree")

  private def edges = Seq(("1_100_199", "1_500_599", "P-O"))
    .toDF("src", "dst", "type")

  test("node elements nest data + group, searched as string bool") {
    val els = CytoscapeJson.nodeElements(nodes).collect().map(_.getString(0))
    assert(els.length == 2)
    val seed = els.find(_.contains("\"id\":\"1_100_199\"")).get
    assert(seed.contains("\"group\":\"nodes\""))
    assert(seed.contains("\"searched\":\"true\""))
    assert(seed.contains("\"degree\":2"))
    // null names -> empty string, numbers unquoted (no sed hack needed)
    val oe = els.find(_.contains("1_500_599")).get
    assert(oe.contains("\"names\":\"\""))
    assert(oe.contains("\"start\":500"))
  }

  test("positioned node elements carry the reference's position{x,y}") {
    val ids = nodes.select(
      org.apache.spark.sql.functions.col("fragment").as("id"))
    val layout = graft.core.Layout.cose(ids,
      edges.select("src", "dst"))
    val els = CytoscapeJson.positionedNodeElements(nodes, layout)
      .collect().map(_.getString(0))
    assert(els.length == 2)
    els.foreach { e =>
      assert(e.contains("\"group\":\"nodes\""))
      assert(e.matches(""".*"position":\{"x":-?\d+(\.\d+)?(E-?\d+)?,"y":-?\d+(\.\d+)?(E-?\d+)?\}.*"""), e)
    }
    // the coordinates are the layout's, keyed by fragment
    val want = layout.collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val seed = els.find(_.contains("\"id\":\"1_100_199\"")).get
    val (x, _) = want("1_100_199")
    assert(seed.contains(s""""position":{"x":$x"""), s"$seed vs $x")
  }

  test("edge elements use source~target ids") {
    val el = CytoscapeJson.edgeElements(edges).collect()(0).getString(0)
    assert(el.contains("\"id\":\"1_100_199~1_500_599\""))
    assert(el.contains("\"group\":\"edges\""))
  }

  test("empty / single-node guard renders {}") {
    assert(CytoscapeJson.render(nodes.limit(1), edges.limit(0)) == "{}")
    assert(CytoscapeJson.render(nodes.limit(0), edges.limit(0)) == "{}")
    assert(CytoscapeJson.render(nodes, edges).startsWith("["))
  }

  // a wider document than the inline fixture: a real chromosome slice
  // of the sf0.001 pipeline, multiple shuffle partitions in the sort
  private def chrDoc = {
    val d = "/root/testdata/sf0.001"
    val v = TestMapping.verts(spark, d)
    val e = TestMapping.simplified(spark, d)
    val touching = e.filter(
      org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("src"), "_").getItem(0) === "7" ||
      org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("dst"), "_").getItem(0) === "7")
    val endpoints = touching.select($"src".as("fragment"))
      .unionAll(touching.select($"dst".as("fragment"))).distinct()
    (v.join(endpoints, Seq("fragment"), "left_semi"), touching)
  }

  test("streamed writeDocument matches render byte-for-byte") {
    val (n, e) = chrDoc
    val expected = CytoscapeJson.render(n.orderBy("fragment"),
      e.orderBy("src", "dst"))
    assert(expected.length > 10000) // a real multi-element document
    val f = java.nio.file.Files.createTempFile("graftdoc", ".json")
    CytoscapeJson.writeDocument(n, e, f.toString)
    assert(java.nio.file.Files.readString(f) == expected)
    // guard parity on the trivial documents
    val f2 = java.nio.file.Files.createTempFile("graftdoc", ".json")
    CytoscapeJson.writeDocument(nodes.limit(1), edges.limit(0), f2.toString)
    assert(java.nio.file.Files.readString(f2) == "{}")
    CytoscapeJson.writeDocument(nodes.limit(0), edges.limit(0), f2.toString)
    assert(java.nio.file.Files.readString(f2) == "{}")
  }

  test("batched chromosome writer guards a lone node with a self-loop") {
    // render's contract is <=1 NODE -> "{}"; a self-loop edge makes the
    // document 2 ELEMENTS, which must still guard (and a chromosome
    // whose node rows are missing entirely must too)
    val n1 = nodes.limit(1) // the single chr-1 node
    val loop = Seq(("1_100_199", "1_100_199", "P-P"))
      .toDF("src", "dst", "type")
    val dir = java.nio.file.Files.createTempDirectory("graftchrguard")
    CytoscapeJson.writeChromosomeDocuments(n1, loop, Seq("1"), dir.toString)
    assert(java.nio.file.Files.readString(dir.resolve("chr1.json")) == "{}")
    // edges whose endpoints have no node rows: also guarded
    val orphan = Seq(("9_1_2", "9_3_4", "O-O")).toDF("src", "dst", "type")
    CytoscapeJson.writeChromosomeDocuments(nodes.limit(0), orphan,
      Seq("9"), dir.toString)
    assert(java.nio.file.Files.readString(dir.resolve("chr9.json")) == "{}")
    // and a real two-node document still renders through the same path
    CytoscapeJson.writeChromosomeDocuments(nodes, edges, Seq("1"),
      dir.toString)
    assert(java.nio.file.Files.readString(dir.resolve("chr1.json")) ==
      CytoscapeJson.render(nodes, edges))
  }

  test("distributed chromosome line dirs reproduce the stream files byte-for-byte") {
    // the real sf0.001 pipeline slice, ALL chromosomes: the bulk-path
    // writer (executor-written line dirs) must concatenate to exactly
    // the driver-stream writer's bytes for every document, including
    // the "{}" guards for absent chromosomes
    val d = "/root/testdata/sf0.001"
    val v = TestMapping.verts(spark, d)
    val e = TestMapping.simplified(spark, d)
    val chrs = v.select("chr").distinct().collect()
      .map(_.getString(0)).toSeq.sorted :+ "NOSUCH"
    val streamDir = java.nio.file.Files.createTempDirectory("graftstream")
    val linesDir = java.nio.file.Files.createTempDirectory("graftlines")
    CytoscapeJson.writeChromosomeDocuments(v, e, chrs, streamDir.toString)
    CytoscapeJson.writeChromosomeDocumentLines(v, e, chrs, linesDir.toString)
    var checkedBytes = 0L
    for (c <- chrs) {
      val expected = java.nio.file.Files.readString(
        streamDir.resolve(s"chr$c.json"))
      val docDir = linesDir.resolve(s"chr$c.json")
      assert(java.nio.file.Files.isDirectory(docDir), s"chr$c")
      val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(
          java.nio.file.Files.list(docDir).iterator()).asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
      assert(parts.size == 1, s"chr$c: one task per document")
      val got = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(parts.head)).asScala.mkString("")
      assert(got == expected, s"chr$c")
      checkedBytes += expected.length
    }
    assert(checkedBytes > 100000) // a real multi-document comparison
    // guard: the absent chromosome is the literal {}
    val guardParts = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.list(linesDir.resolve("chrNOSUCH.json"))
          .iterator()).asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(guardParts.head))
      .asScala.mkString("") == "{}")
  }

  test("sharded line dirs concatenate in filename order to the stream " +
      "bytes (no one-task-per-document straggler)") {
    // the giant-document mitigation: shardsPerDoc range-splits each
    // document's line rows across tasks; part files sorted by name
    // (task-id order == range order) must reproduce the document
    val d = "/root/testdata/sf0.001"
    val v = TestMapping.verts(spark, d)
    val e = TestMapping.simplified(spark, d)
    val chrs = v.select("chr").distinct().collect()
      .map(_.getString(0)).toSeq.sorted
    val streamDir = java.nio.file.Files.createTempDirectory("graftstream3")
    val shardDir = java.nio.file.Files.createTempDirectory("graftshard3")
    CytoscapeJson.writeChromosomeDocuments(v, e, chrs, streamDir.toString)
    CytoscapeJson.writeChromosomeDocumentLines(v, e, chrs,
      shardDir.toString, shardsPerDoc = 3)
    var multiPart = 0
    for (c <- chrs) {
      val expected = java.nio.file.Files.readString(
        streamDir.resolve(s"chr$c.json"))
      val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(
          java.nio.file.Files.list(shardDir.resolve(s"chr$c.json"))
            .iterator()).asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
      if (parts.size > 1) multiPart += 1
      val got = parts.map(p => scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(p))
          .asScala.mkString("")).mkString("")
      assert(got == expected, s"chr$c sharded concatenation")
    }
    assert(multiPart > 0, "no document actually sharded across tasks")
  }

  test("distributed chromosome line dirs guard lone-node and orphan docs") {
    val n1 = nodes.limit(1)
    val loop = Seq(("1_100_199", "1_100_199", "P-P"))
      .toDF("src", "dst", "type")
    val dir = java.nio.file.Files.createTempDirectory("graftlineguard")
    CytoscapeJson.writeChromosomeDocumentLines(n1, loop, Seq("1"),
      dir.toString)
    def docText(c: String): String = {
      val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(
          java.nio.file.Files.list(dir.resolve(s"chr$c.json")).iterator())
        .asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(parts.head)).asScala.mkString("")
    }
    assert(docText("1") == "{}")
    // edges whose endpoints have no node rows: also guarded
    val orphan = Seq(("9_1_2", "9_3_4", "O-O")).toDF("src", "dst", "type")
    CytoscapeJson.writeChromosomeDocumentLines(nodes.limit(0), orphan,
      Seq("9"), dir.toString)
    assert(docText("9") == "{}")
    // and a real two-node document renders identically to render()
    CytoscapeJson.writeChromosomeDocumentLines(nodes, edges, Seq("1"),
      dir.toString)
    assert(docText("1") == CytoscapeJson.render(nodes, edges))
  }

  test("distributed writeDocumentLines concatenates to the render bytes") {
    val (n, e) = chrDoc
    val expected = CytoscapeJson.render(n.orderBy("fragment"),
      e.orderBy("src", "dst"))
    val dir = java.nio.file.Files.createTempDirectory("graftdoclines")
    val out = dir.resolve("doc")
    CytoscapeJson.writeDocumentLines(n, e, out.toString)
    val part = java.nio.file.Files.list(out).iterator()
    val files = scala.jdk.CollectionConverters.IteratorHasAsScala(part)
      .asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(files.size == 1) // one text file, one partition
    val lines = java.nio.file.Files.readAllLines(files.head)
    assert(scala.jdk.CollectionConverters.ListHasAsScala(lines)
      .asScala.mkString("") == expected)
  }
}
