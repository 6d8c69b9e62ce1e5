package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end output-tree golden: Pipeline.build + writeDatasetTree on
  * sf0.001 must reproduce the checked-in tree byte-for-byte — the
  * pipeline.sh:109-124 layout (metadata.json, suggestions.json,
  * chromosomes.json, features_metadata.json, chromosomes/chr*.json).
  * Regenerate deliberately with `sbt "Test/runMain graft.GoldenGen"`. */
class PipelineTreeSpec extends SparkSpec {

  test("writeDatasetTree reproduces the checked-in golden tree byte-exact") {
    val golden = Paths.get(GoldenTree.goldenDir)
    assert(Files.isDirectory(golden),
      s"golden tree missing - run: sbt 'Test/runMain graft.GoldenGen'")
    val out = Files.createTempDirectory("grafttree").toString
    GoldenTree.write(spark, out)

    def rel(root: Path): Set[String] = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSet
    val expected = rel(golden)
    assert(expected.nonEmpty && expected.contains("metadata.json"))
    assert(rel(Paths.get(out)) == expected)

    expected.foreach { f =>
      val e = Files.readString(golden.resolve(f))
      val a = Files.readString(Paths.get(out).resolve(f))
      assert(a == e, s"$f differs from golden")
    }
  }

  test("forced-distributed tree write matches the golden documents") {
    // the bulk regime (distributedDocs=true, normally engaged above
    // DocStreamMaxEdges): every chr<c>.json becomes a line DIRECTORY
    // whose concatenated rows must equal the golden single file; the
    // metadata JSONs are identical single files in both regimes
    val golden = Paths.get(GoldenTree.goldenDir)
    val out = Files.createTempDirectory("grafttreedist").toString
    GoldenTree.write(spark, out, distributedDocs = Some(true))
    Files.walk(golden).iterator().asScala
      .filter(Files.isRegularFile(_))
      .foreach { p =>
        val f = golden.relativize(p).toString
        val e = Files.readString(p)
        val target = Paths.get(out).resolve(f)
        if (f.startsWith("chromosomes/")) {
          assert(Files.isDirectory(target), s"$f should be a line dir")
          val parts = Files.list(target).iterator().asScala
            .filter(_.getFileName.toString.startsWith("part-")).toSeq
          assert(parts.size == 1, s"$f: one task per document")
          val got = Files.readAllLines(parts.head).asScala.mkString("")
          assert(got == e, s"$f differs from golden (concatenated)")
        } else {
          assert(Files.readString(target) == e, s"$f differs from golden")
        }
      }
  }
}
