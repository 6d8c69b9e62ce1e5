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
}
