package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared single-JVM SparkSession + the synthetic PCHiC fixture from
  * FIXTURES.md §1: an MT row, a score straddle around the 5.0 default
  * threshold, a duplicate bait↔oe pair (reversed), a self-loop, and
  * gene-name bags exercising the reference's normalization
  * (network_generator_lib.R:351-360). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlc = spark

  /** 12-column PCHiC-shaped frame; score at positional column 12. */
  def pchicFixture: DataFrame = {
    import spark.implicits._
    // (baitChr, baitStart, baitEnd, baitName, oeChr, oeStart, oeEnd,
    //  oeName, a, b, c, score)
    Seq(
      // MT row (dropped by F4)
      ("MT", 100L, 199L, "MTG", "1", 1000L, 1999L, "P1", 0L, 0L, 0L, 10.0),
      // score straddle: 4.9 dropped, 5.0 dropped (strict >), 5.1 kept
      ("1", 1000L, 1999L, "Hoxa1-1", "1", 5000L, 5999L, "P5", 0L, 0L, 0L, 4.9),
      ("1", 1000L, 1999L, "Hoxa1-1", "1", 6000L, 6999L, "P6", 0L, 0L, 0L, 5.0),
      ("1", 1000L, 1999L, "Hoxa1-1", "1", 5000L, 5999L, "P5", 0L, 0L, 0L, 6.0),
      // second name bag for the same bait: suffix variant + extra name
      ("1", 1000L, 1999L, "Hoxa1-2 Extra", "2", 3000L, 3999L, "P3", 0L, 0L, 0L, 7.0),
      // bait that also appears as an other end (P-wins rule) and
      // a "." name (normalized away)
      ("2", 3000L, 3999L, "Bx", "1", 1000L, 1999L, ".", 0L, 0L, 0L, 8.0),
      // duplicate undirected pair, reversed orientation, lower score
      ("1", 1000L, 1999L, "Hoxa1-1", "2", 3000L, 3999L, "P3", 0L, 0L, 0L, 5.5),
      // self-loop (dropped by G2)
      ("2", 3000L, 3999L, "Bx", "2", 3000L, 3999L, "Bx", 0L, 0L, 0L, 9.0))
      .toDF("baitChr", "baitStart", "baitEnd", "baitName", "oeChr",
        "oeStart", "oeEnd", "oeName", "a", "b", "c", "score")
  }

  def edgesOf(pairs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  def featuresOf(rows: Seq[(String, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("fragment", "feature", "value")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table specs saveAsTable: keep the warehouse out of
      // the repo working tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
